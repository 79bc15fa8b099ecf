"""URL canonicalization (operators/urls.py) — rule-by-rule known-answer
coverage plus the zero-shuffle plan contract. The CORRECTNESS gates
(`url_normalize`, `url_dedup`) prove DuckDB twin parity; these pin the
semantics themselves."""

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import urls

CASES = [
    # (raw, canonical)
    ("https://Example.COM/Path", "https://example.com/Path"),
    ("HTTPS://EXAMPLE.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/a//", "https://example.com/a"),   # ALL slashes
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a#frag?notaquery=1", "https://example.com/a"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&id=7", "https://example.com/a?id=7"),
    ("https://example.com/a?id=7&fbclid=z&b=2", "https://example.com/a?id=7&b=2"),
    ("https://example.com/a?gclid=1&ref=tw", "https://example.com/a"),
    # param order preserved, non-tracking 'referer=' NOT dropped...
    ("https://example.com/a?b=2&a=1", "https://example.com/a?b=2&a=1"),
    # ...but 'ref=' prefix matches 'ref=tw' only, not 'refresh=1'?
    # starts_with('refresh=1','ref=') is False ('ref=' vs 'refr') — kept
    ("https://example.com/a?refresh=1", "https://example.com/a?refresh=1"),
    # path & query case preserved
    ("https://example.com/A?Id=7", "https://example.com/A?Id=7"),
    # no scheme: with no 3rd '/', the WHOLE string is the head and is
    # lowercased — scheme-less urls are outside the contract, but the
    # function stays total and deterministic on them
    ("example.com/A", "example.com/a"),
    ("", ""),
]


def test_canonical_url_known_answers(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = {r["url"]: r["curl"]
           for r in urls.url_normalize(df).collect()}
    for raw, want in CASES:
        assert got[raw] == want, (raw, got[raw], want)


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every case — the
    fixpoint property any normalizer needs."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    once = urls.url_normalize(df).select(F.col("curl").alias("url"))
    twice = {r["url"]: r["curl"] for r in urls.url_normalize(once).collect()}
    for u, c in twice.items():
        assert c == u


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame([
        ("https://A.com:443/x/?utm_source=1",),
        ("https://a.com/x#top",),
        ("https://a.com/x",),
        ("http://a.com/x",),          # different scheme -> distinct
    ], "url string")
    got = {r["curl"]: (r["n_dup"], r["url_keep"])
           for r in urls.url_dedup(df).collect()}
    assert got["https://a.com/x"] == (3, "https://A.com:443/x/?utm_source=1")
    assert got["http://a.com/x"] == (1, "http://a.com/x")


def test_url_normalize_zero_shuffle(spark):
    """Canonicalization is a pure projection — no Exchange, no UDF
    (whole-stage codegen end to end)."""
    from s2geometry_spark.plans import explain as X
    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = X.formatted_plan(urls.url_normalize(df))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
