"""Sketch operators: HLL tile-distinct and Count-Min token counts.

Beyond the CORRECTNESS gates (which prove the sketch RELATIONS match
DuckDB bit-for-bit), these tests prove the properties that make a
sketch worth shipping at 100 TB: mergeability across shards (the
partial-aggregation contract) and estimator accuracy vs exact answers.
"""

import math

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pages(spark):
    from s2geometry_spark.sources.pages import load_pages
    return load_pages(spark, SF_DIR).select("url", "cell_l4").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.concat_ws("/", "source",
                                F.col("doc_id").cast("string")).alias("url"),
                    "text").cache())


# -------------------------------------------------------------------------
# HLL
# -------------------------------------------------------------------------

def test_hll_estimate_accuracy(spark):
    """Corrected estimates within 25% of exact distinct per group, on
    groups large enough for m=64 registers to bite: 8 hash-buckets of
    sf0.1's 5000 urls (~625 each, the raw-HLL regime) plus 64 buckets
    (~78 each, the linear-counting regime)."""
    from s2geometry_spark.functions import text as T
    from s2geometry_spark.sources.pages import load_pages
    big = load_pages(spark, "/root/testdata/sf0.1").select("url")
    checked = 0
    # 25% at n≈625 (raw-HLL regime, stderr ≈ 1.04/√64 = 13%); 40% at
    # n≈78 (linear-counting/HLL crossover where relative noise peaks)
    for nb, bound in ((8, 0.25), (64, 0.40)):
        # bucket by an INDEPENDENT hash — h60(url) % nb would correlate
        # with the register index (h60(url) % 64) and starve registers
        g = big.withColumn("bucket",
                           T.h60(F.concat(F.lit("b:"), F.col("url"))) % nb)
        exact = {r["bucket"]: r["n"] for r in
                 g.groupBy("bucket").agg(F.countDistinct("url").alias("n"))
                 .collect()}
        for r in SK.hll_sketch(g, "bucket").collect():
            est = SK.hll_estimate(r["n_regs"], r["zeros"], r["sum_scaled"])
            true = exact[r["grp"]]
            assert abs(est - true) / true < bound, (nb, r["grp"], est, true)
            checked += 1
    assert checked == 8 + 64


def test_hll_merge_equals_whole(spark, pages):
    """Register rows from two disjoint shards, unioned and re-maxed,
    must equal the whole-input register relation EXACTLY — the
    map-side-combine / shard-merge contract. Sharding by url hash
    (not partition) so the split is deterministic."""
    from s2geometry_spark.functions import text as T
    h = T.h60(F.col("url"))
    a = pages.filter(h % 2 == 0)
    b = pages.filter(h % 2 == 1)
    merged = (SK.hll_register_rows(a, "cell_l4")
              .unionByName(SK.hll_register_rows(b, "cell_l4"))
              .groupBy("grp", "reg").agg(F.max("r_max").alias("r_max")))
    whole = SK.hll_register_rows(pages, "cell_l4")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))


def test_hll_sketch_row_is_exact_ints(spark, pages):
    """Gate-portability invariant: n_regs/zeros/sum_scaled are exact
    int64s with zeros = m - n_regs and sum_scaled consistent with at
    most m registers at rho >= 1."""
    for r in SK.hll_sketch(pages, "cell_l4").collect():
        assert r["zeros"] == SK.HLL_M - r["n_regs"]
        assert 0 < r["n_regs"] <= SK.HLL_M
        # every register contributes in (0, 2^RHO_CAP]; total bounded
        assert 0 < r["sum_scaled"] <= SK.HLL_M * (1 << SK.RHO_CAP)
        # est is the raw formula, reproducible from the ints
        expect = (SK.HLL_ALPHA * SK.HLL_M * SK.HLL_M
                  * float(1 << SK.RHO_CAP) / r["sum_scaled"])
        assert r["est"] == expect


def test_hll_plan_single_exchange_chain(spark, pages):
    """Plan shape: the sketch is aggregation-only — no join, no window;
    the only shuffles are the two hash-agg exchanges over (grp, reg)
    then (grp), each carrying O(m) rows per group."""
    from s2geometry_spark.plans import explain as X
    plan = X.formatted_plan(SK.hll_sketch(pages, "cell_l4"))
    assert "Join" not in plan and "Window" not in plan


# -------------------------------------------------------------------------
# Count-Min
# -------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cm_rows(docs):
    return {(r["r"], r["col"]): r["cnt"]
            for r in SK.cm_sketch_tokens(docs).collect()}


def test_cm_never_undercounts(spark, docs, cm_rows):
    """CM point estimates are >= the true count for EVERY token (the
    one-sided sketch guarantee, no probability involved)."""
    from s2geometry_spark.functions import text as T
    true = {r["tok"]: r["n"] for r in
            docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
            .groupBy("tok").count().withColumnRenamed("count", "n")
            .collect()}
    for tok, n in true.items():
        assert SK.cm_estimate(cm_rows, tok) >= n


def test_cm_heavy_hitters_accurate(spark, docs, cm_rows):
    """For the top-20 tokens the overshoot is small relative to their
    own counts: err <= N/CM_W per row pair-collision bound, and the
    heavy head dominates collisions."""
    from s2geometry_spark.functions import text as T
    freq = (docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
            .groupBy("tok").count().orderBy(F.desc("count")).limit(20)
            .collect())
    total = sum(v for (_, _), v in cm_rows.items()) // SK.CM_D
    for r in freq:
        est = SK.cm_estimate(cm_rows, r["tok"])
        assert r["count"] <= est <= r["count"] + 4 * total / SK.CM_W, \
            (r["tok"], r["count"], est)


def test_cm_merge_equals_whole(spark, docs):
    """Counter-sum merge of two doc shards equals the whole-corpus
    sketch exactly."""
    from s2geometry_spark.functions import text as T
    h = T.h60(F.col("url"))
    merged = (SK.cm_sketch_tokens(docs.filter(h % 2 == 0))
              .unionByName(SK.cm_sketch_tokens(docs.filter(h % 2 == 1)))
              .groupBy("r", "col").agg(F.sum("cnt").alias("cnt")))
    whole = SK.cm_sketch_tokens(docs)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))


def test_cm_sketch_bounded_size(spark, docs):
    """The sketch relation never exceeds d*w rows regardless of corpus
    size — the whole point."""
    assert SK.cm_sketch_tokens(docs).count() <= SK.CM_D * SK.CM_W
