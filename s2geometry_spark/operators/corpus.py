"""Corpus-shaping operators: per-domain capping and vocabulary stats.

Training-data pipelines cap how many documents any one domain may
contribute (the C4/Gopher de-domination rule) and extract global token
vocabularies. Both are classic one-shuffle aggregations; the work here
is making them deterministic (hash-order priorities, total tie-breaks)
so they gate bit-for-bit against DuckDB, and keeping the expensive
sort off the cold path at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def domain_of(url_col) -> "F.Column":
    """Everything before the first '/' — the pages url shape is
    domain/doc_id (sources/pages.py adaptation rule)."""
    return F.substring_index(url_col, "/", 1)


def domain_cap(pages: DataFrame, max_per_domain: int,
               id_col: str = "url") -> DataFrame:
    """(url, domain, kept): kept=false for rows past the per-domain cap.

    Priority inside a domain is (h60(url), url) — a stable hash order,
    so the surviving subset is a uniform deterministic sample that
    never migrates across reshards or engines (same property as
    corpus_split).

    Scale shape (10^12 rows, zipf domains): the rank sort runs ONLY on
    over-cap domains. One cheap count aggregation finds them; rows of
    under-cap domains are kept via a broadcast anti-join with NO sort
    and NO window (at web scale that is almost every row — the window
    would otherwise shuffle-sort the entire corpus). Over-cap rows
    (bounded by n_hot_domains × domain size) go through the
    partitioned rank window. Only (url) ever shuffles.
    """
    dom = domain_of(F.col(id_col))
    keyed = pages.select(F.col(id_col), dom.alias("domain"))
    hot = (keyed.groupBy("domain").agg(F.count("*").alias("_n"))
           .filter(F.col("_n") > max_per_domain)
           .select("domain", F.lit(True).alias("_hot")))
    tagged = keyed.join(F.broadcast(hot), "domain", "left")
    cool = (tagged.filter(F.col("_hot").isNull())
            .select(id_col, "domain", F.lit(True).alias("kept")))
    w = Window.partitionBy("domain").orderBy(T.h60(F.col(id_col)),
                                             F.col(id_col))
    hot_rows = (tagged.filter(F.col("_hot").isNotNull())
                .withColumn("_rn", F.row_number().over(w))
                .select(id_col, "domain",
                        (F.col("_rn") <= max_per_domain).alias("kept")))
    return cool.unionByName(hot_rows)


def stratified_sample(pages: DataFrame, strata_col: str,
                      rates: dict[str, tuple[int, int]],
                      default_rate: tuple[int, int] = (1, 1),
                      id_col: str = "url") -> DataFrame:
    """(url, stratum, kept): deterministic per-stratum downsampling —
    keep iff h60(id) % den < num for the stratum's (num, den) rate
    (e.g. {"en": (1, 1), "zh": (1, 4)} keeps all English and a stable
    quarter of Chinese). The decision is a pure function of the id, so
    it never migrates across reshards, reruns, or engines, and
    DIFFERENT dens nest: a doc kept at 1/4 is also kept at 1/2 when
    both dens divide the modulus chain (the corpus_split property,
    generalized per stratum).

    Rebalancing corpora by language / quality tier / source is the
    standard last step before tokenization; at 10^12 rows this is a
    zero-shuffle whole-stage-codegen projection — the rate table
    compiles to a CASE chain, no join (rates are config, not data).
    """
    h = T.h60(F.col(id_col))
    kept = None
    for stratum, (num, den) in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        keep_s = (h % den) < num
        kept = F.when(cond, keep_s) if kept is None \
            else kept.when(cond, keep_s)
    dnum, dden = default_rate
    default = (h % dden) < dnum
    kept = default if kept is None else kept.otherwise(default)
    return pages.select(F.col(id_col),
                        F.col(strata_col).alias("stratum"),
                        kept.alias("kept"))


def stratified_sample_sql(docs_cte: str, strata_col: str,
                          rates: dict[str, tuple[int, int]],
                          default_rate: tuple[int, int] = (1, 1),
                          id_col: str = "url") -> str:
    """DuckDB twin of stratified_sample over a CTE providing
    (id_col, strata_col)."""
    h = T.h60_sql(id_col)
    whens = "\n".join(
        f"WHEN {strata_col} = '{s}' THEN ({h}) % {den} < {num}"
        for s, (num, den) in sorted(rates.items()))
    dnum, dden = default_rate
    return f"""
        SELECT {id_col}, {strata_col} AS stratum,
               CASE {whens}
                    ELSE ({h}) % {dden} < {dnum} END AS kept
        FROM {docs_cte}
    """


def vocab_topn(pages: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(token, n_occurrences, n_docs) for the corpus's top-n tokens by
    total occurrences, ties broken by token text — a total order, so
    the result is deterministic and engine-portable.

    Scale: the canonical word count — explode + partial map-side
    aggregation, ONE shuffle of (token, partial counts); the global
    sort+limit compiles to TakeOrderedAndProject (per-partition top-n
    + driver merge of n×P rows — no full sort materializes;
    plan-asserted in tests/test_plans.py).
    """
    toks = pages.select(
        F.col("url"),
        F.explode(T.tokens(F.col(text_col))).alias("token"))
    return (toks.groupBy("token")
            .agg(F.count("*").alias("n_occurrences"),
                 F.count_distinct("url").alias("n_docs"))
            .orderBy(F.col("n_occurrences").desc(), F.col("token"))
            .limit(n))
