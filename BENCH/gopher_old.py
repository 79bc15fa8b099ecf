"""Round-4 gopher_rep frozen for the r5 head-to-head (value-identity
+ timing vs the rewritten operator).  Not part of the package."""
from pyspark.sql import DataFrame, functions as F

from s2geometry_spark.functions import text as T
from s2geometry_spark.operators.textstats import (
    GOPHER_DUP_LINE_PCT, GOPHER_DUP_LINE_CHAR_PCT, GOPHER_TOP_NGRAM_PCT)

def gopher_rep_r4(pages: DataFrame, id_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """(url, n_lines, n_dup_lines, line_chars, dup_line_chars,
    token_chars, top{2,3,4}_chars, flag_*, keep_rep) — the Gopher
    repetition rules, exact-integer throughout so every value and flag
    hash-compares against the DuckDB twin (gopher_rep_sql).

    Definitions (documented adaptations of Rae et al., self-contained
    so the operator needs NO second pass over the raw text):
    - a "duplicate line" is any non-empty '\\n'-line whose exact bytes
      occur >= 2 times in the SAME document; n_dup_lines counts every
      occurrence. Denominators: n_lines (non-empty lines) for the count
      rule, line_chars (sum of their lengths) for the char rule.
    - top{n}_chars = occurrences x length of the document's most
      frequent n-token shingle (space-joined, so the length includes
      the n-1 joining spaces), ties broken toward the lexicographically
      GREATEST shingle (max-struct — deterministic). Denominator is
      token_chars (total token occurrences x their lengths), the
      content-char count, not raw text length.
    - docs with no tokens AND no non-empty lines are excluded from the
      output, matching minhash_signatures' posture: an empty doc has
      no repetition to measure.

    Scale shape (10^12 rows): every count here groups WITHIN one
    document, so the operator is a pure per-row projection — NO
    shuffle, no window, no join (the r4 first cut exploded a tagged
    item stream through two hash aggregations; its 10^8-row item
    shuffle benched 22.6s at sf0.1 — 40x this formulation).
    Duplicates are found by array_sort + adjacent-equality, the top
    n-gram by a longest-run fold over the sorted shingles: O(L log L)
    per doc, bounded per task, skew-free by construction. The DuckDB
    oracle keeps the independent unnest/GROUP BY formulation — the
    gate proves sort-runs ≡ group-counts.
    """
    toks = T.tokens(F.col(text_col))
    lines = F.filter(F.split(F.col(text_col), "\n", -1),
                     lambda l: l != F.lit(""))
    zero = F.lit(0).cast("long")

    def chars_sum(arr):
        return F.aggregate(arr, zero,
                           lambda acc, x: acc + F.length(x).cast("long"))

    # stage 1: raw arrays + empty-doc exclusion via explode-of-
    # conditionally-empty-array, NOT a Filter: PushDownPredicates
    # substitutes a plain size() filter below this projection, which
    # re-tokenizes every row a second time inside the Filter node
    # (verified in the plan: split(text) appeared twice per column —
    # the CLAUDE.md null-intolerant-predicate trap's cousin). A
    # Generate node cannot be pushed through, and the lambda filter
    # reads the already-built struct, so tokenization runs ONCE.
    packed = F.filter(
        F.array(F.struct(toks.alias("t"), lines.alias("l"))),
        lambda s: (F.size(s["t"]) > 0) | (F.size(s["l"]) > 0))
    df = (pages.select(F.col(id_col), F.explode(packed).alias("_p"))
          .select(id_col, F.col("_p.t").alias("_toks"),
                  F.col("_p.l").alias("_lines")))
    # stage 2: sorted arrays + shingles staged once
    df = df.select(
        id_col, "_toks", "_lines",
        F.array_sort("_lines").alias("_sl"),
        *[F.array_sort(T.shingles(F.col("_toks"), n)).alias(f"_sg{n}")
          for n in (2, 3, 4)])
    # stage 3: adjacent-equality over the sorted lines. _eq[i] (0-based
    # via F.get) == (_sl[i] == _sl[i+1]); slice lengths clamped so
    # n<=1 yields [].
    n_sl = F.size("_sl")
    eq_next = F.zip_with(
        F.slice("_sl", 1, F.greatest(F.lit(0), n_sl - 1)),
        F.slice("_sl", 2, F.greatest(F.lit(0), n_sl - 1)),
        lambda a, b: a == b)
    df = df.withColumn("_eq", eq_next)
    # a line occurrence is a duplicate iff it equals its sorted prev OR
    # next neighbor (F.get is 0-based and null-safe out of bounds —
    # element_at would throw under ANSI)
    dup_flags = F.transform(
        "_sl", lambda x, i: (F.coalesce(F.get("_eq", i - 1), F.lit(False))
                             | F.coalesce(F.get("_eq", i), F.lit(False))))
    df = df.withColumn("_dup", dup_flags)

    def run_top(sg_name):
        """Most-frequent gram of a SORTED gram array as struct(cnt,
        item), ties to the GREATEST gram — exactly max(struct(cnt,
        gram)) of the group-by formulation. Two passes: an adjacent-
        equality zip (the only string compares), then a longest-run
        fold whose accumulator is ALL-INTEGER — it tracks the best
        run's END INDEX and fetches that one gram string afterward.
        (A first cut carried prev/best strings in the accumulator:
        two string copies per step x 10^8 steps dominated the whole
        operator — 4x slower than this shape at bench scale.)
        Scanning ascending with >= updates makes the LAST max-count
        run win, i.e. the lexicographically greatest gram."""
        sg = F.col(sg_name)
        n = F.size(sg)
        eq = F.zip_with(
            F.slice(sg, 1, F.greatest(F.lit(0), n - 1)),
            F.slice(sg, 2, F.greatest(F.lit(0), n - 1)),
            lambda a, b: (a == b).cast("long"))
        init = F.struct(F.lit(1).cast("long").alias("cur"),
                        F.lit(1).cast("long").alias("best"),
                        zero.alias("idx"), zero.alias("i"))

        def step(acc, e):
            newcur = F.when(e == 1, acc["cur"] + 1) \
                .otherwise(F.lit(1).cast("long"))
            better = newcur >= acc["best"]
            return F.struct(
                newcur.alias("cur"),
                F.when(better, newcur).otherwise(acc["best"]).alias("best"),
                F.when(better, acc["i"] + 1).otherwise(acc["idx"])
                .alias("idx"),
                (acc["i"] + 1).alias("i"))

        # cnt AND the gram fetch both live in the finish lambda: a
        # two-reference `folded` expression would be re-inlined by
        # Catalyst and the whole fold would run twice per row (the
        # CLAUDE.md projection-collapse trap — measured 1.6x)
        folded = F.aggregate(
            eq, init, step,
            lambda acc: F.struct(
                acc["best"].alias("cnt"),
                F.get(sg, acc["idx"].cast("int")).alias("item")))
        return F.when(n > 0, folded).otherwise(
            F.struct(zero.alias("cnt"), F.lit("").alias("item")))

    df = df.select(
        id_col,
        F.size("_sl").cast("long").alias("n_lines"),
        F.size(F.filter("_dup", lambda d: d)).cast("long")
        .alias("n_dup_lines"),
        chars_sum(F.col("_sl")).alias("line_chars"),
        F.aggregate(F.zip_with("_sl", "_dup",
                               lambda l, d: F.when(d, F.length(l)
                                                   .cast("long"))
                               .otherwise(zero)),
                    zero, lambda acc, x: acc + x).alias("dup_line_chars"),
        chars_sum(F.col("_toks")).alias("token_chars"),
        *[run_top(f"_sg{n}").alias(f"_t{n}") for n in (2, 3, 4)])

    tc = {n: (F.col(f"_t{n}")["cnt"]
              * F.length(F.col(f"_t{n}")["item"]).cast("long"))
          for n in (2, 3, 4)}
    f_dl = (F.lit(100) * F.col("n_dup_lines")
            <= F.lit(GOPHER_DUP_LINE_PCT) * F.col("n_lines"))
    f_dlc = (F.lit(100) * F.col("dup_line_chars")
             <= F.lit(GOPHER_DUP_LINE_CHAR_PCT) * F.col("line_chars"))
    f_top = {n: (F.lit(100) * tc[n]
                 <= F.lit(GOPHER_TOP_NGRAM_PCT[n]) * F.col("token_chars"))
             for n in (2, 3, 4)}
    return df.select(
        id_col, "n_lines", "n_dup_lines", "line_chars", "dup_line_chars",
        "token_chars",
        tc[2].alias("top2_chars"), tc[3].alias("top3_chars"),
        tc[4].alias("top4_chars"),
        f_dl.alias("flag_dup_lines"), f_dlc.alias("flag_dup_line_chars"),
        f_top[2].alias("flag_top2"), f_top[3].alias("flag_top3"),
        f_top[4].alias("flag_top4"),
        (f_dl & f_dlc & f_top[2] & f_top[3] & f_top[4]).alias("keep_rep"))


