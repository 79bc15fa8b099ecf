"""Mergeable approximate sketches: HyperLogLog tile-distinct and
Count-Min token frequencies (SURVEY §2.3 pipeline layer).

Why sketches in a 100 TB engine: exact per-tile distinct counts and
exact global token frequencies both shuffle one row per (group, item)
— at 10^12 rows that is the corpus itself. A sketch shuffles a FIXED
number of integers per group (HLL: 64 registers; CM: 4×1024 counters)
regardless of input size, and two sketches built on disjoint shards
merge losslessly (register-max / counter-sum), which is exactly the
partial-aggregation contract Spark's map-side combine wants.

Portability discipline (CLAUDE.md): every value that reaches a
CORRECTNESS gate is integer-exact — register indexes and rho from
bit-twiddling on h60 (md5) hashes, the HLL harmonic sum carried as a
scaled BIGINT (sum of 2^(RHO_CAP-rho), max 64 terms × 2^54 < 2^63),
counters as exact counts. The only floats are single IEEE divisions /
multiplications (deterministic across engines); libm calls (ln) live
ONLY in the driver-side estimator helpers, never in gated columns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

# --------------------------------------------------------------------------
# HyperLogLog (m = 64 registers, h60 hash)
# --------------------------------------------------------------------------

HLL_P = 6                       # register-index bits
HLL_M = 1 << HLL_P              # 64 registers
HLL_W_BITS = 60 - HLL_P         # 54 hash bits feed rho
RHO_CAP = HLL_W_BITS + 1        # rho(0) = 55 (all-zero suffix)
# alpha_64 per Flajolet et al. 2007 (m >= 64): 0.709
HLL_ALPHA = 0.709


def _rho(w) -> "F.Column":
    """1 + leading zeros of w within HLL_W_BITS bits; RHO_CAP for w=0.
    length(bin(w)) == floor(log2 w)+1 for w>0 — integer-exact and
    portable (DuckDB bin() prints the same no-leading-zeros form)."""
    return F.when(w > 0, F.lit(RHO_CAP) - F.length(F.bin(w))) \
        .otherwise(F.lit(RHO_CAP)).cast("int")


def hll_register_rows(pages: DataFrame, group_col: str,
                      id_col: str = "url") -> DataFrame:
    """(group, reg, r_max) — the sparse register relation (registers a
    group never touched are absent; they are the 'zeros' downstream).

    Scale shape: ONE partial+final hash aggregation; only
    (group, reg, rho-partial-max) ever shuffles — at most 64 rows per
    group per map task, independent of row count. This relation IS the
    mergeable sketch: union register rows from any shards and re-take
    max(r_max) per (group, reg) (associative + idempotent), asserted
    in tests/test_sketches.py.
    """
    h = T.h60(F.col(id_col))
    return (pages
            .select(F.col(group_col).alias("grp"),
                    (h % HLL_M).cast("int").alias("reg"),
                    _rho(F.shiftrightunsigned(h, HLL_P)).alias("rho"))
            .groupBy("grp", "reg")
            .agg(F.max("rho").alias("r_max")))


def hll_sketch(pages: DataFrame, group_col: str,
               id_col: str = "url") -> DataFrame:
    """Per-group HLL sketch row: (grp, n_regs, zeros, sum_scaled, est).

    sum_scaled = Σ_regs 2^(RHO_CAP - rho) with absent registers at
    rho=0, i.e. the HLL harmonic denominator scaled by 2^RHO_CAP —
    EXACT in int64 (64 terms ≤ 2^55). est is the raw HLL estimate
    alpha·m²·2^RHO_CAP / sum_scaled: one float literal product and one
    IEEE division, bit-identical across engines. The small-range
    (linear-counting) correction needs ln() and lives in
    hll_estimate() driver-side — libm stays out of gated columns
    (CLAUDE.md trig rule, same reason).
    """
    regs = hll_register_rows(pages, group_col, id_col)
    present = F.count("*").cast("long")
    # pyspark's shiftleft() only takes a literal int for numBits — the
    # SQL form accepts a column expression
    sum_present = F.sum(F.expr(f"shiftleft(1L, {RHO_CAP} - r_max)"))
    per_group = regs.groupBy("grp").agg(
        present.alias("n_regs"),
        sum_present.alias("_sp"))
    zeros = (F.lit(HLL_M).cast("long") - F.col("n_regs"))
    sum_scaled = F.col("_sp") + zeros * F.lit(1 << RHO_CAP).cast("long")
    num = F.lit(HLL_ALPHA) * HLL_M * HLL_M * float(1 << RHO_CAP)
    return (per_group
            .withColumn("zeros", zeros)
            .withColumn("sum_scaled", sum_scaled)
            .withColumn("est", num / F.col("sum_scaled").cast("double"))
            .select(F.col("grp").alias("grp"), "n_regs", "zeros",
                    "sum_scaled", "est"))


def hll_sketch_sql(rel: str, group_col: str, id_expr: str) -> str:
    """DuckDB twin of hll_sketch over relation `rel` (must provide
    group_col and the id expression's inputs)."""
    h = T.h60_sql(id_expr)
    return f"""
        WITH hs AS (
            SELECT {group_col} AS grp,
                   CAST(({h}) % {HLL_M} AS INT) AS reg,
                   (({h}) >> {HLL_P}) AS w
            FROM {rel}),
        rr AS (
            SELECT grp, reg,
                   MAX(CASE WHEN w > 0
                            THEN {RHO_CAP} - length(bin(w))
                            ELSE {RHO_CAP} END) AS r_max
            FROM hs GROUP BY grp, reg),
        pg AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_regs,
                   CAST(SUM(1::BIGINT << ({RHO_CAP} - r_max)) AS BIGINT)
                       AS sp
            FROM rr GROUP BY grp)
        SELECT grp, n_regs, ({HLL_M}::BIGINT - n_regs) AS zeros,
               (sp + ({HLL_M}::BIGINT - n_regs) * (1::BIGINT << {RHO_CAP}))
                   AS sum_scaled,
               (({HLL_ALPHA}::DOUBLE) * {HLL_M} * {HLL_M}
                * ({float(1 << RHO_CAP)!r}::DOUBLE))
               / CAST(sp + ({HLL_M}::BIGINT - n_regs)
                      * (1::BIGINT << {RHO_CAP}) AS DOUBLE) AS est
        FROM pg
    """


def hll_estimate(n_regs: int, zeros: int, sum_scaled: int) -> float:
    """Driver-side corrected estimate from one sketch row: linear
    counting (m·ln(m/V)) below the 2.5m knee when empty registers
    remain, else the raw HLL formula — Flajolet et al. 2007."""
    raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << RHO_CAP) / sum_scaled
    if raw <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return raw


# --------------------------------------------------------------------------
# Count-Min (d = 4 rows x w = 1024 columns, seeded h60 hashes)
# --------------------------------------------------------------------------

CM_D = 4
CM_W = 1024


def _cm_col(item: "F.Column", r: int) -> "F.Column":
    """Row-r counter index: h60 of the seed-prefixed item. Seeding by
    string prefix (not a hash family parameter) keeps the DuckDB twin
    a one-liner and the d hashes independent-enough for CM bounds."""
    return (T.h60(F.concat(F.lit(f"{r}:"), item)) % CM_W).cast("int")


def cm_sketch_tokens(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(r, col, cnt) sparse Count-Min sketch of the corpus TOKEN
    frequency distribution (zero counters omitted).

    Scale shape: tokens explode map-side, then ONE partial+final hash
    aggregation over at most d·w = 4096 counter keys — the shuffle is
    O(d·w) rows per map task no matter how many tokens flow in, and
    sketches from disjoint shards merge by summing counters (tested).
    The d hash columns are computed per distinct exploded token row —
    no self-join, no second text pass.
    """
    toks = (pages
            .select(F.explode(T.tokens(F.col(text_col))).alias("tok")))
    rows = toks.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), _cm_col(F.col("tok"), r).alias("col"))
        for r in range(CM_D)])).alias("_rc"))
    return (rows.select(F.col("_rc.r").alias("r"),
                        F.col("_rc.col").alias("col"))
            .groupBy("r", "col")
            .agg(F.count("*").cast("long").alias("cnt")))


def cm_sketch_tokens_sql(tok_cte: str) -> str:
    """DuckDB twin over a CTE chain providing tok(url, toks)."""
    cols = " UNION ALL ".join(
        f"SELECT {r} AS r, CAST(({T.h60_sql(repr(f'{r}:') + ' || t')})"
        f" % {CM_W} AS INT) AS col FROM toku"
        for r in range(CM_D))
    return f"""{tok_cte},
        toku AS (SELECT unnest(toks) AS t FROM tok),
        rc AS ({cols})
        SELECT r, col, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rc GROUP BY r, col
    """


def cm_estimate(sketch_rows, token: str) -> int:
    """Point estimate from collected sketch rows: min over the d row
    counters (>= true count always; overshoot bounded by e·N/w w.h.p.).
    `sketch_rows` is {(r, col): cnt} from the sketch relation."""
    import hashlib
    best = None
    for r in range(CM_D):
        s = f"{r}:{token}".encode()
        col = int(hashlib.md5(s).hexdigest()[:15], 16) % CM_W
        c = sketch_rows.get((r, col), 0)
        best = c if best is None else min(best, c)
    return best or 0
