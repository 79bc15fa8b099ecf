"""As-of (temporal) join — SURVEY.md B11.

``asof_join(left, right, ...)`` matches every left row to the most
recent right row with ``right.ts <= left.ts`` within the same key
group (classic backward as-of, inclusive, inner semantics).

Physical strategy (scale-first — Spark has no native as-of): the
union + ordered-window fill. Tag both inputs, union them, and over a
window partitioned by the join keys and ordered by (ts, side) take
``last(right_attr, ignorenulls=True)``. One shuffle on the keys, no
range explosion, no driver loop; cost is a sort within each key group
— exactly what a 10^12-row as-of needs (and AQE handles skewed keys).
Right rows sort BEFORE left rows at equal timestamps, so ties match
(>= semantics, same as DuckDB's ASOF JOIN which oracles this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "_asof_side"
_RROW = "_asof_rrow"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              suffix: str = "_r",
              tiebreak: str | None = None,
              tolerance_us: int | None = None,
              direction: str = "backward") -> DataFrame:
    """Backward (default) or forward inclusive as-of join, inner
    semantics. ``direction="forward"`` matches each left row to the
    NEAREST right row with ``right.ts >= left.ts`` — the mirror image,
    implemented by flipping ONLY the window's timestamp sort (right
    still sorts before left at equal timestamps, so ties match
    inclusively in both directions) and the tolerance sign.

    Returns left rows (all columns) plus ``<right_col><suffix>`` for
    each requested right column and ``<right_ts><suffix>`` (the matched
    timestamp); left rows with no prior right row are dropped.

    ``tolerance_us``: maximum allowed left_ts − matched right_ts in
    microseconds (inclusive). For a BACKWARD as-of, dropping matches
    older than the tolerance is exactly match-within-tolerance
    semantics (pandas merge_asof's ``tolerance``): the filled row is
    the nearest prior row, so every other candidate is even older —
    a post-filter cannot change which row would have matched.

    ``tiebreak``: a right column name (must be in right_cols) breaking
    ties among right rows sharing identical (keys, ts) — the row with
    the GREATEST tiebreak value wins. Without it, which of several
    equal-timestamp right rows matches is nondeterministic (the window
    sort order among them is unspecified — same as DuckDB's native
    ASOF JOIN, which also picks an arbitrary one). Pass it whenever the
    right stream can carry duplicate per-key timestamps and the output
    is compared exactly.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    if tiebreak is not None and tiebreak not in right_cols:
        raise ValueError(f"tiebreak {tiebreak!r} must be in right_cols")
    # reserved working names: a left column called _ts would be
    # silently overwritten and then dropped from the output (review
    # finding) — refuse loudly instead
    reserved = {_SIDE, _RROW, "_ts"}
    clash = (reserved & set(left.columns)) | (reserved & set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}"
                         " — rename them on the input")

    lt = left.withColumn(_SIDE, F.lit(1)) \
        .withColumn("_ts", F.col(left_ts))
    # the matched right ROW rides as ONE struct and is filled
    # atomically: per-column last(ignorenulls) fills would mix fields
    # from different right rows whenever a winning row carries a null
    # attribute (or tied rows differ) — a chimera row, not the
    # greatest-(ts, tiebreak) row the contract promises
    rrow = F.struct(*[F.col(c).alias(c) for c in right_cols],
                    F.col(right_ts).alias("__rts"))
    rt = right.select(*on, F.col(right_ts).alias("_ts"),
                      rrow.alias(_RROW)) \
        .withColumn(_SIDE, F.lit(0))

    u = lt.unionByName(rt, allowMissingColumns=True)
    ts_order = (F.col("_ts").asc() if direction == "backward"
                else F.col("_ts").desc())
    order = [ts_order, F.col(_SIDE).asc()]
    if tiebreak is not None:
        # left rows carry a null struct; asc_nulls_first only orders
        # them among themselves (side already separates the sides)
        order.append(F.col(_RROW)[tiebreak].asc_nulls_first())
    w = (Window.partitionBy(*on)
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn(_RROW, F.last(_RROW, ignorenulls=True).over(w))
    out = (u.filter(F.col(_SIDE) == 1)
           .filter(F.col(_RROW).isNotNull()))
    if tolerance_us is not None:
        diff = (f"timestampdiff(MICROSECOND, {_RROW}.__rts, _ts)"
                if direction == "backward"
                else f"timestampdiff(MICROSECOND, _ts, {_RROW}.__rts)")
        out = out.filter(F.expr(diff) <= F.lit(int(tolerance_us)))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(_RROW)[c])
    out = out.withColumn(f"{right_ts}{suffix}", F.col(_RROW)["__rts"])
    return out.drop(_SIDE, "_ts", _RROW)
