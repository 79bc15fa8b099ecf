"""Sessionization — gaps-and-islands over an event stream.

Two surfaces over the ``events`` shape (event_id, ts, user_id, value):

* ``sessionize``    — row-level session assignment: every event gets a
                      1-based per-user ``session_idx``, a new session
                      starting whenever the gap to the previous event
                      of the same user exceeds ``gap_us``. The classic
                      lag + cumulative-sum window pair — portable to
                      any ANSI engine, which is what the DuckDB gate
                      replays.
* ``session_stats`` — per-session rollups via Spark's NATIVE
                      ``F.session_window`` (the idiomatic Structured-
                      Streaming-compatible path: the same expression
                      sessionizes a readStream with a watermark).
                      Merging semantics are identical to sessionize's
                      split rule — events chain while each consecutive
                      gap is <= gap_us — which pytest asserts by
                      rebuilding the stats from sessionize output.

Portability: outputs carry NO raw timestamps — only differential
microseconds (timestampdiff) and exact ints — so hash comparison never
depends on session-timezone rendering of parquet TIMESTAMP values
(same rule as the as-of gate's gap_us column, operators/asof.py).

Scale shape (10^12 events): ONE shuffle on user_id; the window sort is
per-user (Spark sorts within partitions after hashing — no global
sort). session_stats' groupBy(user_id, session_idx) reuses the
window's hash partitioning (subset-satisfies-clustering), so no second
exchange — plan-asserted in tests/test_plans.py. A pathological user
with 10^8 events serializes into one task — real pipelines bound
per-user history (TTL) exactly as streaming/stateful.py does with its
state timeout; the native session_window path shares the same limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PREV = "_sess_prev_ts"
_NEW = "_sess_new"


def sessionize(events: DataFrame, gap_us: int,
               user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """(event_id, user_id, session_idx, gap_us_prev): per-event session
    assignment. A session breaks when the event is > ``gap_us``
    microseconds after the user's previous event. ``order_col`` breaks
    timestamp ties deterministically (required for an exact gate —
    equal-ts rows would otherwise order arbitrarily within the window).

    gap_us_prev is the microsecond gap to the previous same-user event
    (null for each user's first event) — the signal a pipeline
    thresholds when tuning the timeout.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(order_col))
    df = events.withColumn(_PREV, F.lag(ts_col).over(w))
    gap = F.expr(f"timestampdiff(MICROSECOND, {_PREV}, {ts_col})")
    df = df.withColumn("gap_us_prev", gap)
    is_new = F.col(_PREV).isNull() | (F.col("gap_us_prev") > gap_us)
    df = df.withColumn(
        "session_idx",
        F.sum(is_new.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return df.select(order_col, user_col, "session_idx", "gap_us_prev")


def session_stats(events: DataFrame, gap_us: int,
                  user_col: str = "user_id", ts_col: str = "ts",
                  order_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """(user_id, n_events, duration_us, first_event, last_event,
    value_cents): one row per session, built on the NATIVE
    ``F.session_window`` operator — Catalyst's session-merging
    aggregate, the same expression that sessionizes a stream.

    value_cents = sum of round(value * 100) as int64 — quantize-then-
    sum, so the aggregate is order-free and exact (a float sum would be
    shuffle-order-dependent; same trick as ann.py's trained centroids).
    duration_us = last ts - first ts within the session (the window's
    end - start - gap, computed directly from min/max to stay
    differential). Session identity is NOT in the output (the window
    start is a raw timestamp); rows are identified by their content —
    first_event/last_event pin each session uniquely anyway.
    """
    gap_expr = f"INTERVAL {int(gap_us)} MICROSECOND"
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (events
            .groupBy(user_col,
                     F.session_window(F.col(ts_col), gap_expr).alias("_w"))
            .agg(F.count("*").alias("n_events"),
                 F.expr(f"timestampdiff(MICROSECOND, min({ts_col}),"
                        f" max({ts_col}))").alias("duration_us"),
                 F.min(order_col).alias("first_event"),
                 F.max(order_col).alias("last_event"),
                 F.sum(cents).alias("value_cents"))
            .select(user_col, "n_events", "duration_us", "first_event",
                    "last_event", "value_cents"))


def stats_from_sessionize(events: DataFrame, gap_us: int,
                          user_col: str = "user_id", ts_col: str = "ts",
                          order_col: str = "event_id",
                          value_col: str = "value") -> DataFrame:
    """The same rollup built from sessionize() output — the portable
    twin pytest uses to prove session_window's merge rule equals the
    lag-split rule (and the shape the DuckDB oracle replays)."""
    idx = sessionize(events, gap_us, user_col, ts_col, order_col)
    cents = F.round(F.col(value_col) * 100).cast("long")
    joined = events.select(user_col, ts_col, order_col,
                           cents.alias("_cents")) \
        .join(idx.select(order_col, "session_idx"), order_col)
    return (joined.groupBy(user_col, "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.expr(f"timestampdiff(MICROSECOND, min({ts_col}),"
                        f" max({ts_col}))").alias("duration_us"),
                 F.min(order_col).alias("first_event"),
                 F.max(order_col).alias("last_event"),
                 F.sum("_cents").alias("value_cents"))
            .select(user_col, "n_events", "duration_us", "first_event",
                    "last_event", "value_cents"))
