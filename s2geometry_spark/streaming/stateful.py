"""Custom stateful streaming operator — applyInPandasWithState
(SURVEY.md B25 extension; the "custom stateful operator" slot).

``streaming_first_seen``: exactly-one-emission-per-key dedup across
micro-batches. For every key group the state is a single seen-flag +
first-seen metadata; the first arriving row is emitted, every later
occurrence (same batch or any later batch) is suppressed. This is the
streaming form of exact dedup for a training-data ingest pipeline:
url-keyed, it admits each page once no matter how often a crawler
re-delivers it.

State size is O(distinct keys), the minimum any exact streaming dedup
can hold; production bounds it with a state TTL: pass ``ttl`` (e.g.
"30 minutes") and each admitted key registers a processing-time
timeout — on expiry Spark invokes the function with hasTimedOut=True
and the key's state is removed, so a re-delivery AFTER the TTL is
admitted again. Dedup guarantee becomes "exactly once per TTL window",
the standard bounded-state trade; ttl=None keeps exact forever-dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

FIRST_SEEN_OUTPUT = StructType([
    StructField("url", StringType()),
    StructField("first_ts", TimestampType()),
    StructField("n_chars", LongType()),
])

_STATE = StructType([StructField("seen", IntegerType())])


def make_first_seen_fn(ttl: str | None = None):
    """Build the stateful function; ttl (a duration string) bounds
    per-key state with a processing-time timeout."""

    def first_seen_fn(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry callback: no rows, just evict the seen-flag so
            # state stays O(keys-within-TTL), not O(all-time keys)
            state.remove()
            return
        if state.exists:
            # key admitted in an earlier batch — suppress everything
            # (and refresh the TTL clock: dedup window is sliding)
            for _ in pdfs:
                pass
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("warc_ts")
            if first is None or pdf.iloc[0]["warc_ts"] < first["warc_ts"]:
                first = pdf.iloc[0]
        if first is None:
            return
        state.update((1,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame({
            "url": [key[0]],
            "first_ts": [first["warc_ts"]],
            "n_chars": [len(first["text"])],
        })

    return first_seen_fn


SESSION_OUTPUT = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("session_idx", LongType()),
])

_SESS_STATE = StructType([
    StructField("last_ts_us", LongType()),
    StructField("session_idx", LongType()),
])


def make_sessionize_fn(gap_us: int, ttl: str | None = None):
    """Stateful core of streaming_sessionize: per-user state is just
    (last event's epoch-µs, current session index) — O(1) per user, the
    minimum any streaming sessionizer can hold."""

    def sessionize_fn(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # an idle user's next event would start a new session
            # anyway (idle ≥ TTL ≥ gap), so evicting state changes
            # nothing except... the session indexes restart at 1;
            # callers that need globally increasing indexes keep
            # ttl=None (state O(users), like first-seen's trade)
            state.remove()
            return
        last_us, idx = state.get if state.exists else (None, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            return
        # gaps use the JVM-computed epoch-µs column, NOT the pandas
        # timestamp: Arrow renders timestamps in the session timezone
        # and strips the tz, so naive-local arithmetic would go
        # backwards across a DST fall-back and split sessions wrongly
        # at spring-forward (review finding r4) — epoch µs is what the
        # batch twin's lag() arithmetic uses too
        pdf = pd.concat(chunks).sort_values(["ts_us", "event_id"])
        ts_us = pdf["ts_us"].to_numpy("int64")
        out = []
        for t in ts_us:
            if last_us is None or t - last_us > gap_us:
                idx += 1
            out.append(idx)
            last_us = int(t)
        state.update((last_us, int(idx)))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame({"event_id": pdf["event_id"].to_numpy(),
                            "user_id": key[0],
                            "session_idx": out})

    return sessionize_fn


def streaming_sessionize(events_stream: DataFrame, gap_us: int,
                         ttl: str | None = None) -> DataFrame:
    """Row-level session assignment over a stream — the streaming twin
    of operators/sessions.sessionize, as an applyInPandasWithState
    custom stateful operator (batch session_window aggregates can't
    emit per-event labels).

    Contract: events of a user must arrive in event-time order ACROSS
    micro-batches (within a batch any order is fine — the function
    sorts). A file/Kafka source partitioned by arrival time satisfies
    this; genuinely late data needs the watermarked session_window
    rollup instead. ``ttl`` bounds state per idle user; because any
    event after an idle period ≥ gap starts a fresh session anyway,
    eviction only resets the per-user session numbering (state becomes
    O(active users)).
    """
    timeout = (GroupStateTimeout.NoTimeout if ttl is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    # epoch-µs conversion by type: unix_micros for TIMESTAMP (tz-aware
    # internal µs — immune to session-tz rendering), but it REJECTS
    # TIMESTAMP_NTZ, where a naive diff from the naive epoch is the
    # right (tz-free) arithmetic anyway — both match the batch twin's
    # lag() differences
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        ts_us = F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    else:
        ts_us = F.unix_micros(F.col("ts"))
    withus = events_stream.select(
        "event_id", "user_id", ts_us.alias("ts_us"))
    return (withus
            .groupBy("user_id")
            .applyInPandasWithState(
                make_sessionize_fn(gap_us, ttl), SESSION_OUTPUT,
                _SESS_STATE, "append", timeout))


def streaming_first_seen(pages_stream: DataFrame,
                         ttl: str | None = None) -> DataFrame:
    """One output row per distinct url (per TTL window when ttl is
    set) — the first delivery wins (earliest warc_ts within its first
    batch). Later re-deliveries are dropped by the per-key state flag.
    """
    timeout = (GroupStateTimeout.NoTimeout if ttl is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (pages_stream
            .groupBy("url")
            .applyInPandasWithState(
                make_first_seen_fn(ttl), FIRST_SEEN_OUTPUT, _STATE,
                "append", timeout))
