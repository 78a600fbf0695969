"""Custom stateful streaming operators via ``applyInPandasWithState``
(north-star: "applyInPandasWithState for custom stateful operators").

The reference's incremental state is a pair of 0/1 columns updated
transactionally after each batch (``vectorized``/``summarized``,
``transcripts_to_vector_db.py:160-171``).  The streaming-native
generalization is keyed state the engine checkpoints for us: here a
running per-key accumulator (count, decimal-exact sum, last-seen event
time) that emits an updated row per key per micro-batch.

State layout is explicit (count LONG, total DOUBLE, last_ts LONG) — the
contract a 1000-executor deployment relies on: state is partitioned by the
group key, lives in the state store, and survives restarts via the
checkpoint, replacing the reference's Postgres flag writes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)

RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_type", StringType()),
    ]
)


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Keyed running aggregate with explicit engine-managed state.

    Each micro-batch: merge the key's new rows into (n, total, last_type)
    state and emit the updated snapshot row.  Deterministic within a batch:
    "last" means the max-(ts, event_id) row of the WHOLE batch.  The
    iterator hands the group's rows as multiple Arrow chunks in partition
    order, so the max is tracked ACROSS chunks — taking the last row of
    each chunk after a per-chunk sort (the pre-r14 form) made
    ``last_event_type`` depend on where the chunk boundary fell once a
    group's batch exceeded one Arrow batch (~10k rows): invisible in
    small-batch tests, partition-order-dependent at scale.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_type = state.get
        else:
            n, total, last_type = 0, 0.0, None
        best_key = None  # (ts, event_id) of the batch's max row so far
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            cand = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            k = (cand["ts"], cand["event_id"])
            if best_key is None or k > best_key:
                best_key = k
                last_type = str(cand["event_type"])
        state.update((n, total, last_type))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": total, "last_event_type": last_type}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("last_event", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state is kept in epoch MICROS (LongType) — integer state is
# timezone-proof and cheap to serialize through the state store.  It holds
# EVERY session not yet finalized by the watermark (parallel arrays), not
# just the open one: a session "closed" by a later event inside a batch can
# still be EXTENDED by a late in-watermark event in a later batch, so
# emitting it at close time would split what F.session_window merges.
SESSIONS_STATE = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("ends_us", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)


def sessionize_per_user(events: DataFrame, gap_seconds: int) -> DataFrame:
    """Event-time session windows as a *custom stateful operator* — the
    applyInPandasWithState twin of ``operators.windows.session``
    (``F.session_window``), proving the engine can express session semantics
    even where the built-in operator wouldn't fit (per-session custom logic,
    e.g. per-session token budgets or early-emit policies).

    Protocol per key: interval-merge the batch's rows into ALL pending
    sessions (each event is ``[t, t]``; sort by start, merge neighbors
    within ``gap_seconds`` — exactly F.session_window's fold), then emit
    ONLY the sessions the watermark has finalized (``end + gap < wm``: no
    admissible event — ``ts ≥ wm`` — can merge into them, forwards or
    backwards).  Sessions merely closed by a LATER event stay in state
    until then: a late in-watermark event may still extend one, and
    emitting at close time split what F.session_window merges (r13 review
    fix; regression-tested).  An event-time timeout at the earliest
    pending expiry drives emission when no new events arrive.  State is
    partitioned by the group key and checkpoint-persisted — on a
    1000-executor cluster each executor holds only its keys' unfinalized
    sessions (bounded by active users × in-watermark sessions, not corpus
    size).

    Requires a watermark on the stream's event-time column and
    ``outputMode("append")``.
    """
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us: int, end_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]], dtype="int64"),
                    "session_start": pd.to_datetime([start_us], unit="us"),
                    "last_event": pd.to_datetime([end_us], unit="us"),
                    "n_events": pd.Series([n], dtype="int64"),
                }
            )

        # one unified path: a timed-out invocation has an empty row
        # iterator, so the merge below degenerates to re-checking pending
        # sessions against the advanced watermark
        intervals: list[list[int]] = []
        if state.exists:
            starts, ends, ns = state.get
            intervals.extend([s, e, n] for s, e, n in zip(starts, ends, ns))
        if not state.hasTimedOut:
            for pdf in pdfs:
                intervals.extend(
                    [t, t, 1] for t in (pdf["ts"].astype("int64") // 1000)
                )
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[list[int]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(iv)

        wm_ms = state.getCurrentWatermarkMs()
        live: list[list[int]] = []
        for iv in merged:
            if iv[1] // 1000 + gap_ms < wm_ms:
                yield emit(*iv)  # finalized: nothing admissible can merge
            else:
                live.append(iv)
        if live:
            state.update(
                ([iv[0] for iv in live], [iv[1] for iv in live],
                 [iv[2] for iv in live])
            )
            # timeouts must be strictly later than the current watermark
            expiry = min(iv[1] // 1000 + gap_ms for iv in live)
            state.setTimeoutTimestamp(max(expiry, wm_ms + 1))
        else:
            state.remove()

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSIONS_OUTPUT,
        stateStructType=SESSIONS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
