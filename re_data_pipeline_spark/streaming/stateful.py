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
    rows are sorted by (ts, event_id) before the fold.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_type = state.get
        else:
            n, total, last_type = 0, 0.0, None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_type = str(pdf["event_type"].iloc[-1])
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
# timezone-proof and cheap to serialize through the state store
SESSIONS_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_per_user(events: DataFrame, gap_seconds: int) -> DataFrame:
    """Event-time session windows as a *custom stateful operator* — the
    applyInPandasWithState twin of ``operators.windows.session``
    (``F.session_window``), proving the engine can express session semantics
    even where the built-in operator wouldn't fit (per-session custom logic,
    e.g. per-session token budgets or early-emit policies).

    Protocol per key: merge the batch's rows (sorted by event time) into the
    open session; a row further than ``gap_seconds`` past the session end
    *closes* it (emitted immediately) and opens a new one.  The still-open
    session arms an event-time timeout at ``end + gap``; when the watermark
    passes it, the timeout invocation emits the session and clears state.
    State is partitioned by the group key and checkpoint-persisted — on a
    1000-executor cluster each executor holds only its keys' open sessions
    (bounded by active users, not corpus size).

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

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield emit(start_us, end_us, n)
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())

        # interval-merge fold (exactly F.session_window's semantics): treat
        # the open session as an interval and each event as [t, t]; sort ALL
        # intervals by start and merge neighbors within the gap.  This
        # handles late in-watermark events BEFORE the open session's start
        # (they extend it backwards or form their own earlier session)
        # where a naive append-only fold would regress or over-merge.
        intervals = [[t, t, 1] for t in ts_us]
        if state.exists:
            intervals.append(list(state.get))
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        cur = None
        for iv in intervals:
            if cur is None:
                cur = iv
            elif iv[0] - cur[1] > gap_us:
                yield emit(*cur)
                cur = iv
            else:
                cur[1] = max(cur[1], iv[1])
                cur[2] += iv[2]
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSIONS_OUTPUT,
        stateStructType=SESSIONS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
