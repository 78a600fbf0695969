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
