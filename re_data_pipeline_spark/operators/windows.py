"""Event-time window aggregation (SURVEY §2.9 — capability extension).

The reference has only hand-rolled incremental semantics (lookback filters,
state flags); the driver's ``events`` table makes windowed aggregation a
first-class operator here.  Batch and streaming share these definitions:
``F.window`` / ``F.session_window`` work identically over a static DataFrame
and a stream (add ``withWatermark`` upstream for streams — see
``re_data_pipeline_spark.streaming``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed non-overlapping windows; one hash shuffle on (window, groups)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping hop windows — each row lands in duration/slide windows
    (Spark expands this internally; shuffle volume scales by that factor)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per group key (``F.session_window`` — dynamic window merge)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("win.start"))
        .withColumn("session_end", F.col("win.end"))
        .drop("win")
    )
