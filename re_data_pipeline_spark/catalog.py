"""Table registry over the driver's parquet test data.

The reference exchanges data between tasks as JSON blobs on GCS and relational
tables in Postgres (SURVEY §1.1).  Here every table is a columnar parquet
dataset; ``load_tables`` registers them as temp views so both the DataFrame
API and ``spark.sql`` can reach them, and Catalyst gets column pruning +
predicate pushdown into the scan for free (SURVEY §4 O1/O2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; Catalyst prunes columns / pushes filters.

    ``events`` ships nanosecond parquet timestamps, which Spark's reader
    rejects; we read nanos as long (runtime-settable legacy conf) and truncate
    to microsecond TimestampType — the same ns→µs truncation DuckDB applies
    when casting TIMESTAMP_NS → TIMESTAMP, so both engines see equal values.

    Session invariants the engine's results depend on are (re)pinned here —
    every query path loads tables, and both confs are runtime-settable, so
    results stay correct even under a caller-provided SparkSession:
    - UTC session timezone (timestamp→string outputs must match the oracle's
      naive timestamps);
    - shuffle partitions sized for the local data scale unless the caller
      already tuned them.
    """
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        # untouched default → size for the test scale
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    # Spark 4.1 infers parquet timestamps with isAdjustedToUTC=false as
    # TIMESTAMP_NTZ, which Structured Streaming's withWatermark rejects
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  With the session timezone pinned
    # UTC the LTZ reading has identical wall-clock values, so disable NTZ
    # inference (runtime-settable, and re-pinned here so a caller-provided
    # SparkSession gets it too).
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Defensive: if any NTZ column slipped through (e.g. conf ignored by a
    # future Spark), cast to TIMESTAMP — wall-clock-preserving under UTC.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load every test table; optionally register temp views for spark.sql."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
