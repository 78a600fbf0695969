"""SparkSession factory with scale-oriented defaults.

The reference runs everything in a single Airflow worker process
(SequentialExecutor, one VM — ``airflow_gcp/airflow.cfg:52,67``).  This engine
instead assumes a real cluster: every default below is chosen so the same code
runs unchanged from ``local[32]`` tests up to a 1000-executor deployment.

Key choices
-----------
- **AQE on** (coalesce partitions, skew-join splitting, dynamic broadcast):
  at 100 TB the static plan is always wrong somewhere; AQE re-plans from real
  stage statistics.
- **Arrow on** for the few pandas-UDF operators (LLM/embedding harness,
  point-in-polygon) — batch columnar transfer instead of row pickling.
- **Session timezone UTC** — the reference stores timezone-aware timestamps
  (``get_edm_council_transcripts.py:63-68``); pinning UTC makes results
  deterministic and oracle-comparable.
- ``shuffle.partitions`` defaults to 2× cores locally; on a cluster you would
  size it so post-shuffle partitions land ~128-200 MB (or simply let AQE
  coalesce from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "re_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for
    local runs; on a cluster leave it unset and let spark-submit provide it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus * 2, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, broadcast-join promotion from real stage stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF operators (llm harness, geometry kernels).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast threshold: enrichment/dimension sides in this workload are
        # small (SURVEY §2.4: "join sides are small → broadcast hash join").
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Deterministic parquet behavior across engines.
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # Spark 4.1 infers isAdjustedToUTC=false parquet timestamps as
        # TIMESTAMP_NTZ, which withWatermark rejects; with UTC pinned the LTZ
        # reading is wall-clock-identical, so keep the pre-4.1 behavior.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Local files are tiny; without this a 1 MB parquet becomes ONE input
        # partition and map-heavy operators (minhash, simhash) serialize onto
        # a single core.  On a real cluster with 128 MB+ files, raise it back
        # (env-tunable).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"),
        )
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
