"""Source readers (SURVEY §2.1).

The reference's inter-task exchange format is "many JSON blobs under a
prefix, parsed and extended into one list" (S8 —
``combine_broker_listings.py:63-75`` and four other sites).  Spark-native:
a **glob JSON scan** is the same union, but parallel, schema-merged, and
predicate/prune-aware.  HTTP/API scans (S1-S7) are acquisition steps outside
the engine; their fetchers are modeled as plain functions whose output lands
in ``spark.createDataFrame`` — with server-side predicate templating kept at
the fetch boundary (SURVEY §4 O1).

PDF/binary ingestion (S10) maps to ``binaryFile`` + a pandas-UDF extraction
stage — see ``re_data_pipeline_spark.llm`` for the extraction harness and
``multimodal`` for typed binary columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json_glob(
    spark: SparkSession,
    path_glob: str,
    schema: StructType | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """Multi-blob JSON union scan (S8): ``prefix/*.json`` → one DataFrame.

    ``multi_line`` selects the file shape EXPLICITLY (pretty-printed blobs
    vs JSON-lines) so it does not silently flip when a schema is added.
    With an explicit schema the scan skips inference (one pass, not two);
    for malformed-row capture use ``read_json_quarantine`` (the
    ``_corrupt_record`` column only exists when declared in the schema).
    """
    reader = spark.read.option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path_glob)


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Columnar table scan; Catalyst pushes filters + prunes columns."""
    return spark.read.parquet(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Binary-document scan (S10, ``REIT_metrics.py:293-314``):
    (path, modificationTime, length, content) rows; extraction is a
    downstream pandas-UDF operator, kept separate so the scan stays prunable."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files (optionally z-order/sorted via
    ``sort_cols``).  Returns the output file count.

    Why it exists: streaming sinks and per-batch appends leave thousands of
    KB-sized files; at 100 TB the NameNode/list cost and per-file task
    overhead dominate scans.  Periodic compaction to ~128-256 MB files
    (≈ one row group per task) restores scan efficiency.  Sizes come from
    the Hadoop FileSystem API so the same code runs on HDFS/S3/GCS.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return n_files


def read_json_quarantine(
    spark: SparkSession, path_glob: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON scan that *splits* instead of failing: returns
    (good_rows, quarantined_raw) where quarantined rows carry the original
    malformed line for replay.

    At 100 TB of crawled JSON some records are always broken; FAILFAST
    kills a 6-hour job at hour 5 and DROPMALFORMED silently loses data.
    The quarantine pattern keeps the pipeline total *and* lossless: bad
    lines land in a side table for inspection/reprocessing.
    """
    from pyspark.sql.types import StringType, StructField
    from pyspark.sql import functions as F

    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path_glob)
        .cache()  # Spark requires materialization before filtering on _corrupt_record
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    # release path: the standard spine-cache convention (ids.release_spines
    # walks _ordinal_caches), NOT a bespoke attribute nobody is told about —
    # call release_spines(good) (or bad; double-unpersist is a no-op) once
    # both frames are materialized, exactly like any ordinal-spine result
    good._ordinal_caches = [df]
    bad._ordinal_caches = [df]
    return good, bad
