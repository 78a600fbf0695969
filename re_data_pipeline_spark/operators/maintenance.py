"""Table-maintenance operators: small-file compaction planning.

A 100 TB table accretes small files from streaming micro-batches and
per-executor writes (the reference's per-task appends —
``tasks/broker_feeds/combine_broker_listings.py`` writes whatever each run
produced); query latency then dies on file-open overhead and tiny row
groups.  Compaction = rewrite many small files into few target-sized ones.
The *plan* (which files merge into which output) is itself a relational
computation and must scale to millions of file entries, so it runs as a
DataFrame job over the file inventory, not a driver loop.

Bin assignment is the streaming first-fit used by every table format's
compactor (Delta OPTIMIZE, Iceberg rewrite_data_files): within a table
partition, order files deterministically, take a running byte total, and
cut a new output bin every ``target_bytes`` — ``bin = floor((cumsum −
size) / target)``, i.e. a file joins the bin its *starting* offset falls
in.  Pure window arithmetic: one shuffle keyed by the table partition, no
driver state, no UDF.  Files larger than the target land alone in their
own bin(s) and can be skipped by the executor (already-compact check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction(
    files: DataFrame,
    partition_cols: list[str],
    size_col: str = "size_bytes",
    file_col: str = "file_id",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Assign every file to a compaction output bin.

    Input: one row per data file with its table-partition columns, a
    deterministic file identifier, and its size.  Output: the input plus
    ``bin`` (BIGINT, 0-based within each table partition) — all files with
    the same (partition, bin) are rewritten into one output file of ~
    ``target_bytes``.

    Scale shape: a single window over (partition_cols) ordered by
    ``file_col`` — one hash exchange on the table partition key, which is
    exactly how the work parallelizes on a cluster (each table partition
    compacts independently).  No global sort, no driver-side file list.
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(size_col)).over(w)
    return files.withColumn(
        "bin",
        F.floor((cum - F.col(size_col)) / F.lit(target_bytes)).cast("bigint"),
    )


def compaction_summary(
    planned: DataFrame, partition_cols: list[str], size_col: str = "size_bytes"
) -> DataFrame:
    """Roll a compaction plan up to one row per output bin: file count and
    total bytes — the review surface before launching the rewrite jobs."""
    return planned.groupBy(*[F.col(c) for c in partition_cols], F.col("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(size_col).cast("bigint").alias("bin_bytes"),
    )
