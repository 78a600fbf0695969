"""Global ordinal / stable-ID assignment at scale.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY plans as a
single-partition window — one reducer sorts the world, which is exactly
what kills a 100 TB job.  The scalable construction (the DataFrame form of
``zipWithIndex``):

1. range-partition by the order key (sampled boundaries → balanced ranges),
2. sort within each partition (no global exchange),
3. count rows per partition (tiny agg), prefix-sum the counts on the driver,
4. ordinal = partition offset + local row_number.

The order key must be unique (add a tiebreak column) or ties straddling a
range boundary could interleave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_ordinals(
    df: DataFrame,
    order_cols: list[Column | str],
    ordinal_col: str = "ordinal",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based global ordinal following ``order_cols`` without a
    single-partition sort.  ``order_cols`` must define a total order.

    The repartitioned+sorted intermediate is persisted (it feeds both the
    count pass and the output); the handle is exposed on the result as
    ``._ordinal_cache`` so long-lived callers can ``unpersist()`` after
    materializing."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    parts = parts.persist()
    counts = {r["__pid"]: r["n"] for r in parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]), F.col("__pid")
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = parts.withColumn(
        ordinal_col, (offset_expr + F.row_number().over(w) - 1).cast("bigint")
    ).drop("__pid")
    out._ordinal_cache = parts  # release path for long-lived sessions
    out._ordinal_total = acc  # total row count (already collected — free)
    return out


def exact_ntile(
    df: DataFrame,
    order_cols: list[Column | str],
    k: int,
    out_col: str = "ntile",
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY ...)`` without the single-partition
    window: global ordinals come from :func:`assign_ordinals` (range
    partition + per-partition window + partition-count offset exchange),
    and the bucket is pure row-local arithmetic on the ordinal against the
    (driver-known, already-collected) total — SQL NTILE semantics exactly:
    with n rows, the first ``n mod k`` buckets carry ``⌈n/k⌉`` rows.

    ``order_cols`` must define a total order (unique tiebreak), as for
    ``assign_ordinals``.
    """
    o = assign_ordinals(df, order_cols, "__ord_nt")
    n = o._ordinal_total
    q, r = divmod(n, k) if n else (0, 0)
    ord_c = F.col("__ord_nt")
    if q == 0:
        bucket = ord_c + 1  # n < k: one row per leading bucket
    else:
        big = r * (q + 1)
        bucket = (
            F.when(ord_c < big, F.floor(ord_c / (q + 1)))
            .otherwise(r + F.floor((ord_c - big) / q))
            + 1
        )
    out = o.withColumn(out_col, bucket.cast("int")).drop("__ord_nt")
    out._ordinal_cache = o._ordinal_cache
    return out


def exact_percent_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "percent_rank",
    digits: int = 6,
) -> DataFrame:
    """Exact ``PERCENT_RANK() OVER (ORDER BY ...)`` (= (rank−1)/(n−1),
    which equals ordinal/(n−1) under a unique total order) without the
    single-partition window — same ordinal spine as :func:`exact_ntile`.
    A single-row frame scores 0.0, matching SQL."""
    o = assign_ordinals(df, order_cols, "__ord_pr")
    n = o._ordinal_total
    pr = (
        F.lit(0.0)
        if n <= 1
        else F.round(F.col("__ord_pr") / F.lit(float(n - 1)), digits)
    )
    out = o.withColumn(out_col, pr).drop("__ord_pr")
    out._ordinal_cache = o._ordinal_cache
    return out
