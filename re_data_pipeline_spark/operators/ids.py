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
    return out
