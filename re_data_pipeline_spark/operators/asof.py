"""As-of (temporal) join — capability extension (SURVEY §2.4 notes the
reference has "no theta, range/as-of" joins; a market-data engine needs one).

Semantics: for each left row (key, ts), attach the right row with the same
key and the greatest right.ts ≤ left.ts (inclusive — DuckDB ``ASOF JOIN``
semantics, which the oracle uses directly).

Scalable formulation (no per-row probes, no range cross join): union both
sides with a side marker, then one window pass per key ordered by
(ts, side) carrying the last-seen right payload forward::

    left(side=1) ∪ right(side=0)
    last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side
                                     ROWS UNBOUNDED PRECEDING .. CURRENT)

One shuffle on the key, linear in |L|+|R|.  Skew caveat (honest form —
AQE splits skewed JOINS, not window partitions): each key's carry-forward
scan runs in ONE task, so the wall is bounded by the hottest key's
|L|+|R| rows.  That is the right trade for the as-of join's natural
key shape (instrument/entity ids: many keys, bounded per-key history);
a corpus with FEW heavy keys should not be as-of joined on those keys
directly — pre-bucket the timestamp range per key (compute each bucket's
carry-in with one per-(key, bucket) agg, the prefix-sum-spine trick)
before reaching for this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_ts_col: str | None = None,
    payload_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join.  ``payload_cols`` default to all right columns except
    the keys and timestamp; they appear in the output as ``<col><suffix>``
    (plus ``<ts_col><suffix>`` — the matched right timestamp)."""
    rts = right_ts_col or ts_col
    # default payload excludes the keys, the right timestamp, AND any right
    # column named like the LEFT timestamp: when rts != ts_col, a right
    # column literally named ts_col would alias-collide with the matched-
    # timestamp carrier (and its suffixed output) — pass payload_cols
    # explicitly (renamed) to carry such a column
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(on) | {rts, ts_col}
    ]

    # The whole right row travels as ONE struct carried by ONE
    # last(ignoreNulls) — carrying each payload column independently would
    # substitute stale values from OLDER right rows whenever the matched row
    # has a NULL in that column (and could mix columns from different rows).
    # The struct itself is NULL on left rows and never NULL on right rows
    # (even if every payload field inside it is NULL), so last(ignoreNulls)
    # picks exactly the latest right ROW, NULL payload fields intact.
    pr_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
        + [StructField("__rts__", right.schema[rts].dataType)]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(pr_type).alias("__pr"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(rts).alias(ts_col),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(c) for c in payload_cols],
            F.col(rts).alias("__rts__"),
        ).alias("__pr"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m", F.last(F.col("__pr"), ignorenulls=True).over(w))
    return carried.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m").getField(c).alias(f"{c}{suffix}") for c in payload_cols],
        F.col("__m").getField("__rts__").alias(f"{ts_col}{suffix}"),
    )


def interval_lookup(
    facts: DataFrame,
    intervals: DataFrame,
    x_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_size: float = 1.0,
) -> DataFrame:
    """Assign each fact row its containing interval ([start, end), at most
    one — intervals must be non-overlapping): the IP→geo / price-tier /
    rate-card lookup pattern.

    Scalable formulation — the radius_join trick in one dimension: facts
    key on ``floor(x / bucket_size)``, intervals EXPLODE to every bucket
    they overlap, and the join is an ordinary equi-join on the bucket plus
    the exact range predicate.  No per-row probe, no broadcast nested-loop
    range join, no single-partition window; cost scales with
    |facts| + |intervals|·(len/bucket_size).  Pick ``bucket_size`` near the
    typical interval length (one overlap bucket each).

    Left join: facts outside every interval keep NULL interval columns.
    """
    x = F.col(x_col)
    f = facts.withColumn("__b", F.floor(x / F.lit(bucket_size)).cast("long"))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_size)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_size)).cast("long"),
            )
        ),
    )
    cond = (F.col(start_col) <= x) & (x < F.col(end_col))
    # transient per-row id: collapses the exploded join multiplicity back
    # to exactly one output row per INPUT ROW (a full-row groupBy would
    # merge duplicate fact rows).  The id itself is partition-dependent but
    # never escapes — only "did this row's join candidates include the
    # containing interval" does, which is deterministic.
    f = f.withColumn("__rid", F.monotonically_increasing_id())
    joined = f.join(iv, on=["__b"], how="left")
    payload = [c for c in intervals.columns]
    hit = F.when(cond, F.struct(*[F.col(c) for c in payload]))
    fact_cols = [c for c in facts.columns]
    w = Window.partitionBy("__rid").orderBy(F.col("__hit").isNull().cast("int"))
    out = (
        joined.withColumn("__hit", hit)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    return out.select(
        *fact_cols, *[F.col("__hit").getField(c).alias(c) for c in payload]
    )
