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

One shuffle on the key, linear in |L|+|R|; skewed keys split by AQE.  At
equal timestamps the right row sorts first (side 0 < 1), giving the
inclusive match.
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
