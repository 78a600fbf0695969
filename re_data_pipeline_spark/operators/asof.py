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

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[rts].dataType).alias("__rts__"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(rts).alias(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.col(rts).alias("__rts__"),
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
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
        F.last(F.col("__rts__"), ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
    )
    return carried.where(F.col("__side") == 1).drop(
        "__side", "__rts__", *[f"__p_{c}" for c in payload_cols]
    )
