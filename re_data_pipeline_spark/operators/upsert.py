"""Natural-key upsert / archival operators (SURVEY §2.2 K2-K4, §2.4 J4-J5).

The reference loads with ``INSERT ... ON CONFLICT DO NOTHING`` on natural keys
(rentals 6-col key ``combine_and_format.py:44-46,122-128``; listings
``(latitude, longitude, address)`` ``combine_broker_listings.py:55-57,224-234``;
permits chunked-500 ``get_edm_building_permits.py:213-228``) and archives
delisted rows via a key set-difference (``archive_delisted_properties.py:93-147``).

Spark-native semantics: the batch is deduplicated on the key, then a
**left-anti join** against existing keys keeps only genuinely new rows; the
sink appends.  At scale the anti-join is a shuffle on the natural key (or a
broadcast when the batch is small — Catalyst/AQE decides), which is exactly
how Delta's ``MERGE WHEN NOT MATCHED THEN INSERT`` plans it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_new_rows(batch: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``batch`` whose natural key is absent from ``existing``
    (= ON CONFLICT DO NOTHING insert set).  Batch-internal duplicates are
    collapsed first, mirroring the DB unique constraint."""
    return batch.dropDuplicates(keys).join(existing.select(keys), on=keys, how="left_anti")


def upsert_append(existing: DataFrame, batch: DataFrame, keys: list[str]) -> DataFrame:
    """Insert-if-absent result table: existing ∪ (batch − existing) on the key.

    Emulates Delta ``MERGE ... WHEN NOT MATCHED THEN INSERT`` over plain
    DataFrames; with Delta available the same keys drive a real MERGE.
    """
    return existing.unionByName(anti_join_new_rows(batch, existing, keys))


def delisted_rows(existing: DataFrame, current: DataFrame, keys: list[str]) -> DataFrame:
    """Rows in ``existing`` whose key no longer appears in ``current`` —
    the archival set (``archive_delisted_properties.py:93-119``), with the
    reference's null-guard (keys must be non-null to participate)."""
    guard = F.lit(True)
    for k in keys:
        guard = guard & F.col(k).isNotNull()
    return existing.where(guard).join(current.select(keys), on=keys, how="left_anti")


def merge_aggregate_state(
    state: DataFrame,
    batch: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incremental aggregate maintenance: merge a new batch's partial
    aggregates into a persisted per-key state table.

    Contract: both inputs carry mergeable partials per key —
    ``n`` (count), ``total`` (decimal-exact sum), ``lo``/``hi`` (min/max).
    Merging is associative/commutative, so the maintained state equals the
    from-scratch aggregate over all data ever seen — the batch analogue of
    streaming state (I2), and the pattern that avoids full recomputes of
    100 TB rollups when a day of data lands.
    """
    both = state.unionByName(batch)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )


def partial_aggregate(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Produce the mergeable partial shape for ``merge_aggregate_state``."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v.cast("decimal(18,2)")).alias("total"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    )


def retain_active(existing: DataFrame, current: DataFrame, keys: list[str]) -> DataFrame:
    """Active table after archival delete: semi-join against current keys
    (``DELETE WHERE (key) IN delisted`` inverse — ``archive_delisted_properties.py:142-145``)."""
    return existing.join(current.select(keys), on=keys, how="left_semi")
