"""Approximate-membership prefilters for incremental dedup at corpus scale.

The reference dedups incrementally with per-key DB lookups (``INSERT ... ON
CONFLICT DO NOTHING`` round trips, ``combine_and_format.py:122-128``).  The
distributed analogue — anti-joining a day's batch against the full corpus —
shuffles BOTH sides on the key, and at 100 TB the corpus side dominates the
job even when the batch is tiny and almost entirely new.

A Bloom filter built over the corpus keys cuts the batch side before any
shuffle: rows the filter rejects are *definitely new* (zero false negatives)
and never participate in the join; only the filter's positives — true
duplicates plus the configured false-positive sliver — proceed to the exact
anti-join.  The final result is therefore EXACTLY the anti-join (the filter
only routes rows), which is what the DuckDB oracle checks.

Engine-portable construction: bit positions are the md5-prefix→BIGINT hash
family used across the repo (``operators/selection.hash_bucket``), the
bitmap is an ordinary (word_idx, 64-bit word) DataFrame built with one
``bit_or`` aggregation, and membership probes are k *broadcast* hash joins —
no driver-side bitmap materialization, no UDF, and the definitely-new path
is map-only.

Sizing: the bitmap DataFrame is m/64 rows.  m up to ~2^30 broadcasts fine
(16 MiB of words); beyond that, build one filter per corpus bucket and
probe the matching bucket's filter (the same partition-local pattern as
``incremental_lsh_dedup``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_position(key: F.Column, salt: int, m_bits: int) -> F.Column:
    """i-th Bloom hash: md5-prefix (60 bits) of ``key#salt`` mod m."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f"#{salt}"))), 1, 15), 16, 10
    ).cast("long")
    return h % m_bits


def bloom_bitmap(
    corpus: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Build the Bloom bitmap over corpus keys → (word_idx, word) rows.

    One explode (k positions per key) + one ``bit_or`` aggregation: the
    100 TB corpus reduces map-side to at most m/64 rows.  Duplicate corpus
    keys cost nothing (the OR is idempotent).
    """
    key = F.col(key_col)
    pos = F.explode(F.array(*[_bit_position(key, i, m_bits) for i in range(k)]))
    bits = corpus.select(pos.alias("__pos")).select(
        (F.col("__pos") / 64).cast("long").alias("word_idx"),
        F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")).alias(
            "__mask"
        ),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("__mask").alias("word"))


def bloom_prefilter_anti_join(
    batch: DataFrame,
    corpus: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``corpus`` — exact
    anti-join semantics, Bloom-accelerated.

    The k membership probes are k BROADCAST hash joins against the bitmap
    (map-only — the batch never shuffles for them).  Rows with any missing
    bit are definitely new and bypass the join entirely; only probe-positive
    rows (true dupes + false positives) reach the exact anti-join.
    """
    bitmap = bloom_bitmap(corpus, key_col, m_bits, k)
    key = F.col(key_col)
    probed = batch
    for i in range(k):
        pos = _bit_position(key, i, m_bits)
        widx, mask, word = f"__w{i}", f"__m{i}", f"__word{i}"
        probed = (
            probed.withColumn(widx, (pos / 64).cast("long"))
            .withColumn(mask, F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")))
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word_idx").alias(widx), F.col("word").alias(word)
                    )
                ),
                widx,
                "left",
            )
        )
        hit = F.coalesce(
            F.col(word).bitwiseAND(F.col(mask)) != 0, F.lit(False)
        )
        probed = probed.withColumn(f"__hit{i}", hit).drop(widx, mask, word)

    all_hit = F.lit(True)
    for i in range(k):
        all_hit = all_hit & F.col(f"__hit{i}")
    probed = probed.withColumn("__maybe_seen", all_hit)
    drop_cols = ["__maybe_seen"] + [f"__hit{i}" for i in range(k)]

    definitely_new = probed.where(~F.col("__maybe_seen")).drop(*drop_cols)
    candidates = probed.where(F.col("__maybe_seen")).drop(*drop_cols)
    verified_new = candidates.join(
        corpus.select(key_col), on=key_col, how="left_anti"
    )
    return definitely_new.unionByName(verified_new)
