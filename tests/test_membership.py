"""Bloom-prefilter anti-join (operators/membership.py).

The filter may only ROUTE rows (definitely-new vs verify-exactly); the
result must equal the plain anti-join bit-for-bit, and the probe path must
stay broadcast-only (no shuffle of the batch for membership).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from re_data_pipeline_spark.operators.membership import (
    bloom_bitmap,
    bloom_prefilter_anti_join,
)


def _keys(spark, n, stride=1, prefix="k"):
    return spark.range(0, n, stride).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key"),
        F.col("id").alias("payload"),
    )


def test_equals_exact_anti_join(spark):
    batch = _keys(spark, 3000)
    corpus = _keys(spark, 3000).where(F.col("payload") % 3 != 1).select("key")
    got = bloom_prefilter_anti_join(batch, corpus, "key", m_bits=1 << 14, k=4)
    want = batch.join(corpus, "key", "left_anti")
    assert sorted(r.key for r in got.collect()) == sorted(
        r.key for r in want.collect()
    )


def test_zero_false_negatives_even_when_saturated(spark):
    # m_bits tiny -> filter saturates -> everything routes to exact verify;
    # the result must STILL be the exact anti-join (correctness never
    # depends on the filter's quality, only performance does).
    batch = _keys(spark, 500)
    corpus = _keys(spark, 500, stride=2).select("key")
    got = bloom_prefilter_anti_join(batch, corpus, "key", m_bits=64, k=2)
    want = batch.join(corpus, "key", "left_anti")
    assert got.count() == want.count() == 250


def test_bitmap_shape_and_membership(spark):
    corpus = _keys(spark, 200).select("key")
    bm = bloom_bitmap(corpus, "key", m_bits=1 << 12, k=4)
    rows = bm.collect()
    # at most m/64 words, every word non-zero (a zero word would never be
    # emitted by the bit_or aggregation)
    assert len(rows) <= (1 << 12) // 64
    assert all(r.word != 0 for r in rows)


def test_definitely_new_path_avoids_exact_join(spark):
    # with a well-sized filter, disjoint batch keys must be routed around
    # the exact join: the verified-candidate side should be (nearly) empty.
    from re_data_pipeline_spark.operators.membership import _bit_position

    batch = _keys(spark, 2000, prefix="new")
    corpus = _keys(spark, 2000, prefix="old").select("key")
    bm = bloom_bitmap(corpus, "key", m_bits=1 << 16, k=4)
    key = F.col("key")
    probe = batch
    for i in range(4):
        pos = _bit_position(key, i, 1 << 16)
        probe = probe.withColumn(f"__w{i}", (pos / 64).cast("long")).withColumn(
            f"__m{i}",
            F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")),
        )
        probe = probe.join(
            F.broadcast(bm.select(F.col("word_idx").alias(f"__w{i}"), F.col("word").alias(f"__word{i}"))),
            f"__w{i}",
            "left",
        ).withColumn(
            f"__hit{i}",
            F.coalesce(F.col(f"__word{i}").bitwiseAND(F.col(f"__m{i}")) != 0, F.lit(False)),
        )
    all_hit = F.lit(True)
    for i in range(4):
        all_hit = all_hit & F.col(f"__hit{i}")
    fp = probe.where(all_hit).count()
    # expected fpp at this load is ~(1 - e^{-k n / m})^k  ~= 0.05% -> a
    # couple of rows at most out of 2000
    assert fp < 40
