"""Count-min and HLL sketch operators (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from re_data_pipeline_spark.operators.sketches import (
    countmin_build,
    countmin_query,
    hll_estimate,
    hll_registers,
)


def test_cms_overestimates_never_under(spark):
    items = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 10 + [("c",)] * 1, "item string"
    )
    sk = countmin_build(items, "item", depth=3, width=64)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "item string")
    est = {r.item: r.est for r in countmin_query(sk, probes, "item", 3, 64).collect()}
    assert est["a"] >= 50 and est["b"] >= 10 and est["c"] >= 1
    assert est["zzz"] >= 0  # absent item: pure collision mass


def test_cms_merge_equals_combined_build(spark):
    d1 = spark.createDataFrame([("x",)] * 7 + [("y",)] * 2, "item string")
    d2 = spark.createDataFrame([("x",)] * 3 + [("z",)] * 5, "item string")
    merged = (
        countmin_build(d1, "item").unionByName(countmin_build(d2, "item"))
        .groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    )
    combined = countmin_build(d1.unionByName(d2), "item")
    a = {(r.row, r.bucket): r.c for r in merged.collect()}
    b = {(r.row, r.bucket): r.c for r in combined.collect()}
    assert a == b


def test_hll_estimate_within_expected_error(spark):
    n = 5000
    items = spark.range(n).select(F.concat(F.lit("it"), F.col("id")).alias("item"))
    regs = hll_registers(items, "item", m=256)
    est = hll_estimate(regs, m=256).collect()[0].estimate
    # standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(float(est) - n) / n < 0.20


def test_hll_merge_is_register_max(spark):
    d1 = spark.range(100).select(F.concat(F.lit("a"), F.col("id")).alias("item"))
    d2 = spark.range(50, 200).select(F.concat(F.lit("a"), F.col("id")).alias("item"))
    merged = (
        hll_registers(d1, "item").unionByName(hll_registers(d2, "item"))
        .groupBy("bucket").agg(F.max("register").alias("register"))
    )
    combined = hll_registers(d1.unionByName(d2).distinct(), "item")
    a = {r.bucket: r.register for r in merged.collect()}
    b = {r.bucket: r.register for r in combined.collect()}
    assert a == b


def test_hll_small_range_linear_counting(spark):
    items = spark.createDataFrame([(f"v{i}",) for i in range(20)], "item string")
    est = hll_estimate(hll_registers(items, "item", m=256), m=256).collect()[0]
    # tiny cardinality -> linear-counting branch; should be close to 20
    assert est.zero_registers > 200
    assert abs(float(est.estimate) - 20) < 5
