"""Bucketed tables for co-located joins (scale design: pre-shuffle once at
write time, join forever without an Exchange)."""

import pytest
from pyspark.sql import functions as F

from re_data_pipeline_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Joining two tables bucketed on the join key must not plan an
    Exchange — the co-location IS the shuffle, paid once at write."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is still correct
        n = j.count()
        want = (
            load_table(spark, "/root/testdata/sf0.001", "orders")
            .join(
                load_table(spark, "/root/testdata/sf0.001", "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
