"""S12 JDBC scan exercised end-to-end against embedded Derby (bundled with
Spark's distribution — no external service): write, plain read, and a
predicate-partitioned read (each predicate becomes one JDBC partition /
executor-side WHERE clause — the JDBC analogue of pushdown)."""

from pyspark.sql import functions as F

URL = "jdbc:derby:memory:s12db;create=true"
PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_jdbc_round_trip_and_partitioned_read(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 17).cast("long").alias("v")
    )
    df.write.jdbc(URL, "s12_t", mode="overwrite", properties=PROPS)

    back = spark.read.jdbc(URL, "s12_t", properties=PROPS)
    assert back.count() == 100
    assert {r.v for r in back.where(F.col("id") == 5).collect()} == {15 % 17}

    # predicates=[...] → one partition per clause, filter runs in the DB
    # (clauses are passed to the DB verbatim — Derby folds unquoted
    # identifiers to upper case, so quote them as written)
    parts = spark.read.jdbc(
        URL, "s12_t", properties=PROPS, predicates=['"id" < 50', '"id" >= 50']
    )
    assert parts.rdd.getNumPartitions() == 2
    assert parts.count() == 100

    # column/filter pushdown through the JDBC relation
    pushed = spark.read.jdbc(URL, "s12_t", properties=PROPS).where(
        F.col("id") >= 90
    ).select("v")
    assert pushed.count() == 10
