"""As-of join edge semantics: inclusive equal-timestamp match, no-prior-match
nulls, per-key isolation."""

import datetime as dt

from re_data_pipeline_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", _t(10), "a"), ("u1", _t(30), "b"), ("u1", _t(5), "c"),
         ("u2", _t(10), "d")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [("u1", _t(10), 1.0), ("u1", _t(20), 2.0), ("u2", _t(50), 9.0)],
        ["k", "ts", "v"],
    )
    got = {r.tag: (r.v_asof, r.ts_asof) for r in asof_join(left, right, ["k"], "ts").collect()}
    assert got["a"] == (1.0, _t(10))   # equal ts matches (inclusive)
    assert got["b"] == (2.0, _t(20))   # latest prior
    assert got["c"] == (None, None)    # nothing at/before 0:05
    assert got["d"] == (None, None)    # u2's only view is later; keys isolated


def test_asof_join_null_payload_stays_atomic(spark):
    """A NULL payload value in the matched right row must come through as
    NULL — not be backfilled from an OLDER right row (which could also mix
    columns from different rows).  DuckDB ASOF semantics: the whole matched
    row, NULLs intact."""
    left = spark.createDataFrame([("k", 10)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 1, 5.0, None), ("k", 2, None, 7.0)],
        "k string, ts long, a double, b double",
    )
    row = asof_join(left, right, ["k"], "ts").collect()[0]
    assert row["ts_asof"] == 2
    assert row["a_asof"] is None  # matched row's NULL, not ts=1's 5.0
    assert row["b_asof"] == 7.0


def test_asof_join_right_table_with_left_ts_named_column(spark):
    """right_ts_col != ts_col plus a right column literally named ts_col
    must not alias-collide (the column is excluded from default payload)."""
    from re_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "key long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 999, 2.5)], "key long, event_ts long, ts long, price double"
    )
    out = asof_join(left, right, ["key"], "ts", right_ts_col="event_ts")
    row = out.collect()[0]
    assert row["price_asof"] == 2.5 and row["ts_asof"] == 5
    assert "ts" in out.columns  # left's own ts unharmed


def test_interval_lookup_exact_and_nulls(spark):
    from re_data_pipeline_spark.operators.asof import interval_lookup

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 99.9), (3, 100.0), (4, 250.0), (5, -3.0)],
        "fid long, v double",
    )
    iv = spark.createDataFrame(
        [(0.0, 100.0, "a"), (100.0, 200.0, "b")],
        "lo double, hi double, name string",
    )
    out = {r.fid: r.name for r in
           interval_lookup(facts, iv, "v", "lo", "hi", bucket_size=50.0).collect()}
    assert out[1] == "a" and out[2] == "a"
    assert out[3] == "b"          # boundary: [lo, hi) half-open
    assert out[4] is None and out[5] is None


def test_interval_lookup_preserves_duplicate_rows(spark):
    from re_data_pipeline_spark.operators.asof import interval_lookup

    facts = spark.createDataFrame([(1, 5.0), (1, 5.0)], "fid long, v double")
    iv = spark.createDataFrame([(0.0, 10.0, "a")], "lo double, hi double, name string")
    out = interval_lookup(facts, iv, "v", "lo", "hi", bucket_size=10.0)
    assert out.count() == 2
