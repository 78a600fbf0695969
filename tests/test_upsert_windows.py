"""Upsert/archival semantics (K2-K4) + event-time windows + similarity."""

import datetime as dt

from pyspark.sql import functions as F

from re_data_pipeline_spark.operators.similarity import cosine_topk, cosine_topk_per_query
from re_data_pipeline_spark.operators.upsert import (
    anti_join_new_rows,
    delisted_rows,
    retain_active,
    upsert_append,
)
from re_data_pipeline_spark.operators.windows import session, tumbling


def test_upsert_insert_if_absent(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    batch = spark.createDataFrame([(2, "B-NEW"), (3, "c"), (3, "c-dup")], ["k", "v"])
    got = {r.k: r.v for r in upsert_append(existing, batch, ["k"]).collect()}
    # key 2 keeps the EXISTING value (ON CONFLICT DO NOTHING), key 3 inserted
    # once (batch-internal dedup)
    assert got == {1: "a", 2: "b", 3: "c"}
    assert anti_join_new_rows(batch, existing, ["k"]).count() == 1


def test_archival(spark):
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "nullkey")], ["k", "v"]
    )
    current = spark.createDataFrame([(1, "a")], ["k", "v"])
    gone = delisted_rows(existing, current, ["k"])
    assert sorted(r.k for r in gone.collect()) == [2, 3]  # null-guarded
    kept = retain_active(existing, current, ["k"])
    assert [r.k for r in kept.collect()] == [1]


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_tumbling_counts(spark):
    df = spark.createDataFrame(
        [(1, _ts(0, 10)), (2, _ts(0, 50)), (3, _ts(1, 10))], ["id", "ts"]
    )
    got = tumbling(df, "ts", "1 hour", [], [F.count("*").alias("n")]).collect()
    assert sorted(r.n for r in got) == [1, 2]


def test_session_gap_merge(spark):
    # events at 0:00, 0:20, 0:39 chain into one session (gap 30m);
    # 2:00 starts a new one
    df = spark.createDataFrame(
        [(1, _ts(0, 0)), (1, _ts(0, 20)), (1, _ts(0, 39)), (1, _ts(2, 0))],
        ["user_id", "ts"],
    )
    got = session(df, "ts", "30 minutes", ["user_id"], [F.count("*").alias("n")])
    assert sorted(r.n for r in got.collect()) == [1, 3]


def test_cosine_topk_ordering(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "id int, embedding array<float>",
    )
    got = cosine_topk(df, [1.0, 0.0], 2).collect()
    assert [r.id for r in got] == [1, 2]


def test_cosine_topk_per_query(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id int, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])], "query_id int, embedding array<float>"
    )
    got = cosine_topk_per_query(corpus, queries, 1).select("query_id", "id").collect()
    assert {(r.query_id, r.id) for r in got} == {(100, 1), (200, 2)}


def test_scd2_collapses_runs_and_closes_intervals(spark):
    from re_data_pipeline_spark.operators.maintenance import scd2_history

    rows = [
        (1, "bronze", 100), (1, "bronze", 200), (1, "gold", 300),
        (1, "gold", 400), (1, "bronze", 500),
        (2, "silver", 50),
    ]
    df = spark.createDataFrame(rows, "uid long, tier string, t long")
    h = {(r.uid, r.valid_from): (r.tier, r.valid_to)
         for r in scd2_history(df, ["uid"], ["tier"], "t").collect()}
    # user 1: bronze[100,300) -> gold[300,500) -> bronze[500,NULL)
    assert h[(1, 100)] == ("bronze", 300)
    assert h[(1, 300)] == ("gold", 500)
    assert h[(1, 500)] == ("bronze", None)
    assert (1, 200) not in h and (1, 400) not in h
    # user 2: single open interval
    assert h[(2, 50)] == ("silver", None)


def test_snapshot_diff_ops(spark):
    from re_data_pipeline_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    out = {r.k: (r.op, r.name, r.bal) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1] == ("D", "a", 10.0)   # delete carries old values
    assert out[2] == ("U", "b", 25.0)   # update carries new values
    assert out[4] == ("I", "d", 40.0)
    assert 3 not in out                  # unchanged rows filtered


def test_snapshot_diff_null_safe(spark):
    from re_data_pipeline_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert snapshot_diff(old, new, ["k"]).count() == 0  # NULL == NULL here
    new2 = spark.createDataFrame([(1, "x")], "k long, v string")
    assert snapshot_diff(old, new2, ["k"]).collect()[0].op == "U"


def test_merge_upsert_updates_and_inserts(spark):
    from re_data_pipeline_spark.operators.upsert import merge_upsert

    existing = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    batch = spark.createDataFrame(
        [(2, 99.0), (3, 30.0), (3, 25.0)], "k long, v double"
    )
    out = {r.k: r.v for r in merge_upsert(existing, batch, ["k"]).collect()}
    assert out == {1: 10.0, 2: 99.0, 3: 25.0}  # 3: min-struct dedup wins


def test_topk_tiebreak_deterministic_and_map_safe(spark):
    """r14: (a) per-query/PQ top-k tiebreaks on EVERY orderable column, so
    score ties with a non-unique first column resolve identically under any
    partitioning; (b) a map-typed metadata column no longer enters the sort
    (Spark cannot ORDER BY a map — would raise AnalysisException)."""
    from re_data_pipeline_spark.operators.similarity import (
        ann_topk_per_query,
        pq_adc_topk,
    )

    # duplicate first non-vector column ("grp"), unique trailing id,
    # identical vectors -> pure tie; plus an unorderable map column
    corpus = spark.createDataFrame(
        [("a", {"m": 1}, 2, [1.0, 0.0]), ("a", {"m": 2}, 1, [1.0, 0.0])],
        "grp string, meta map<string,int>, id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id int, embedding array<float>"
    )
    for n_parts in (1, 4):
        got = (
            cosine_topk_per_query(corpus.repartition(n_parts), queries, 1)
            .select("id")
            .collect()
        )
        assert [r.id for r in got] == [1]  # lowest id wins the tie, always

    planes = [[1.0, 0.0], [0.0, 1.0]]
    got = ann_topk_per_query(corpus, queries, 1, planes=planes).select("id").collect()
    assert [r.id for r in got] == [1]

    # brute top-k with the map column present must not raise either
    got = cosine_topk(corpus, [1.0, 0.0], 1).select("id").collect()
    assert [r.id for r in got] == [1]

    # PQ/ADC: identical codes -> tie; full-column tiebreak picks lowest id
    enc = spark.createDataFrame(
        [("a", 2, [0, 0]), ("a", 1, [0, 0])],
        "grp string, vid int, pq_codes array<int>",
    )
    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
    got = pq_adc_topk(enc, books, [0.0, 0.0, 0.0, 0.0], 1, code_col="pq_codes")
    assert [r.vid for r in got.collect()] == [1]
