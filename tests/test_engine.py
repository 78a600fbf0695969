"""Engine facade: table registry, SQL, named queries, pipelines."""

import pytest

from re_data_pipeline_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_tables_and_sql(engine):
    assert "lineitem" in engine.tables()
    assert engine.table("region").count() > 0
    n = engine.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n == engine.table("lineitem").count()


def test_named_query(engine):
    assert "q01_pricing_summary" in engine.queries()
    df = engine.query("q01_pricing_summary")
    assert df.count() > 0 and "sum_qty" in df.columns


def test_pipeline_dispatch(engine, spark):
    from re_data_pipeline_spark.plans import fixtures as fx

    out = engine.run_pipeline("rental_rates", raw_buildings=fx.raw_liv_buildings(spark))
    assert out["avg_rent_listings"].count() > 0
    with pytest.raises(KeyError):
        engine.run_pipeline("nope")


def test_profile_and_dedup(engine, spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c"), (3, None)], ["doc_id", "text"])
    prof = engine.profile(df).collect()[0]
    assert prof.text == pytest.approx(200 / 3)
    survivors = engine.dedup(df.where("text IS NOT NULL"))
    assert sorted(r.doc_id for r in survivors.collect()) == [1]


def test_release_frees_anchor_caches(engine, spark):
    """r15: exact_substring_* attach the persisted anchor table as
    `_anchor_cache` (or a list under `_anchor_caches`) — Engine.release
    must free those alongside the spine handles, or long-lived sessions
    pin one anchor frame per span-dedup call."""
    from tests.conftest import persistent_ids

    spark.catalog.clearCache()
    before = persistent_ids(spark)
    out = spark.range(3)
    single = spark.range(10).persist()
    listed = spark.range(20).persist()
    single.count(); listed.count()
    out._anchor_cache = single
    out._anchor_caches = [listed]
    assert len(persistent_ids(spark) - before) == 2
    assert engine.release(out) == 2
    assert not (persistent_ids(spark) - before)


def test_release_handles_covers_every_handle_attr(spark):
    """r16: the handle-attribute set is ONE shared constant
    (`ids.HANDLE_ATTRS` + `release_handles`) — every listed attribute,
    the `_anchor_caches` list, and the spine handle must all release."""
    from tests.conftest import persistent_ids

    from re_data_pipeline_spark.operators.ids import HANDLE_ATTRS, release_handles

    spark.catalog.clearCache()
    before = persistent_ids(spark)
    out = spark.range(3)
    n_expected = 0
    for i, attr in enumerate(HANDLE_ATTRS):
        h = spark.range(5 + i).persist()
        h.count()
        setattr(out, attr, h)
        n_expected += 1
    listed = spark.range(20).persist()
    listed.count()
    out._anchor_caches = [listed]
    spine = spark.range(30).persist()
    spine.count()
    out._ordinal_cache = spine
    n_expected += 2
    assert len(persistent_ids(spark) - before) == n_expected
    assert release_handles(out) == n_expected
    assert not (persistent_ids(spark) - before)


def test_engine_release_and_leak_audit_share_one_path(engine, spark, monkeypatch):
    """r16 ADVICE: tools/leak_audit.release_all used to hand-copy
    Engine.release's attribute list, so the auditor could silently
    diverge from the release contract it asserts.  Both must now route
    through the SAME `ids.release_handles` function."""
    import importlib.util
    import os

    import re_data_pipeline_spark.operators.ids as ids

    calls = []
    real = ids.release_handles

    def spy(df, blocking=False):
        calls.append(1)
        return real(df, blocking)

    monkeypatch.setattr(ids, "release_handles", spy)
    engine.release(spark.range(1))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "leak_audit_under_test", os.path.join(repo, "tools", "leak_audit.py")
    )
    la = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(la)
    la.release_all(spark.range(1), spark)
    assert len(calls) == 2, "Engine.release and leak_audit.release_all must both delegate to ids.release_handles"
