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
