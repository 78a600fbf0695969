"""MergeSink protocol: parquet emulation semantics (idempotent upsert,
archival delete), Delta path gated on package availability."""

import shutil
import tempfile

import pytest

from re_data_pipeline_spark.sinks import (
    DeltaMergeSink,
    ParquetAntiJoinSink,
    delta_available,
    get_merge_sink,
)

SCHEMA = "k bigint, v string"


@pytest.fixture()
def sink_path():
    d = tempfile.mkdtemp(prefix="sink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(sink):
    return {(r.k, r.v) for r in sink.read().collect()}


def test_parquet_sink_upsert_is_on_conflict_do_nothing(spark, sink_path):
    sink = ParquetAntiJoinSink(spark, sink_path, SCHEMA)
    sink.upsert(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA), ["k"])
    # conflicting key 1 keeps the FIRST version; key 3 inserts
    sink.upsert(spark.createDataFrame([(1, "a2"), (3, "c")], SCHEMA), ["k"])
    assert _rows(sink) == {(1, "a"), (2, "b"), (3, "c")}
    # idempotent replay: same batch changes nothing
    sink.upsert(spark.createDataFrame([(1, "a2"), (3, "c")], SCHEMA), ["k"])
    assert _rows(sink) == {(1, "a"), (2, "b"), (3, "c")}


def test_parquet_sink_delete_absent(spark, sink_path):
    sink = ParquetAntiJoinSink(spark, sink_path, SCHEMA)
    sink.upsert(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA), ["k"])
    sink.delete_absent(spark.createDataFrame([(1, "x"), (3, "x")], SCHEMA), ["k"])
    assert _rows(sink) == {(1, "a"), (3, "c")}


def test_get_merge_sink_backend_selection(spark, sink_path):
    sink = get_merge_sink(spark, sink_path, SCHEMA)
    expected = DeltaMergeSink if delta_available() else ParquetAntiJoinSink
    assert isinstance(sink, expected)


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_sink_merge_semantics(sink_path):
    """Real transactional MERGE path (CI extra `delta`): needs a
    Delta-enabled session — extensions + catalog confs are session-start
    options, so this test provisions its own instead of using the shared
    fixture."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("delta-sink-test")
        .master("local[4]")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    dspark = configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        sink = DeltaMergeSink(dspark, sink_path, SCHEMA)
        sink.upsert(dspark.createDataFrame([(1, "a"), (2, "b")], SCHEMA), ["k"])
        sink.upsert(dspark.createDataFrame([(1, "a2"), (3, "c")], SCHEMA), ["k"])
        assert _rows(sink) == {(1, "a"), (2, "b"), (3, "c")}
        sink.delete_absent(dspark.createDataFrame([(1, "x")], SCHEMA), ["k"])
        assert _rows(sink) == {(1, "a")}
    finally:
        dspark.stop()


def test_delta_sink_refuses_without_package(spark, sink_path):
    if delta_available():
        pytest.skip("delta installed; refusal path not applicable")
    with pytest.raises(ImportError, match="delta-spark not installed"):
        DeltaMergeSink(spark, sink_path, SCHEMA)
