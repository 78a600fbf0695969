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


@pytest.mark.gated
@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_sink_merge_semantics(sink_path):
    """Real transactional MERGE path (CI extra `delta`): needs a
    Delta-enabled session.  Runs in a SUBPROCESS — extensions + catalog
    confs are session-start options, so a getOrCreate() in this process
    would silently return the already-active shared fixture session
    (MERGE path never exercised) and the cleanup stop() would kill that
    shared session for every later test (round-4 verdict #7)."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession

        from re_data_pipeline_spark.sinks import DeltaMergeSink

        assert SparkSession.getActiveSession() is None
        builder = (
            SparkSession.builder.appName("delta-sink-test")
            .master("local[4]")
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        )
        dspark = configure_spark_with_delta_pip(builder).getOrCreate()
        try:
            schema = {SCHEMA!r}
            sink = DeltaMergeSink(dspark, {str(sink_path)!r}, schema)
            sink.upsert(dspark.createDataFrame([(1, "a"), (2, "b")], schema), ["k"])
            sink.upsert(dspark.createDataFrame([(1, "a2"), (3, "c")], schema), ["k"])
            rows = {{tuple(r) for r in sink.read().collect()}}
            assert rows == {{(1, "a"), (2, "b"), (3, "c")}}, rows
            sink.delete_absent(dspark.createDataFrame([(1, "x")], schema), ["k"])
            rows = {{tuple(r) for r in sink.read().collect()}}
            assert rows == {{(1, "a")}}, rows
        finally:
            dspark.stop()
        print("DELTA_MERGE_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "DELTA_MERGE_OK" in proc.stdout, (
        proc.stdout,
        proc.stderr,
    )


def test_delta_sink_refuses_without_package(spark, sink_path):
    if delta_available():
        pytest.skip("delta installed; refusal path not applicable")
    with pytest.raises(ImportError, match="delta-spark not installed"):
        DeltaMergeSink(spark, sink_path, SCHEMA)


@pytest.mark.gated
@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_sink_equals_parquet_emulation(tmp_path):
    """EQUIVALENCE CONTRACT (runs whenever delta-spark is importable —
    CI extra `delta`): the SAME K2/K4 operation sequence through
    DeltaMergeSink (real transactional MERGE) and ParquetAntiJoinSink
    (the sandbox emulation) must yield identical table contents after
    EVERY step — ON-CONFLICT-DO-NOTHING keeps the incumbent row on key
    conflict (`combine_broker_listings.py:224-234`), archival delete
    removes exactly the keys absent from the current feed
    (`archive_delisted_properties.py:93-147`).  Subprocess for the same
    session-isolation reason as test_delta_sink_merge_semantics."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession

        from re_data_pipeline_spark.sinks import DeltaMergeSink, ParquetAntiJoinSink

        builder = (
            SparkSession.builder.appName("delta-equiv-test")
            .master("local[4]")
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        )
        dspark = configure_spark_with_delta_pip(builder).getOrCreate()
        try:
            schema = {SCHEMA!r}
            delta_sink = DeltaMergeSink(dspark, {str(tmp_path / "d")!r}, schema)
            pq_sink = ParquetAntiJoinSink(dspark, {str(tmp_path / "p")!r}, schema)
            # K2 upsert x2 (second batch conflicts on k=1,2 with new values,
            # brings k=4), K4 archival delete (current feed lacks k=2,4),
            # K2 re-insert of an archived key
            steps = [
                ("upsert", [(1, "a"), (2, "b"), (3, "c")]),
                ("upsert", [(1, "a2"), (2, "b2"), (4, "d")]),
                ("delete_absent", [(1, "x"), (3, "x")]),
                ("upsert", [(4, "d-back"), (3, "c2")]),
            ]
            for i, (op, rows) in enumerate(steps):
                batch = dspark.createDataFrame(rows, schema)
                getattr(delta_sink, op)(batch, ["k"])
                getattr(pq_sink, op)(batch, ["k"])
                dr = {{tuple(r) for r in delta_sink.read().collect()}}
                pr = {{tuple(r) for r in pq_sink.read().collect()}}
                assert dr == pr, (i, op, dr, pr)
            assert dr == {{(1, "a"), (3, "c"), (4, "d-back")}}, dr
        finally:
            dspark.stop()
        print("DELTA_EQUIV_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0 and "DELTA_EQUIV_OK" in proc.stdout, (
        proc.stdout,
        proc.stderr,
    )
