from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from re_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def persistent_ids(spark) -> set:
    """Persistent-RDD id SET for checkpoint-storage probes — ids, not
    counts: prior tests' leaked finals get garbage-collected asynchronously
    by Spark's ContextCleaner mid-test, so absolute counts are flaky; only
    ids NEW since a `before` snapshot belong to the operator under test.
    Shared here so the two storage-release suites can't drift apart."""
    return {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
