"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()`` exposes the operator-inventory conformance suite (one entry per
implemented SURVEY §2 operator / north-star extension); ``oracle_sql()`` maps
each to the DuckDB SQL the driver hash-compares at sf0.01.  Implementations
live in ``re_data_pipeline_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from re_data_pipeline_spark.plans.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's verification window covers every §2 family and every headline
    extension (see ``plans.queries.DRIVER_WINDOW``)."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for rows-only operators)."""
    return dict(ORACLES)
