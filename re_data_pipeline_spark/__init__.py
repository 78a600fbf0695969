"""re_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL system (jamesAmckinnon/RE_Data_Pipeline — Airflow + pandas +
geopandas + Postgres + Pinecone), re-expressed idiomatically on Spark
DataFrames / Spark SQL so that Catalyst + Tungsten + AQE pick the physical
plan.  See SURVEY.md for the operator inventory this package implements.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``catalog``    — table registry over parquet test data / fixtures
- ``functions``  — scalar/array expression library (cleaning, text, vectors, geo)
- ``operators``  — composite relational operators (upsert, dedup, similarity,
                   chunking, spatial joins, grid aggregation, profiling,
                   event-time windows)
- ``sources``    — readers (JSON glob union scan, parquet, binary) mirroring
                   the reference's GCS-staged exchange format
- ``plans``      — end-to-end pipelines mirroring the reference DAGs
- ``streaming``  — Structured Streaming variants of the incremental semantics
- ``llm``        — pluggable batched LLM/embedding operator harness (mockable)
"""

from re_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
