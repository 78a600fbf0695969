"""Composite relational operators (SURVEY §2.2, §2.4-§2.7, north-star extensions).

Each operator is a function DataFrame → DataFrame built from declarative
transformations, so Catalyst sees through it (predicate pushdown, column
pruning, join planning still apply — SURVEY §4 design note).
"""

from re_data_pipeline_spark.operators.chunking import chunk_snippets
from re_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
)
from re_data_pipeline_spark.operators.similarity import cosine_topk
from re_data_pipeline_spark.operators.spatial import grid_aggregate, radius_join
from re_data_pipeline_spark.operators.upsert import anti_join_new_rows, upsert_append

__all__ = [
    "upsert_append",
    "anti_join_new_rows",
    "exact_dedup",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "grid_aggregate",
    "radius_join",
    "chunk_snippets",
]
