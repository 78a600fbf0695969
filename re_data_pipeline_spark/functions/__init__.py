"""Scalar / array / map expression library (SURVEY §2.8, §2.3).

Everything here is a *pure Column expression* built from
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python UDFs in the
hot path.  Python UDFs appear only in ``geo`` (ray-casting fallback) and the
``llm`` package, per the engine design rule "UDFs are the slow path".
"""

from re_data_pipeline_spark.functions.cleaning import (
    first_available,
    normalize_sale_or_lease,
    profile_completeness,
    safe_cast,
)
from re_data_pipeline_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from re_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "safe_cast",
    "normalize_sale_or_lease",
    "first_available",
    "profile_completeness",
    "tokens",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
