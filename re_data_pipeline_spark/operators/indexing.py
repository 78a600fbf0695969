"""Inverted-index construction over a document corpus.

The retrieval-side complement of the vector indexes in
``operators/similarity``: term → sorted posting list with document
frequency, the structure behind BM25/keyword search and behind
contamination scans cheaper than q100's n-gram join when the query set
changes often (build once, probe many).

Plan shape at 100 TB:
- per-doc DISTINCT terms explode map-side (array_distinct before explode —
  the exploded stream is |doc|·|distinct terms|, never raw token count);
- document frequency is one map-combined agg on the term;
- the stop-band filter (df > max_df_fraction·N) broadcasts the 1-row corpus
  count — the classic reason NOT to index "the";
- posting lists are CAPPED BEFORE collection with a rank window partitioned
  by term (row_number ≤ max_postings), so no executor ever materializes an
  unbounded list for a hot term — the cap is the index's page size, and
  full postings for capped terms live in overflow segments in a real
  deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from re_data_pipeline_spark.functions.text import tokens


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_fraction: float = 0.5,
    max_postings: int = 1000,
) -> DataFrame:
    """Build (term, df, postings) rows; postings sorted ascending by doc id
    and truncated to ``max_postings`` (df still counts ALL matching docs).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    total = df.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    stats = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        stats.crossJoin(F.broadcast(total))
        .where(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.lit(max_df_fraction) * F.col("__n"))
        )
        .select("term", "df")
    )
    w = Window.partitionBy("term").orderBy(F.col(id_col))
    capped = (
        toks.join(kept, "term")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_postings)
    )
    return capped.groupBy("term", "df").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("postings")
    )
