"""Sliding-window text chunking (SURVEY §2.6 W3, §2.10 X7).

Bit-for-bit replication of the reference's transcript chunker
(``transcripts_to_vector_db.py:194-225``, constants ``:270-272``):

- snippets sorted by integer timestamp (``:194``);
- main chunks: ``for i in range(0, len - N + 1, STRIDE)`` → window of N
  snippets every STRIDE (N=35, OVERLAP=6, STRIDE=29);
- tail chunk (``:212``): ``if len % STRIDE != 0 and (len - N) % STRIDE != 0``
  take the *last N* snippets (for len < N that is the whole list).  Python's
  modulo of a negative is non-negative → ``pmod`` in Spark, not ``%``;
- tail quirk preserved: the reference builds the main-chunk link with ``&t=``
  but the tail link with ``?t=`` (``:203`` vs ``:216``).

Set-based formulation: ``sequence`` of window starts + ``posexplode`` +
``slice`` — one narrow projection followed by an explode; no UDF, no state,
distributes trivially (each document chunks independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_DEFAULT = 35
STRIDE_DEFAULT = 29  # N - OVERLAP, OVERLAP = 6


def chunk_snippets(
    df: DataFrame,
    items_col: str = "snippets",
    n: int = N_DEFAULT,
    stride: int = STRIDE_DEFAULT,
    ts_field: str = "ts",
    text_field: str = "text",
) -> DataFrame:
    """Explode each row's array<struct<ts,text>> into chunk rows.

    Output adds: ``chunk_index`` (0-based, tail last), ``chunk_timestamp``
    (int ts of first snippet), ``chunk_text`` (space-joined snippet texts),
    ``is_tail``.  All other columns pass through.
    """
    items = F.array_sort(
        F.col(items_col),
        lambda a, b: F.when(
            a[ts_field].cast("long") < b[ts_field].cast("long"), F.lit(-1)
        )
        .when(a[ts_field].cast("long") > b[ts_field].cast("long"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    sz = F.size(items)

    main_starts = F.when(
        sz >= F.lit(n), F.sequence(F.lit(0), sz - F.lit(n), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    # sz >= 0 gate: size(NULL) = -1 in non-ANSI mode, and pmod(-1, 29) = 28
    # passes BOTH tail tests — a NULL snippets array would emit one phantom
    # all-NULL tail chunk that then flows into embedding/retrieval (r13 fix)
    has_tail = (
        (sz >= 0)
        & (F.pmod(sz, F.lit(stride)) != 0)
        & (F.pmod(sz - F.lit(n), F.lit(stride)) != 0)
    )
    tail_start = F.greatest(sz - F.lit(n), F.lit(0))
    starts = F.when(
        has_tail, F.concat(main_starts, F.array(tail_start))
    ).otherwise(main_starts)
    n_main = F.size(main_starts)

    out = (
        df.withColumn("__items", items)
        .withColumn("__starts", starts)
        .withColumn("__nmain", n_main)
        .select(
            "*", F.posexplode("__starts").alias("chunk_index", "__start")
        )
        .withColumn("__chunk", F.slice(F.col("__items"), F.col("__start") + 1, n))
        .withColumn("is_tail", F.col("chunk_index") >= F.col("__nmain"))
        .withColumn(
            "chunk_timestamp",
            F.element_at(F.col("__chunk"), 1)[ts_field].cast("long"),
        )
        .withColumn(
            "chunk_text",
            F.array_join(
                F.transform(F.col("__chunk"), lambda x: x[text_field]), " "
            ),
        )
        .drop("__items", "__starts", "__start", "__chunk", "__nmain")
    )
    return out


def timestamped_link(video_url_col: str, df: DataFrame) -> DataFrame:
    """Reference link format: ``{url}&t={ts}s`` for main chunks,
    ``{url}?t={ts}`` for the tail (``transcripts_to_vector_db.py:203,216``)."""
    return df.withColumn(
        "timestamped_youtube_link",
        F.when(
            F.col("is_tail"),
            F.format_string("%s?t=%d", F.col(video_url_col), F.col("chunk_timestamp")),
        ).otherwise(
            F.format_string("%s&t=%ds", F.col(video_url_col), F.col("chunk_timestamp"))
        ),
    )
