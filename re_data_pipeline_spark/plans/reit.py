"""REIT financial-report metric extraction (SURVEY §3 remaining entry point:
S10 → O8 → X4, ``REIT_metrics.py``).

Reference flow: PDF bytes → per-page text → single-pass keyword
classification tagging each page for all 10 metrics at once (O8,
``REIT_metrics.py:185-198``) → per-(report, metric) sub-document → LLM
extraction with a "Not Available" fallback (``:241-243,325``).

Engine flow (scale-shaped):

1. pages arrive as rows (``report_name, page_num, page_text``) — from
   ``binaryFile`` + a text-extraction pandas UDF in production, from a
   fixture here;
2. **one projection** computes every metric's match flag (one scan for all
   metrics — the reference's O8 optimization, preserved in query shape);
3. explode matched metric tags → group pages per (report, metric), pages
   ordered by page number;
4. batched mock-LLM extraction (X4) per (report, metric) group;
5. pivot to the wide ``report_metrics`` row with 'Not Available' filling
   metrics that matched no page — the fallback is data, not control flow.

The cheap keyword filter runs *before* the expensive LLM stage (O4) by
construction: the explode only emits matched (report, metric) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from re_data_pipeline_spark.llm.harness import llm_map

# key_terms per metric — mirrors the reference's metrics_dict
# (``REIT_metrics.py:109-170``).
METRICS: dict[str, list[str]] = {
    "debt_balance": ["debt", "liabilities"],
    "net_income": ["net income", "net operating income", "noi"],
    "funds_from_operations": ["funds from operations", "ffo"],
    "adjusted_funds_from_operations": ["adjusted funds", "affo"],
    "net_asset_value": ["net asset value", "nav"],
    "ebitda": ["ebitda"],
    "occupancy_rate": ["occupancy"],
    "same_property_noi": ["same property", "same asset"],
    "investment_in_acquisitions": ["acquisitions"],
    "investment_in_development": ["development"],
}

NOT_AVAILABLE = "Not Available"


def classify_pages(pages: DataFrame, text_col: str = "page_text") -> DataFrame:
    """O8 single-pass classification: one row per (report, page, matched
    metric).  All metric flags come from ONE projection over the text."""
    low = F.lower(F.col(text_col))
    tags = F.array_compact(
        F.array(
            *[
                F.when(
                    F.lit(False) | _any_term(low, terms), F.lit(metric)
                ).otherwise(F.lit(None))
                for metric, terms in METRICS.items()
            ]
        )
    )
    return pages.withColumn("metric", F.explode(tags))


def _any_term(low_text: F.Column, terms: list[str]) -> F.Column:
    cond = F.lit(False)
    for t in terms:
        cond = cond | low_text.contains(t.lower())
    return cond


def reit_metrics_pipeline(
    spark: SparkSession, pages: DataFrame, client_factory=None
) -> DataFrame:
    """pages(report_name, page_num, page_text) → one wide row per report with
    all 10 metric columns ('Not Available' where nothing matched)."""
    tagged = classify_pages(pages)
    grouped = (
        tagged.groupBy("report_name", "metric")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("page_num"), F.col("page_text")))
                    ),
                    lambda s: s["page_text"],
                ),
                "\n",
            ).alias("metric_pages_text")
        )
    )
    kwargs = {"client_factory": client_factory} if client_factory else {}
    extracted = llm_map(
        grouped.withColumn(
            "prompt",
            F.concat_ws(
                "\n",
                F.concat(F.lit("Extract metric: "), F.col("metric")),
                F.col("metric_pages_text"),
            ),
        ),
        "prompt",
        "llm_output",
        **kwargs,
    ).select(
        "report_name",
        "metric",
        F.coalesce(
            F.get_json_object("llm_output", "$.summary"), F.lit(NOT_AVAILABLE)
        ).alias("value"),
    )
    wide = (
        extracted.groupBy("report_name")
        .pivot("metric", list(METRICS.keys()))
        .agg(F.first("value"))
    )
    # metrics that matched no page → 'Not Available' (reference :241-243,325)
    for m in METRICS:
        wide = wide.withColumn(m, F.coalesce(F.col(m), F.lit(NOT_AVAILABLE)))
    return wide


def reit_metrics_from_pdf_dir(
    spark: SparkSession,
    pdf_dir: str,
    extractor_factory=None,
    client_factory=None,
) -> DataFrame:
    """Production S10 entry point: binaryFile scan of ``pdf_dir`` → per-page
    text extraction (PyMuPDF by default, injectable) → the metric pipeline.
    The reference's download-open-iterate loop (``REIT_metrics.py:177-195``)
    as three composable engine stages."""
    from re_data_pipeline_spark.sources.pdf import extract_pdf_pages, pymupdf_page_extractor
    from re_data_pipeline_spark.sources.registry import read_binary_dir

    pages = extract_pdf_pages(
        read_binary_dir(spark, pdf_dir),
        extractor_factory=extractor_factory or pymupdf_page_extractor,
    )
    return reit_metrics_pipeline(spark, pages, client_factory=client_factory)


def fixture_report_pages(spark: SparkSession, n_reports: int = 6) -> DataFrame:
    """FIXTURES §11 raw_report_pages: key terms seeded into page texts; some
    reports miss some metrics entirely (the 'Not Available' path)."""
    rows = []
    metric_names = list(METRICS.keys())
    for r in range(n_reports):
        for p in range(8):
            terms = []
            for mi, m in enumerate(metric_names):
                # report r skips metric (r mod 10) entirely
                if mi == r % 10:
                    continue
                if (p + mi) % 4 == 0:
                    terms.append(METRICS[m][0])
            text = f"Report {r} page {p} discusses " + ", ".join(terms) if terms else f"Report {r} page {p} general text"
            rows.append((f"REIT-{r}", p, text))
    return spark.createDataFrame(rows, "report_name string, page_num int, page_text string")
