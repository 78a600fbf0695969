"""In-engine acquisition for the broker-listing sources (SURVEY §2.1 S1-S4).

The reference fetches each broker feed with bespoke requests code —
AV REST JSON (``get_AV_listings.py:20-60``), Omada's WordPress REST API
(``get_omada_listings.py:40-80``), Royal Park's admin-ajax POST endpoint
(``get_royal_park_listings.py:30-70``) — then normalizes in pandas.  Here
the fetch itself is engine-side: each source is an ``HttpPredicateSource``
with the transport injected, so paging, server-side query params, and
schema projection are part of the plan's ingestion contract rather than
ad-hoc scripts.  Tests inject mock servers that *enforce* the paging/param
protocol; production injects a requests adapter with the same signature.

The mock servers serve the deterministic payloads from ``plans.fixtures``,
so ``acquire_*(spark)`` is row-identical to ``fixtures.raw_*`` — the whole
§3.1 pipeline runs unchanged on top of either entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from re_data_pipeline_spark.plans import fixtures as fx
from re_data_pipeline_spark.sources.http import Fetcher, HttpPredicateSource

AV_PAGE_SIZE = 12
WP_PER_PAGE = 10


def offset_paged_fetcher(rows: list[dict]) -> Fetcher:
    """Mock REST server with Socrata-style ``limit``/``offset`` paging (S1).

    Slices server-side exactly like the reference's ``get_all`` loop target;
    a request without paging params returns everything.
    """

    def fetch(params: dict) -> list[dict]:
        lo = int(params.get("offset", 0))
        hi = lo + int(params["limit"]) if "limit" in params else len(rows)
        return rows[lo:hi]

    return fetch


def wp_paged_fetcher(published: list[dict], drafts: list[dict]) -> Fetcher:
    """Mock WordPress REST endpoint (S3): page-number paging (``page`` starts
    at 1, ``per_page`` sizing) and **server-side** ``status`` filtering —
    draft rows exist on the server but never cross the wire unless asked for.
    """

    def fetch(params: dict) -> list[dict]:
        pool = published + drafts
        if "status" in params:
            pool = [r for r in pool if r["status"] == params["status"]]
        page = int(params.get("page", 1))
        per = int(params.get("per_page", len(pool) or 1))
        lo = (page - 1) * per
        return pool[lo : lo + per]

    return fetch


def ajax_post_fetcher(rows: list[dict], required_action: str) -> Fetcher:
    """Mock admin-ajax POST endpoint (S4): the fetcher receives the rendered
    params as the POST **form body** and rejects requests missing the
    ``action`` field — proving the wrapper carries body params through.
    """

    def fetch(params: dict) -> list[dict]:
        if params.get("action") != required_action:
            raise ValueError(f"ajax endpoint requires action={required_action!r}")
        return rows

    return fetch


def _draft_rows(n: int = 5) -> list[dict]:
    """Server-side-only draft posts the WP mock must filter out."""
    rows = fx.omada_payload(n)
    for i, r in enumerate(rows):
        r["status"] = "draft"
        r["title"] = {"rendered": f"Draft Listing {i}"}
    return rows


def acquire_av(spark: SparkSession, fetcher: Fetcher | None = None) -> DataFrame:
    """S1: AV REST JSON scan — offset-paged GET, explicit schema."""
    fetcher = fetcher or offset_paged_fetcher(fx.av_payload())
    src = HttpPredicateSource(spark, fetcher, fx.AV_SCHEMA)
    return src.load(page_size=AV_PAGE_SIZE)


def acquire_omada(spark: SparkSession, fetcher: Fetcher | None = None) -> DataFrame:
    """S3: WordPress scan — ``status=publish`` pushed as a query param,
    page-number paging (``page``/``per_page``)."""
    fetcher = fetcher or wp_paged_fetcher(fx.omada_payload(), _draft_rows())
    src = HttpPredicateSource(
        spark,
        fetcher,
        fx.OMADA_SCHEMA,
        param_style="wp",
        extra_params={"status": "publish"},
        page_style="page",
    )
    return src.load(page_size=WP_PER_PAGE)


def acquire_royal_park(spark: SparkSession, fetcher: Fetcher | None = None) -> DataFrame:
    """S4: admin-ajax POST scan — the ``action`` form field rides on
    ``extra_params``; transport POST-ness lives in the injected fetcher."""
    fetcher = fetcher or ajax_post_fetcher(fx.royal_park_payload(), "get_listings")
    src = HttpPredicateSource(
        spark,
        fetcher,
        fx.ROYAL_PARK_SCHEMA,
        extra_params={"action": "get_listings"},
    )
    return src.load()
