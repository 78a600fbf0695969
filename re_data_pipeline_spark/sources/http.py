"""Predicate-templated HTTP source wrapper (SURVEY §2.1 S6/S7, §4 O1).

The reference pushes filters to open-data HTTP APIs two ways:

- Socrata client params: ``client.get_all("24uj-dj8v", where="issue_date >=
  '…'", order="issue_date DESC")`` (``get_edm_building_permits.py:129-135``);
- raw SoQL URLs: ``…?$limit=10000&$where=status IN ('In Review') OR (…)``
  (``get_edm_rezoning_data.py:52-74``).

``HttpPredicateSource`` is the engine-side wrapper: the caller states the
filter as an ordinary **Column predicate** and the wrapper renders it to the
request's ``where``/``$where`` text — pushdown to the server, the HTTP
analogue of parquet ``PushedFilters``.  Rendering goes through Catalyst
itself (analyze a Filter over an empty frame with the source schema, take
``condition().sql()``), so operator spelling, quoting, and IN-lists are
exactly Spark's SQL dialect — the subset used (comparisons, AND/OR/NOT,
IN, LIKE, IS NULL) is valid SoQL.

Transport is an injectable ``fetcher(params) -> list[dict]`` — a mock in
tests/sandbox (no network in-engine; the reference's Selenium/requests edge
stays out-of-engine per SURVEY §2.1), ``requests``-based in production.
Ingestion is driver-side by design: open-data endpoints are KB-MB scale
control-plane inputs; the 100 TB path is the parquet/lakehouse scan, and
rows land in a DataFrame with an explicit schema immediately (S8 rule).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StructType

Fetcher = Callable[[dict], list[dict]]


def with_retries(
    fetcher: Fetcher,
    max_attempts: int = 3,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> Fetcher:
    """Exponential-backoff retry wrapper for any ``Fetcher`` (O7).

    Mirrors the reference's hand-rolled loop — ``max_retries=3`` with
    ``time.sleep(2 ** attempt)`` and re-raise on the last attempt
    (``get_edm_council_transcripts.py:200-249``) — as a composable transport
    decorator: ``HttpPredicateSource(spark, with_retries(fetch), schema)``.
    Delay for attempt *n* (0-based) is ``min(base_delay * 2**n, max_delay)``.
    ``sleep`` is injectable so tests run instantly.
    """
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")

    def fetch(params: dict) -> list[dict]:
        for attempt in range(max_attempts):
            try:
                return fetcher(params)
            except retry_on:
                if attempt == max_attempts - 1:
                    raise
                sleep(min(base_delay * (2.0**attempt), max_delay))
        raise AssertionError("unreachable")  # pragma: no cover

    return fetch


class RateLimiter:
    """Token-bucket rate limiter — the engine-level version of the
    reference's fixed ``time.sleep(0.02)`` between geocode calls
    (``get_edm_building_permits.py:179``).

    ``rate`` requests/second sustained, up to ``burst`` back-to-back.  One
    instance per executor task (created inside the task, never serialized),
    so a cluster-wide cap is ``rate × tasks`` — set ``rate`` accordingly.
    ``clock``/``sleep`` are injectable for deterministic tests.
    """

    def __init__(
        self,
        rate: float,
        burst: int = 1,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        if rate <= 0:
            raise ValueError("rate must be > 0")
        self.rate = float(rate)
        self.capacity = float(max(1, burst))
        self.tokens = self.capacity
        self.clock = clock
        self.sleep = sleep
        self.last = clock()

    def acquire(self) -> None:
        """Block until one token is available, then consume it."""
        now = self.clock()
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now
        if self.tokens < 1.0:
            wait = (1.0 - self.tokens) / self.rate
            self.sleep(wait)
            self.tokens = 1.0
            self.last = self.clock()
        self.tokens -= 1.0

_STYLES = {
    "socrata": {"where": "where", "order": "order", "limit": "limit", "offset": "offset"},
    "soql": {"where": "$where", "order": "$order", "limit": "$limit", "offset": "$offset"},
    # WordPress REST (S3): no SQL predicate surface — filtering is query
    # params (``status=publish``) and paging is page-number (``page``/
    # ``per_page``), not offset.  ``where``/``order`` render as plain params
    # only if explicitly passed (WP ``orderby`` exists; predicates don't).
    "wp": {"where": "search", "order": "orderby", "limit": "per_page", "offset": "page"},
}


def render_predicate(spark: SparkSession, schema: StructType | str, pred: Column | str) -> str:
    """Render a Column predicate to the SQL/SoQL text the server will run.

    Catalyst does the work: the predicate is analyzed as a Filter over an
    empty frame carrying the source schema (so column resolution and type
    checks happen HERE, not as a 400 from the server), and the analyzed
    condition is printed with ``Expression.sql()``.
    """
    if isinstance(pred, str):
        return pred
    probe = spark.createDataFrame([], schema).where(pred)
    return probe._jdf.queryExecution().analyzed().condition().sql()


class HttpPredicateSource:
    """A filter-pushing HTTP tabular source with an injectable transport.

    Parameters
    ----------
    spark: session used to build the output DataFrame.
    fetcher: ``fetcher(params: dict) -> list[dict]`` — performs one request
        and returns decoded JSON rows.  Injected: tests pass a mock (e.g.
        ``duckdb_table_fetcher``), production passes a requests/Socrata
        adapter.
    schema: explicit output schema (DDL string or StructType) — mandatory,
        like every ingestion path in this engine (no sampled inference).
    param_style: ``"socrata"`` (``where=``/``order=``) or ``"soql"``
        (``$where=``/``$order=``).
    """

    def __init__(
        self,
        spark: SparkSession,
        fetcher: Fetcher,
        schema: StructType | str,
        param_style: str = "socrata",
        extra_params: dict | None = None,
        page_style: str = "offset",
    ):
        if param_style not in _STYLES:
            raise ValueError(f"param_style must be one of {sorted(_STYLES)}")
        if page_style not in ("offset", "page"):
            raise ValueError("page_style must be 'offset' or 'page'")
        self.spark = spark
        self.fetcher = fetcher
        self.schema = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
        self.keys = _STYLES[param_style]
        # constant query params sent with EVERY request — the WP
        # ``status=publish`` / ajax ``action=...`` carrier; server-side
        # filtering that isn't predicate-shaped
        self.extra_params = dict(extra_params or {})
        # "offset" = Socrata get_all loop; "page" = WP page-number paging
        # (page counter starts at 1 and the offset key carries the page)
        self.page_style = page_style

    def render_params(
        self,
        where: Column | str | None = None,
        order: str | None = None,
        limit: int | None = None,
        offset: int | None = None,
    ) -> dict:
        """The exact request params for one page — exposed for tests to
        assert the pushed predicate text."""
        params: dict = dict(self.extra_params)
        if where is not None:
            params[self.keys["where"]] = render_predicate(self.spark, self.schema, where)
        if order is not None:
            params[self.keys["order"]] = order
        if limit is not None:
            params[self.keys["limit"]] = int(limit)
        if offset is not None:
            params[self.keys["offset"]] = int(offset)
        return params

    def load(
        self,
        where: Column | str | None = None,
        order: str | None = None,
        limit: int | None = None,
        page_size: int | None = None,
    ) -> DataFrame:
        """Fetch (paged when ``page_size`` is set — offset pagination, the
        reference's ``get_all`` loop) and return a DataFrame with the
        declared schema.  Missing keys in a row become NULL; unknown keys
        are dropped (schema-list projection, P3)."""
        names = [f.name for f in self.schema.fields]
        rows: list[dict] = []
        if page_size is None:
            rows = self.fetcher(self.render_params(where, order, limit))
        else:
            cursor = 0 if self.page_style == "offset" else 1
            while True:
                page = self.fetcher(
                    self.render_params(where, order, page_size, cursor)
                )
                rows.extend(page)
                if len(page) < page_size:
                    break
                if limit is not None and len(rows) >= limit:
                    break
                cursor += page_size if self.page_style == "offset" else 1
            # truncate OUTSIDE the loop: the short-final-page break used to
            # skip it, returning more rows than `limit` whenever the last
            # page was short (80 server rows, page_size=100, limit=50 → 80)
            if limit is not None:
                rows = rows[:limit]
        data = [tuple(r.get(n) for n in names) for r in rows]
        return self.spark.createDataFrame(data, self.schema)


def duckdb_table_fetcher(table_sql: str, param_style: str = "socrata") -> Fetcher:
    """Mock open-data server for tests: serves rows of the DuckDB relation
    ``table_sql`` and — critically — APPLIES the rendered ``where``/
    ``order``/``limit``/``offset`` params server-side, proving the predicate
    text the wrapper pushes is well-formed and filter-complete."""
    keys = _STYLES[param_style]

    def fetch(params: dict) -> list[dict]:
        import duckdb

        q = f"SELECT * FROM ({table_sql})"
        if keys["where"] in params:
            q += f" WHERE {params[keys['where']]}"
        if keys["order"] in params:
            q += f" ORDER BY {params[keys['order']]}"
        if keys["limit"] in params:
            q += f" LIMIT {params[keys['limit']]}"
        if keys["offset"] in params:
            q += f" OFFSET {params[keys['offset']]}"
        con = duckdb.connect()
        try:
            cur = con.execute(q)
            cols = [d[0] for d in cur.description]
            return [dict(zip(cols, row)) for row in cur.fetchall()]
        finally:
            con.close()

    return fetch
