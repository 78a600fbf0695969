"""Predicate-templated HTTP source (S6/S7, O1): rendered pushdown text,
param styles, offset paging, schema projection."""

from pyspark.sql import functions as F

from re_data_pipeline_spark.sources.http import (
    HttpPredicateSource,
    duckdb_table_fetcher,
    render_predicate,
)

SCHEMA = "permit_id bigint, issue_date string, status string"
TABLE = """
    SELECT i AS permit_id,
           CAST(DATE '2024-01-01' + CAST(i AS INTEGER) AS VARCHAR) AS issue_date,
           CASE i % 2 WHEN 0 THEN 'Issued' ELSE 'Pending' END AS status
    FROM range(250) t(i)
"""


def test_rendered_predicate_text(spark):
    pred = (F.col("issue_date") >= F.lit("2024-06-01")) & F.col("status").isin(
        "Issued", "Pending"
    )
    txt = render_predicate(spark, SCHEMA, pred)
    assert txt == "((issue_date >= '2024-06-01') AND (status IN ('Issued', 'Pending')))"


def test_param_styles(spark):
    fetcher = lambda params: []
    pred = F.col("status") == "Issued"
    soc = HttpPredicateSource(spark, fetcher, SCHEMA, "socrata").render_params(
        where=pred, order="issue_date DESC", limit=10
    )
    assert soc == {
        "where": "(status = 'Issued')",
        "order": "issue_date DESC",
        "limit": 10,
    }
    soql = HttpPredicateSource(spark, fetcher, SCHEMA, "soql").render_params(where=pred)
    assert soql == {"$where": "(status = 'Issued')"}


def test_paged_fetch_pushdown_and_projection(spark):
    """The mock server filters server-side; paging walks offsets until the
    short page; rows project onto the declared schema."""
    calls = []
    base = duckdb_table_fetcher(TABLE)

    def recording(params):
        calls.append(dict(params))
        return base(params)

    src = HttpPredicateSource(spark, recording, SCHEMA)
    out = src.load(
        where=F.col("status") == "Issued",
        order="permit_id",
        page_size=50,
    )
    rows = out.collect()
    assert len(rows) == 125  # 250 rows, every other one Issued
    assert all(r.status == "Issued" for r in rows)
    # pushdown text appeared in EVERY page request
    assert all(p["where"] == "(status = 'Issued')" for p in calls)
    assert [p["offset"] for p in calls] == [0, 50, 100]  # 125 -> short 3rd page? no: 50,50,25
    assert out.schema.simpleString() == (
        "struct<permit_id:bigint,issue_date:string,status:string>"
    )


def test_paged_fetch_limit_with_short_last_page(spark):
    """`limit` must hold even when the final page is SHORT: the
    short-page break used to fire before truncation, returning every
    fetched row (125 here) instead of the cap (r13 fix)."""
    src = HttpPredicateSource(spark, duckdb_table_fetcher(TABLE), SCHEMA)
    out = src.load(
        where=F.col("status") == "Issued", order="permit_id",
        page_size=100, limit=110,
    )
    assert out.count() == 110  # 125 match; page 2 is short (25 rows)
    small = src.load(
        where=F.col("status") == "Issued", order="permit_id",
        page_size=200, limit=50,
    )
    assert small.count() == 50  # single short page of 125, still capped


def test_missing_and_extra_keys(spark):
    """Rows missing a schema key get NULL; unknown server keys are dropped."""
    fetcher = lambda params: [
        {"permit_id": 1, "status": "Issued", "rogue": "x"},
        {"permit_id": 2, "issue_date": "2024-01-05", "status": "Pending"},
    ]
    out = HttpPredicateSource(spark, fetcher, SCHEMA).load().collect()
    got = {r.permit_id: (r.issue_date, r.status) for r in out}
    assert got == {1: (None, "Issued"), 2: ("2024-01-05", "Pending")}


# ---------------------------------------------------------------------------
# O7: retry/backoff + token-bucket rate limiting
# ---------------------------------------------------------------------------


def test_with_retries_fails_twice_succeeds_third(spark):
    """Reference pattern (get_edm_council_transcripts.py:200-249): retry with
    exponential backoff, succeed on a later attempt."""
    from re_data_pipeline_spark.sources.http import HttpPredicateSource, with_retries

    attempts, sleeps = [], []

    def flaky(params):
        attempts.append(dict(params))
        if len(attempts) < 3:
            raise ConnectionError("transient")
        return [{"permit_id": 9, "issue_date": "2024-02-02", "status": "Issued"}]

    fetch = with_retries(flaky, max_attempts=3, base_delay=1.0, sleep=sleeps.append)
    out = HttpPredicateSource(spark, fetch, SCHEMA).load().collect()
    assert [r.permit_id for r in out] == [9]
    assert len(attempts) == 3
    assert sleeps == [1.0, 2.0]  # base * 2**attempt, exponential


def test_with_retries_exhaustion_reraises():
    from re_data_pipeline_spark.sources.http import with_retries

    n_calls = []

    def always_down(params):
        n_calls.append(1)
        raise TimeoutError("down")

    fetch = with_retries(always_down, max_attempts=4, sleep=lambda s: None)
    try:
        fetch({})
        raise AssertionError("expected TimeoutError")
    except TimeoutError:
        pass
    assert len(n_calls) == 4


def test_with_retries_delay_capped():
    from re_data_pipeline_spark.sources.http import with_retries

    sleeps = []

    def always_down(params):
        raise ValueError("x")

    fetch = with_retries(
        always_down, max_attempts=5, base_delay=10.0, max_delay=25.0, sleep=sleeps.append
    )
    try:
        fetch({})
    except ValueError:
        pass
    assert sleeps == [10.0, 20.0, 25.0, 25.0]  # capped at max_delay


def test_rate_limiter_token_bucket():
    """Deterministic clock: burst passes untrottled, then steady-state waits
    1/rate between calls (the engine-level version of the reference's fixed
    0.02 s sleep, get_edm_building_permits.py:179)."""
    from re_data_pipeline_spark.sources.http import RateLimiter

    t = [0.0]
    waits = []

    def clock():
        return t[0]

    def sleep(s):
        waits.append(round(s, 6))
        t[0] += s

    rl = RateLimiter(rate=50.0, burst=2, clock=clock, sleep=sleep)
    rl.acquire()  # token 1 of burst
    rl.acquire()  # token 2 of burst
    rl.acquire()  # bucket empty -> waits 1/50
    rl.acquire()
    assert waits == [0.02, 0.02]


def test_rate_limiter_gates_retries():
    """The token bucket must gate every ATTEMPT, not every logical call:
    with the acquire outside the retry wrapper, a 3-attempt error burst
    consumed 1 token and blew the configured rate (round-4 verdict #6).
    Tests the production composition helper used by llm_map/embed_column."""
    from re_data_pipeline_spark.llm.harness import _rate_limited_retrying
    from re_data_pipeline_spark.sources.http import RateLimiter

    t = [0.0]
    waits = []

    def clock():
        return t[0]

    def sleep(s):
        waits.append(round(s, 6))
        t[0] += s

    rl = RateLimiter(rate=50.0, burst=1, clock=clock, sleep=sleep)
    attempts = [0]

    def flaky(_):
        attempts[0] += 1
        if attempts[0] < 3:
            raise ConnectionError("429-ish")
        return "ok"

    call = _rate_limited_retrying(flaky, rl, max_attempts=3, retry_sleep=lambda s: None)
    assert call({}) == "ok"
    assert attempts[0] == 3
    # burst token covered attempt 1; attempts 2 and 3 each waited 1/rate —
    # proof every retry went through the bucket
    assert waits == [0.02, 0.02]


def test_llm_map_retries_through_flaky_client(spark):
    """llm_map's per-task retry wrapper recovers from a client that fails
    twice then succeeds (mapInPandas path, one partition)."""
    from re_data_pipeline_spark.llm.harness import MockLLMClient, llm_map

    class FlakyClient(MockLLMClient):
        def __init__(self):
            self.calls = 0

        def complete_batch(self, prompts):
            self.calls += 1
            if self.calls < 3:
                raise ConnectionError("transient")
            return super().complete_batch(prompts)

    df = spark.createDataFrame([("a",), ("b",)], "prompt string").coalesce(1)
    out = llm_map(df, "prompt", client_factory=FlakyClient).collect()
    assert len(out) == 2 and all(r.llm_output.startswith('{"summary"') for r in out)
