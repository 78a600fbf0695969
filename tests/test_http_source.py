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


def test_missing_and_extra_keys(spark):
    """Rows missing a schema key get NULL; unknown server keys are dropped."""
    fetcher = lambda params: [
        {"permit_id": 1, "status": "Issued", "rogue": "x"},
        {"permit_id": 2, "issue_date": "2024-01-05", "status": "Pending"},
    ]
    out = HttpPredicateSource(spark, fetcher, SCHEMA).load().collect()
    got = {r.permit_id: (r.issue_date, r.status) for r in out}
    assert got == {1: (None, "Issued"), 2: ("2024-01-05", "Pending")}
