"""End-to-end pipeline traces (SURVEY §3.1-3.3) over FIXTURES.md fixtures."""

from pyspark.sql import functions as F

from re_data_pipeline_spark.plans import fixtures as fx
from re_data_pipeline_spark.plans.pipelines import (
    explode_liv_buildings,
    property_listings_pipeline,
    rental_rates_pipeline,
    transcripts_pipeline,
)


def test_property_listings_pipeline(spark):
    out = property_listings_pipeline(
        spark,
        fx.raw_av_listings(spark),
        fx.raw_omada_listings(spark),
        fx.raw_royal_park_listings(spark),
        fx.osm_pois(spark),
        fx.zone_polygons(spark),
    )
    combined = out["combined"].collect()
    assert len(combined) > 50
    # city/status filters applied (P1): no Calgary, no closed
    srcs = {r.source for r in combined}
    assert srcs == {"av", "omada", "royal_park"}
    # sale_or_lease normalized to the canonical vocabulary
    vocab = {r.sale_or_lease for r in combined}
    assert vocab <= {"sale", "lease", "sublease", "sale_or_lease", ""}
    # zoning enrichment fills or defaults
    assert all(r.zoning is not None for r in combined)
    # empty existing table → upsert inserts everything exactly once
    assert out["upserted"].count() == len(combined)
    assert out["delisted"].count() == 0


def test_property_listings_upsert_idempotent(spark):
    args = (
        fx.raw_av_listings(spark),
        fx.raw_omada_listings(spark),
        fx.raw_royal_park_listings(spark),
        fx.osm_pois(spark),
        fx.zone_polygons(spark),
    )
    first = property_listings_pipeline(spark, *args)["upserted"]
    second = property_listings_pipeline(spark, *args, existing=first)
    # re-running the same batch inserts nothing and delists nothing (K2)
    assert second["upserted"].count() == first.count()
    assert second["delisted"].count() == 0


def test_explode_liv_buildings(spark):
    raw = fx.raw_liv_buildings(spark)
    units = explode_liv_buildings(raw)
    want = raw.select(F.sum(F.size("listings"))).collect()[0][0]
    assert units.count() == want
    assert "building_name" in units.columns and "rental_rate" in units.columns


def test_rental_rates_grid_matches_pandas(spark):
    """Grid stats must equal a pandas groupby replica (ddof=1 std, n==1→0,
    N/A rates dropped) — the reference's aggregation semantics."""
    out = rental_rates_pipeline(spark, fx.raw_liv_buildings(spark))
    got = {
        (r.grid_coordinates, r.bedrooms): (
            round(r.avg_rental_rate, 6),
            r.num_properties,
            round(r.standard_deviation, 6),
        )
        for r in out["avg_rent_listings"].collect()
    }

    import pandas as pd

    units = out["upserted"].toPandas()
    units["rate"] = pd.to_numeric(units["rental_rate"], errors="coerce")
    units = units.dropna(subset=["rate"])
    units["cx"] = ((units["x"] - fx.GRID_ORIGIN_X) // fx.CELL_SIZE).astype(int)
    units["cy"] = ((units["y"] - fx.GRID_ORIGIN_Y) // fx.CELL_SIZE).astype(int)
    want = {}
    for (cx, cy, bed), g in units.groupby(["cx", "cy", "bedrooms"]):
        x0 = cx * fx.CELL_SIZE + fx.GRID_ORIGIN_X
        y0 = cy * fx.CELL_SIZE + fx.GRID_ORIGIN_Y
        ring = [
            (x0, y0), (x0 + fx.CELL_SIZE, y0), (x0 + fx.CELL_SIZE, y0 + fx.CELL_SIZE),
            (x0, y0 + fx.CELL_SIZE), (x0, y0),
        ]
        std = g["rate"].std() if len(g) > 1 else 0.0
        want[(str(list(ring)), bed)] = (
            round(g["rate"].mean(), 6),
            len(g),
            round(0.0 if pd.isna(std) else std, 6),
        )
    assert got == want and len(got) > 5


def test_transcripts_pipeline(spark):
    tr = fx.council_transcripts(spark)
    out = transcripts_pipeline(spark, tr)
    chunks = out["chunks"].collect()
    # transcript 0 is already vectorized → excluded (P15); snippet counts
    # {29} produce zero chunks; the rest produce ≥1
    ids = {r.council_transcript_id for r in chunks}
    assert 0 not in ids and 1 not in ids  # id 1 has 29 snippets → no chunks
    assert {2, 3, 4, 5, 6} <= ids
    # chunk ids unique, embeddings present with right dim
    assert len({r.chunk_id for r in chunks}) == len(chunks)
    assert all(len(r.embedding) == 16 for r in chunks)
    # retrieval respects the meeting-epoch metadata filter
    retr = out["retrieved"].collect()
    assert all(r.start_time_epoch == r.query_epoch for r in retr)
    # summaries exist for every meeting that had chunks
    summ = {r.council_transcript_id for r in out["summaries"].collect()}
    assert summ == ids
    # state flags flipped (I2)
    assert out["transcripts_updated"].where(F.col("vectorized") == 0).count() == 0
    # ...but summarized flips ONLY for transcripts summarized THIS run:
    # transcript 0 arrived (vectorized=1, summarized=0) — a prior run
    # vectorized it and the summary step failed — and this run's pending
    # set excludes it, so flipping its flag would permanently lose the
    # summary to the next incremental run (r13 fix)
    still_pending = {
        r.council_transcript_id
        for r in out["transcripts_updated"].where(F.col("summarized") == 0).collect()
    }
    assert still_pending == {0}


def test_transcripts_pipeline_ann_routing_and_recall(spark):
    """ann_threshold routes retrieval through the SRP-bucketed path; recall
    vs the exact path stays ≥0.9 on the fixture, and summaries stay
    rank-ordered-deterministic on the exact path."""
    tr = fx.council_transcripts(spark)
    exact = transcripts_pipeline(spark, tr)
    ann = transcripts_pipeline(spark, tr, ann_threshold=1, ann_planes=1)
    key = lambda r: (r.query_id, r.chunk_id)
    e = {key(r) for r in exact["retrieved"].collect()}
    a = {key(r) for r in ann["retrieved"].collect()}
    assert len(a & e) / len(e) >= 0.9
    # plan switch is real: a high threshold keeps the exact path
    off = transcripts_pipeline(spark, tr, ann_threshold=10**9)
    o = {key(r) for r in off["retrieved"].collect()}
    assert o == e
    # context ordering determinism: two runs of the exact path give
    # identical summaries
    s1 = sorted((r.council_transcript_id, r.summary) for r in exact["summaries"].collect())
    s2 = sorted(
        (r.council_transcript_id, r.summary)
        for r in transcripts_pipeline(spark, tr)["summaries"].collect()
    )
    assert s1 == s2


def test_transcripts_pipeline_hint_skips_count_scan(spark, monkeypatch):
    """With chunk_count_hint provided, routing must NOT run the eager
    count() job (round-4 verdict #5: a full select/explode/chunk/dedup scan
    before any useful work at 100 TB).  count() is poisoned to prove it."""
    import pyspark.sql

    tr = fx.council_transcripts(spark)

    def boom(self):
        raise AssertionError("routing ran an eager count() despite the hint")

    monkeypatch.setattr(pyspark.sql.DataFrame, "count", boom)
    ann = transcripts_pipeline(spark, tr, ann_threshold=10, chunk_count_hint=10**6)
    exact = transcripts_pipeline(spark, tr, ann_threshold=10, chunk_count_hint=1)
    monkeypatch.undo()
    # and the hint actually routed: big hint → ANN bucket join in the plan
    ann_plan = ann["retrieved"]._jdf.queryExecution().optimizedPlan().toString()
    exact_plan = exact["retrieved"]._jdf.queryExecution().optimizedPlan().toString()
    assert "__bucket" in ann_plan and "__bucket" not in exact_plan


def test_transcripts_pipeline_ann_default_threshold():
    """The scale path is the DEFAULT: retrieval routes through ANN once the
    corpus reaches 100k chunks without the caller opting in (round-2 review:
    exact |chunks|×|meetings| cross-score must not be the default at scale)."""
    import inspect

    from re_data_pipeline_spark.plans.pipelines import transcripts_pipeline as tp

    assert inspect.signature(tp).parameters["ann_threshold"].default == 100_000


def test_ann_topk_per_query_recall_vs_exact(spark):
    """Direct operator-level recall gate: SRP-bucketed per-query ANN ≥0.9
    recall vs the exact cross-score on a deterministic corpus."""
    from re_data_pipeline_spark.operators.similarity import (
        ann_topk_per_query,
        cosine_topk_per_query,
    )

    dim = 8
    corpus = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(q, [float((q * 5 + j * 2) % 9 - 4) for j in range(dim)]) for q in range(5)],
        "query_id long, embedding array<double>",
    )
    planes = [[1.0 if ((i * 11 + j * 17) % 7) < 3 else -1.0 for j in range(dim)] for i in range(2)]
    e = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_per_query(corpus, queries, k=5).collect()
    }
    a = {
        (r.query_id, r.vec_id)
        for r in ann_topk_per_query(corpus, queries, k=5, planes=planes).collect()
    }
    # 2 planes + 1-bit multiprobe scans 3/4 buckets: genuinely approximate
    # (the ≥0.9 gate on the real pipeline fixture is in the test above)
    assert len(a & e) / len(e) >= 0.8
    # widening the probe radius to all buckets recovers the exact result
    full = {
        (r.query_id, r.vec_id)
        for r in ann_topk_per_query(corpus, queries, k=5, planes=planes, probe_bits=2).collect()
    }
    assert full == e


def test_brochure_info_pipeline(spark):
    from pyspark.sql import functions as F

    from re_data_pipeline_spark.plans.pipelines import brochure_info_pipeline

    listings = spark.createDataFrame(
        [
            ("u1", "Edmonton", ["http://b/1"]),
            ("u2", "Edmonton", None),        # dropped: null brochures
            ("u3", "Calgary", ["http://b/3"]),  # dropped: wrong city
            ("u4", "Edmonton", []),          # dropped: empty list
            ("u5", "Edmonton", ["http://b/5", "http://b/5b"]),
        ],
        "property_uuid string, city string, brochure_urls array<string>",
    )
    out = brochure_info_pipeline(spark, listings)
    got = {r.property_uuid: r.extracted_brochure_info for r in out.collect()}
    assert set(got) == {"u1", "u5"}  # O4 filters precede the LLM stage
    assert all(v.startswith('{"summary"') for v in got.values())
