"""In-engine acquisition paths (S1/S3/S4): paging protocol, server-side
params, POST body carriage, and row-parity with the fixture frames."""

from re_data_pipeline_spark.plans import fixtures as fx
from re_data_pipeline_spark.plans.acquisition import (
    AV_PAGE_SIZE,
    acquire_av,
    acquire_omada,
    acquire_royal_park,
    ajax_post_fetcher,
    offset_paged_fetcher,
    wp_paged_fetcher,
)


def _recording(inner):
    calls = []

    def fetch(params):
        calls.append(dict(params))
        return inner(params)

    return fetch, calls


def test_av_offset_paging_protocol(spark):
    inner = offset_paged_fetcher(fx.av_payload())
    fetch, calls = _recording(inner)
    out = acquire_av(spark, fetch)
    assert out.count() == 40
    # 40 rows at page size 12 → offsets 0,12,24,36 (last page short → stop)
    assert [c["offset"] for c in calls] == [0, 12, 24, 36]
    assert all(c["limit"] == AV_PAGE_SIZE for c in calls)


def test_wp_page_numbering_and_server_status_filter(spark):
    inner = wp_paged_fetcher(fx.omada_payload(), drafts=[])
    fetch, calls = _recording(inner)
    out = acquire_omada(spark, fetch)
    assert out.count() == 30
    # 30 rows at per_page 10: page 3 comes back full, so the loop must probe
    # page 4 (empty) to learn it's done — 4 calls total
    assert [c["page"] for c in calls] == [1, 2, 3, 4]
    assert all(c["status"] == "publish" for c in calls)


def test_wp_drafts_never_cross_the_wire(spark):
    # default mock has 5 server-side draft rows; status=publish strips them
    out = acquire_omada(spark)
    assert out.count() == 30
    assert out.where(out.status != "publish").count() == 0


def test_ajax_post_body_carried(spark):
    out = acquire_royal_park(spark)
    assert out.count() == 20
    # a fetcher demanding a different action proves the body is enforced
    bad = ajax_post_fetcher(fx.royal_park_payload(), "other_action")
    try:
        acquire_royal_park(spark, bad)
        raise AssertionError("expected ValueError for missing action")
    except ValueError:
        pass


def test_acquired_rows_match_fixture_frames(spark):
    # the §3.1 pipeline must behave identically on either entry point
    for acq, raw in [
        (acquire_av(spark), fx.raw_av_listings(spark)),
        (acquire_omada(spark), fx.raw_omada_listings(spark)),
        (acquire_royal_park(spark), fx.raw_royal_park_listings(spark)),
    ]:
        assert acq.schema == raw.schema
        assert acq.exceptAll(raw).count() == 0
        assert raw.exceptAll(acq).count() == 0
