"""Property-based conformance (SURVEY §5 item 4): the Spark expressions for
safe_cast and the sale_or_lease CASE chain must agree with direct Python
transcriptions of the reference logic on arbitrary inputs.

Each hypothesis example is a BATCH of strings evaluated in one DataFrame
(one Spark job per example, not per string)."""

from hypothesis import given, settings, strategies as st

from re_data_pipeline_spark.functions.cleaning import (
    normalize_sale_or_lease,
    safe_cast,
)


def ref_sale_or_lease(v):
    """Python transcription of combine_broker_listings.py:78-94."""
    if v is None:
        return ""
    low = v.lower()
    if "sale" in low and "lease" in low:
        return "sale_or_lease"
    if "sale" in low:
        return "sale"
    if "sublease" in low:
        return "sublease"
    if "lease" in low:
        return "lease"
    return v


text_strategy = st.one_of(
    st.none(),
    st.text(max_size=30),
    st.sampled_from(
        ["For Sale", "for LEASE", "Sublease", "sale or lease", "SALE/SUBLEASE", "x"]
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=40))
def test_sale_or_lease_matches_reference(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string").select(
        normalize_sale_or_lease("v").alias("out")
    )
    got = [r.out for r in df.collect()]
    assert got == [ref_sale_or_lease(v) for v in batch]


import re as _re

# Python float() accepts "nan"/"inf"/"infinity" case-insensitively, underscore
# digit separators ("1_0"), and non-ASCII unicode digits; the engine's strict
# ASCII guard intentionally treats those as un-castable — documented platform
# differences, not safe_cast properties, so exclude them from the oracle.
_NANINF = _re.compile(r"^\s*[+-]?(nan|inf\w*)\s*$", _re.IGNORECASE)
_PLATFORM_ONLY = _re.compile(r"_|[^\x00-\x7f]")

num_strategy = st.one_of(
    st.none(),
    st.text(max_size=12).filter(
        lambda s: not _NANINF.match(s) and not _PLATFORM_ONLY.search(s)
    ),
    st.integers(-10**6, 10**6).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(lambda f: f"{f:.4f}"),
    # the falsifying family from round 2: Java typed-literal suffixes that
    # Python float() rejects but a bare Spark try_cast accepts
    st.sampled_from(["1D", "1F", "2d", "3.5f", "0x1A", "1e3D", " 7L ", "8s"]),
)


def ref_safe_double(v, default=0.0):
    if v is None:
        return default
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


@settings(max_examples=25, deadline=None)
@given(st.lists(num_strategy, min_size=1, max_size=40))
def test_safe_cast_double_matches_python(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string").select(
        safe_cast("v", "double", 0.0).alias("out")
    )
    got = [r.out for r in df.collect()]
    want = [ref_safe_double(v) for v in batch]
    for g, w in zip(got, want):
        assert g == w or abs(g - w) < 1e-9, (g, w, batch)
