"""safe_cast / CASE-chain / profile semantics (SURVEY P8/P16, A4)."""

from pyspark.sql import functions as F

from re_data_pipeline_spark.functions.cleaning import (
    day_of_iso,
    first_available,
    normalize_sale_or_lease,
    profile_completeness,
    safe_cast,
)


def test_safe_cast_defaults(spark):
    df = spark.createDataFrame(
        [("1.5",), ("nan-ish",), (None,), ("2",)], ["v"]
    ).select(safe_cast("v", "double", 0.0).alias("out"))
    assert [r.out for r in df.collect()] == [1.5, 0.0, 0.0, 2.0]


def test_safe_cast_int_default(spark):
    df = spark.createDataFrame([("7",), ("x",)], ["v"]).select(
        safe_cast("v", "int", -1).alias("out")
    )
    assert [r.out for r in df.collect()] == [7, -1]


def test_safe_cast_rejects_java_suffixes(spark):
    """Reference float('1D') raises → default; Spark try_cast alone accepts
    Java typed-literal suffixes, so the strict guard must reject them
    (combine_broker_listings.py:167-175; round-2 hypothesis falsifier)."""
    cases = [
        ("1D", 0.0), ("1F", 0.0), ("2d", 0.0), ("3.5f", 0.0),
        ("0x1A", 0.0), ("1e3D", 0.0), (" 7 ", 7.0), ("+.5", 0.5),
        ("-2e-3", -0.002), ("1e3", 1000.0), (".", 0.0), ("", 0.0),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["v"]).select(
        safe_cast("v", "double", 0.0).alias("out")
    )
    got = [r.out for r in df.collect()]
    for g, (inp, want) in zip(got, cases):
        assert abs(g - want) < 1e-12, (inp, g, want)


def test_safe_cast_strips_all_whitespace_like_python(spark):
    """Python float()/int() strip tabs/newlines too, not just ASCII space —
    '\\t7' must cast, not default (combine_broker_listings.py:167-175; the
    round-4 verdict's latent Hypothesis falsifier)."""
    cases = [
        ("\t7", 7.0), ("\n3.5", 3.5), ("\r-2", -2.0), (" \t 8 \n", 8.0),
        ("\x0b1.25", 1.25), ("\f9", 9.0), ("\t\n", 0.0), ("\t7x", 0.0),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["v"]).select(
        safe_cast("v", "double", 0.0).alias("out")
    )
    for g, (inp, want) in zip([r.out for r in df.collect()], cases):
        assert abs(g - want) < 1e-12, (inp, g, want)
    idf = spark.createDataFrame([("\t12",), ("\n-3",)], ["v"]).select(
        safe_cast("v", "int", -1).alias("out")
    )
    assert [r.out for r in idf.collect()] == [12, -3]


def test_safe_cast_int_rejects_decimals_like_python(spark):
    """int('1.5') raises in Python → default, and int('12L') likewise."""
    df = spark.createDataFrame([("1.5",), ("12L",), (" 12 ",), ("+3",)], ["v"]).select(
        safe_cast("v", "int", -1).alias("out")
    )
    assert [r.out for r in df.collect()] == [-1, -1, 12, 3]


def test_sale_or_lease_precedence(spark):
    # reference order (combine_broker_listings.py:78-94): sale&lease →
    # sale_or_lease; sale; sublease BEFORE lease; null → ''
    cases = [
        ("For Sale or Lease", "sale_or_lease"),
        ("FOR SALE", "sale"),
        ("Sublease Available", "sublease"),
        ("For Lease", "lease"),
        ("something else", "something else"),
        (None, ""),
        # 'sublease' also contains 'lease'; sale+sublease contains both
        ("Sale or Sublease", "sale_or_lease"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["v"]).select(
        normalize_sale_or_lease("v").alias("out")
    )
    assert [r.out for r in df.collect()] == [c[1] for c in cases]


def test_first_available(spark):
    df = spark.createDataFrame(
        [({"price": "100"},), ({"asking_price": "200"},), ({},)],
        "m map<string,string>",
    ).select(first_available("m", ["price", "asking_price"]).alias("out"))
    assert [r.out for r in df.collect()] == ["100", "200", None]


def test_profile_completeness(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (3, "y"), (4, None)], ["a", "b"])
    row = profile_completeness(df).collect()[0]
    assert row.a == 100.0 and row.b == 50.0


def test_day_of_iso(spark):
    df = spark.createDataFrame(
        [("2025-04-09T00:00:00.000",), ("garbage",)], ["v"]
    ).select(day_of_iso("v").alias("out"))
    assert [r.out for r in df.collect()] == [9, 0]


def test_canonical_url_edge_cases(spark):
    from re_data_pipeline_spark.functions.urls import canonical_url

    cases = [
        ("HTTP://A.COM:80", "http://a.com/"),                       # default port, no path
        ("https://a.com:443/x?b=2&a=1#frag", "https://a.com/x?a=1&b=2"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),           # non-default port kept
        ("https://a.com:80/x", "https://a.com:80/x"),               # 80 is NOT https' default
        ("http://a.com:443/x", "http://a.com:443/x"),               # 443 is NOT http's default
        ("http://A.com/Path/Case", "http://a.com/Path/Case"),       # path case preserved
        ("https://a.com/?z=1&y=2&z=0", "https://a.com/?y=2&z=0&z=1"),
        # EMPTY authority must keep its path distinct: before r13 both of
        # these collapsed to 'file:///' (host/path regexes required a
        # non-empty authority), silently merging unrelated docs under one
        # dedup key
        ("file:///a.txt", "file:///a.txt"),
        ("file:///b/c.txt#frag", "file:///b/c.txt"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [want for _, want in cases]


def test_html_to_text_edge_cases(spark):
    from re_data_pipeline_spark.functions.urls import html_to_text

    cases = [
        ("<p>a</p><script>x<b>ignored</b></script><p>b</p>", "a b"),
        ("<STYLE a=b>p {}</STYLE>hi", "hi"),                         # case-insensitive
        ("Tom &amp;amp; Jerry", "Tom &amp; Jerry"),                  # no double-decode
        ("a  \n\t b", "a b"),
        ("<a href='x'>link</a>&nbsp;&#39;q&#39;", "link 'q'"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [r[0] for r in df.select(html_to_text("html")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_url_schemeless_passthrough(spark):
    """Scheme-less inputs must NOT collapse to a shared ':///' dedup key."""
    from re_data_pipeline_spark.functions.urls import canonical_url

    df = spark.createDataFrame(
        [("example.com/a",), ("other-site.org/b",), ("  spaced.net/c ",)], "url string"
    )
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == ["example.com/a", "other-site.org/b", "spaced.net/c"]
    assert len(set(got)) == 3


def test_try_numeric_coerces_like_pandas(spark):
    """P17's documented API (`pd.to_numeric(errors='coerce')` analogue,
    aggregate_rental_rates.py:57-59,127): numeric strings parse, garbage
    and NULL coerce to NULL — previously an untested zero-reference
    surface (the class that hid the round-6 sssp bug)."""
    import pyspark.sql.functions as F

    from re_data_pipeline_spark.functions.cleaning import try_numeric

    df = spark.createDataFrame(
        [("12.5",), ("-3",), ("1e2",), ("abc",), ("",), (None,)], "v string"
    )
    got = [r[0] for r in df.select(try_numeric("v")).collect()]
    assert got == [12.5, -3.0, 100.0, None, None, None]


def test_duplicate_ngram_fraction_short_doc_totality(spark):
    """Empty and sub-n docs score 0.0 (the shingle floor keeps MinHash
    total); the function never returns NULL — the documented contract
    after the r13 doc fix.  A Gopher deployment gates empty docs via the
    min-length rule, not this score."""
    from re_data_pipeline_spark.functions.text import duplicate_ngram_fraction

    df = spark.createDataFrame(
        [("",), ("one",), ("a b a b",), (None,)], "text string"
    )
    got = [r[0] for r in df.select(duplicate_ngram_fraction("text", 2)).collect()]
    assert got[0] == 0.0      # empty: one "" shingle
    assert got[1] == 0.0      # sub-n: one short shingle
    assert abs(got[2] - 1 / 3) < 1e-12   # "a b","b a","a b" -> 1 repeat of 3
    assert got[3] == 0.0      # NULL text too: greatest() ignores NULLs in
    #                           the floor, so even NULL yields one "" shingle
