"""token_js_divergence drift-score tests."""

from __future__ import annotations

import math


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_js_zero_for_identical_distributions(spark):
    a = _docs(spark, [(1, "en", "x y z x"), (2, "en", "x y")])
    b = _docs(spark, [(3, "en", "x x x y y z")])  # same relative frequencies
    from re_data_pipeline_spark.operators.drift import token_js_divergence

    out = token_js_divergence(a, b, "lang").collect()
    assert len(out) == 1 and out[0].js_micro == 0 and out[0].js == 0.0


def test_js_ln2_for_disjoint_and_one_sided(spark):
    from re_data_pipeline_spark.operators.drift import token_js_divergence

    a = _docs(spark, [(1, "en", "aa bb cc"), (2, "xx", "only here")])
    b = _docs(spark, [(3, "en", "dd ee ff")])
    out = {r.lang: r for r in token_js_divergence(a, b, "lang").collect()}
    ln2 = math.log(2)
    # disjoint vocabularies -> JS = ln 2 (up to per-term micro rounding)
    assert abs(out["en"].js - ln2) < 1e-5
    # stratum present only in snapshot A -> (ln 2)/2 by convention: the
    # present side's KL half is p*ln2 per token, the empty side has no mass
    assert out["xx"].n_tokens_b == 0 and abs(out["xx"].js - ln2 / 2) < 1e-5


def test_js_detects_moderate_shift(spark):
    from re_data_pipeline_spark.operators.drift import token_js_divergence

    a = _docs(spark, [(1, "en", "x " * 90 + "y " * 10)])
    b = _docs(spark, [(2, "en", "x " * 60 + "y " * 40)])
    out = token_js_divergence(a, b, "lang").collect()[0]
    assert 0 < out.js < math.log(2)
    assert out.n_tokens_a == 100 and out.n_tokens_b == 100


def test_embedding_centroid_drift_identity_and_inversion(spark):
    """Identical snapshots -> cosine 1.0, norm ratio 1.0; a negated
    snapshot -> cosine -1.0; a doubled snapshot -> ratio 2.0 with cosine
    1.0 (direction unchanged)."""
    from pyspark.sql import functions as F

    from re_data_pipeline_spark.operators.drift import embedding_centroid_drift

    base = spark.createDataFrame(
        [(i, [float(i % 3 + 1), 2.0, -1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    ).withColumn("stratum", F.lit(0).cast("bigint"))

    same = embedding_centroid_drift(base, base, "stratum").collect()[0]
    assert same.centroid_cosine == 1.0 and same.norm_ratio == 1.0
    assert same.n_a == 8 and same.n_b == 8

    neg = base.select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        "stratum",
    )
    flipped = embedding_centroid_drift(base, neg, "stratum").collect()[0]
    assert flipped.centroid_cosine == -1.0 and flipped.norm_ratio == 1.0

    dbl = base.select(
        "vec_id",
        F.transform("embedding", lambda x: x * 2).alias("embedding"),
        "stratum",
    )
    scaled = embedding_centroid_drift(base, dbl, "stratum").collect()[0]
    assert scaled.centroid_cosine == 1.0 and scaled.norm_ratio == 2.0


def test_embedding_drift_surfaces_one_sided_stratum(spark):
    """A stratum that vanished from one snapshot must appear in the output
    (count 0, NULL cosine/ratio) — the alarm case a drift monitor exists
    for — and dimension mismatches penalize the cosine instead of
    silently truncating to the shared prefix."""
    from pyspark.sql import functions as F

    from re_data_pipeline_spark.operators.drift import embedding_centroid_drift

    a = spark.createDataFrame(
        [(0, "s0", [1.0, 0.0]), (1, "s1", [0.5, 0.5])],
        "vec_id long, stratum string, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(2, "s0", [1.0, 0.0])],
        "vec_id long, stratum string, embedding array<double>",
    )
    out = {r.stratum: r for r in embedding_centroid_drift(a, b, "stratum").collect()}
    assert set(out) == {"s0", "s1"}
    assert out["s0"].centroid_cosine == 1.0
    assert out["s1"].n_b == 0
    assert out["s1"].centroid_cosine is None and out["s1"].norm_ratio is None

    # dimensionality change: b's extra dimension counts toward b's norm,
    # so the cosine drops below 1 even though the shared prefix matches
    b2 = spark.createDataFrame(
        [(3, "s0", [1.0, 0.0, 1.0])],
        "vec_id long, stratum string, embedding array<double>",
    )
    mixed = embedding_centroid_drift(
        a.where(F.col("stratum") == "s0"), b2, "stratum"
    ).collect()[0]
    assert mixed.centroid_cosine is not None and mixed.centroid_cosine < 1.0
