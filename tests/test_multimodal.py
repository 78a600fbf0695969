"""Multimodal plumbing: schemas, batch shapes, one-to-many frame sampling,
binary-column pruning, and the real-decoder stub contract."""

import pytest
from pyspark.sql import functions as F

from re_data_pipeline_spark.operators.multimodal import (
    decode_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_decode_features_schema_and_determinism(spark):
    media = synthetic_media(spark, 12)
    out = decode_features(media)
    assert "feature" in out.columns and "content" not in out.columns
    a = {r.media_id: r.feature for r in out.collect()}
    b = {r.media_id: r.feature for r in decode_features(synthetic_media(spark, 12)).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def test_decoded_shapes_by_kind(spark):
    out = decode_features(synthetic_media(spark, 9)).collect()
    shapes = {r.kind: tuple(r.decoded_shape) for r in out}
    assert shapes["image"] == (8, 8, 3)
    assert shapes["audio"] == (1600,)
    assert shapes["video"] == (4, 8, 8, 3)


def test_resize_content_length(spark):
    out = resize_images(synthetic_media(spark, 6), 4, 4).collect()
    assert all(len(r.content) == 4 * 4 * 3 for r in out)


def test_sample_frames_one_to_many(spark):
    media = synthetic_media(spark, 9)  # 3 videos (ids 2,5,8), 4 frames each
    out = sample_frames(media, every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_index)
    assert set(by_id) == {2, 5, 8}
    assert all(sorted(v) == [0, 2] for v in by_id.values())
    assert all(len(r.feature) == 8 for r in out)


def test_real_decoder_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        decode_features(synthetic_media(spark, 3), decoder="real")


def test_metadata_scan_prunes_binary(spark, tmp_path):
    """Reading only meta columns must not read the binary column
    (ReadSchema pruning — the point of binary+metadata layout)."""
    media = synthetic_media(spark, 6)
    p = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(p)
    scan = spark.read.parquet(p).select("media_id", "kind", "meta.width")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
    assert scan.count() == 6
