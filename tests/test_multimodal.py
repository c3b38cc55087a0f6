"""Multimodal plumbing tests: the Spark mechanics (schema, Arrow batch
shape, determinism, partition sizing) are real; the codec is stubbed."""

import pytest

from aws_logs_to_parquet_converter_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"asset-{i}", ["image", "audio", "video"][i % 3], "payload-bytes-" * (i + 1) + str(i),
         64 + i, 48 + i, 1000 * i)
        for i in range(30)
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_feature_extraction_shape(spark, media):
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in rows)
    assert all(abs(sum(r.feature) - 1.0) < 1e-5 for r in rows if r.n_bytes)
    assert {r.asset_id for r in rows} == {f"asset-{i}" for i in range(30)}


def test_feature_extraction_deterministic(spark, media):
    a = {r.asset_id: r.feature for r in multimodal.extract_features(media).collect()}
    b = {r.asset_id: r.feature for r in multimodal.extract_features(media.repartition(7)).collect()}
    assert a == b  # partitioning must not change features


def test_real_decode_raises_at_seam(spark, media):
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_media_summary(spark, media):
    summary = multimodal.media_summary(multimodal.extract_features(media)).collect()
    assert {r.media_type for r in summary} == {"image", "audio", "video"}
    assert all(r.n_assets == 10 for r in summary)


def test_resize_images(spark, media):
    out = multimodal.resize_images(media, 224, 224).collect()
    assert len(out) == 10  # only the image rows
    assert all(r.width == 224 and r.height == 224 for r in out)
    assert all(r.payload.startswith("resized[224x224]:") for r in out)


def test_sample_frames_fanout(spark, media):
    out = multimodal.sample_frames(media, every_ms=1000).collect()
    videos = {r.asset_id: r for r in media.where("media_type = 'video'").collect()}
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == set(videos)
    for aid, rows in by_asset.items():
        expect = max(videos[aid].duration_ms // 1000, 1)
        assert len(rows) == expect, f"{aid}: {len(rows)} != {expect}"
        assert sorted(r.ts_ms for r in rows) == [1000 * i for i in range(len(rows))]
