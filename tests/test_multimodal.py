"""Multimodal plumbing tests: binary columns through Arrow batches,
metadata transforms, frame-sample explode, stubbed decode contract."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return multimodal.synthesize_media(
        load_table(spark, sf_dir, "documents").limit(60)
    )


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]


def test_feature_extraction_is_normalized_histogram(media):
    rows = multimodal.extract_features(media).collect()
    assert len(rows) == 60
    for r in rows[:10]:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert math.isclose(sum(r["feature"]), 1.0, rel_tol=1e-9)


def test_feature_extraction_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert a == b


def test_resize_meta_bounds(media):
    rows = multimodal.resize_meta(media, max_side=224).collect()
    for r in rows:
        assert r["resized_meta"]["width"] <= 224
        assert r["resized_meta"]["height"] <= 224
        # aspect never upscaled
        assert r["resized_meta"]["width"] <= r["meta"]["width"] or (
            r["meta"]["width"] <= 224
        )


def test_sample_frames_counts(media):
    out = multimodal.sample_frames(media, fps=1.0)
    counts = (
        out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    by_id = {r["media_id"]: r["n"] for r in counts}
    metas = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert set(by_id) == set(metas)
    for mid, dur in metas.items():
        assert by_id[mid] == max(1, dur // 1000)


def test_decode_image_stub_contract():
    if multimodal._HAS_PIL:
        pytest.skip("PIL present; stub path not active")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"not an image")
