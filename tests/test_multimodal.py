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


def test_parse_image_header_formats():
    """Pure-stdlib header codec (r4): PNG IHDR, JPEG SOF0, GIF LSD,
    BMP InfoHeader all parse exactly; corrupt/foreign bytes -> None."""
    import struct
    import zlib

    from movie_rankings_spark.operators.multimodal import (
        jpeg_bytes,
        parse_image_header,
        png_bytes,
    )

    assert parse_image_header(png_bytes(640, 480, 2)) == ("png", 640, 480, 3)
    assert parse_image_header(png_bytes(7, 9, 6)) == ("png", 7, 9, 4)
    assert parse_image_header(png_bytes(1, 1, 0)) == ("png", 1, 1, 1)
    assert parse_image_header(jpeg_bytes(320, 200, 3)) == (
        "jpeg", 320, 200, 3,
    )
    assert parse_image_header(jpeg_bytes(5, 4, 1)) == ("jpeg", 5, 4, 1)

    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 3
    assert parse_image_header(gif) == ("gif", 12, 34, 3)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 55, -66) + b"\x00" * 4
    assert parse_image_header(bmp) == ("bmp", 55, 66, 3)  # top-down negative h

    # corrupt IHDR CRC -> quarantined, not garbage dimensions
    good = bytearray(png_bytes(100, 50, 2))
    good[17] ^= 0xFF  # flip a width byte without fixing the CRC
    assert parse_image_header(bytes(good)) is None
    # JPEG whose tables come before SOF still parses (marker walk)
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    j = jpeg_bytes(31, 17, 3)
    walked = j[:2] + dqt + j[2:]
    assert parse_image_header(walked) == ("jpeg", 31, 17, 3)
    assert parse_image_header(b"not an image") is None
    assert parse_image_header(None) is None
    assert parse_image_header(b"") is None
    # truncated PNG (signature only) -> None
    assert parse_image_header(png_bytes(9, 9, 2)[:12]) is None
    # PNG's IDAT is a real zlib stream (spec-valid container)
    p = png_bytes(3, 3, 2)
    idat_at = p.index(b"IDAT")
    (ln,) = struct.unpack(">I", p[idat_at - 4 : idat_at])
    zlib.decompress(p[idat_at + 4 : idat_at + 4 + ln])


def test_decode_image_meta_roundtrip(spark):
    """synthesize (real binary headers) -> decode -> fields match the
    id arithmetic; an injected corrupt payload is quarantined."""
    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.multimodal import (
        decode_image_meta,
        synthesize_image_media,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = synthesize_image_media(docs)
    got = {
        r["media_id"]: (r["format"], r["width"], r["height"], r["channels"])
        for r in decode_image_meta(media).collect()
    }
    assert len(got) == 40
    for i in range(40):
        fmt = "png" if i % 2 == 0 else "jpeg"
        ch = (4 if i % 4 == 0 else 3) if fmt == "png" else (
            1 if i % 4 == 1 else 3
        )
        assert got[i] == (fmt, i % 640 + 1, i % 480 + 1, ch)

    bad = spark.createDataFrame(
        [(999, bytearray(b"junk-not-an-image"))],
        "media_id long, payload binary",
    )
    assert decode_image_meta(media.unionByName(bad)).count() == 40
