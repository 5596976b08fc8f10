"""Round-3 session-4 batch 2: conversion-window funnel, U-shaped
attribution, label-centroid confusion audit, edit-distance verify."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from movie_rankings_spark.plans import all_queries
from tests.conftest import SF_DIR


def _q(name, spark, sf_dir=SF_DIR):
    return all_queries.QUERIES[name](spark, sf_dir)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


# --- time-bounded funnel ----------------------------------------------------


def test_funnel_gap_bound_drops_late_stages(spark):
    from movie_rankings_spark.operators.funnel import funnel_counts

    rows = [
        # user 1: view 00:00, click 02:00 (inside 6h), purchase 05:00 (inside)
        (1, _t(0), 1, "view", 0.0),
        (2, _t(2), 1, "click", 0.0),
        (3, _t(5), 1, "purchase", 9.0),
        # user 2: view 00:00, click 07:00 (outside 6h) -> funnel breaks
        (4, _t(0), 2, "view", 0.0),
        (5, _t(7), 2, "click", 0.0),
        (6, _t(8), 2, "purchase", 5.0),
        # user 3: view only
        (7, _t(1), 3, "view", 0.0),
    ]
    got = {
        r["event_type"]: r["n_users"]
        for r in funnel_counts(
            _ev(spark, rows), ["view", "click", "purchase"], max_gap_hours=6
        ).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}

    # unbounded funnel keeps user 2's click and purchase
    unbounded = {
        r["event_type"]: r["n_users"]
        for r in funnel_counts(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert unbounded == {"view": 3, "click": 2, "purchase": 2}


def test_funnel_gap_boundary_inclusive(spark):
    from movie_rankings_spark.operators.funnel import funnel_counts

    rows = [
        (1, _t(0), 1, "view", 0.0),
        (2, _t(6), 1, "click", 0.0),  # exactly 6h after: still counted
    ]
    got = {
        r["event_type"]: r["n_users"]
        for r in funnel_counts(
            _ev(spark, rows), ["view", "click"], max_gap_hours=6
        ).collect()
    }
    assert got == {"view": 1, "click": 1}


# --- U-shaped attribution ---------------------------------------------------


def test_position_attribution_weights(spark):
    from movie_rankings_spark.operators.attribution import (
        position_based_attribution,
    )

    rows = [
        # user 1: view, click, view, then purchase of 100 -> U-shape:
        # first view 0.4, middle click 0.2, last view 0.4
        (1, _t(0), 1, "view", 0.0),
        (2, _t(1), 1, "click", 0.0),
        (3, _t(2), 1, "view", 0.0),
        (4, _t(3), 1, "purchase", 100.0),
        # user 2: lone click then purchase of 10 -> click gets 1.0
        (5, _t(0), 2, "click", 0.0),
        (6, _t(1), 2, "purchase", 10.0),
        # user 3: no touch -> direct
        (7, _t(1), 3, "purchase", 7.0),
        # user 4: touch outside 24h lookback -> direct
        (8, dt.datetime(2023, 12, 30, 0), 4, "view", 0.0),
        (9, _t(12), 4, "purchase", 3.0),
    ]
    got = {
        r["touch_type"]: (r["credited_conversions"], r["attributed_revenue"])
        for r in position_based_attribution(_ev(spark, rows)).collect()
    }
    assert got["view"] == (0.8, 80.0)  # 0.4 + 0.4 of the 100
    assert got["click"] == (1.2, 30.0)  # 0.2*100 + 1.0*10
    assert got["direct"] == (2.0, 10.0)  # users 3 and 4


def test_position_attribution_two_touches_split_evenly(spark):
    from movie_rankings_spark.operators.attribution import (
        position_based_attribution,
    )

    rows = [
        (1, _t(0), 1, "view", 0.0),
        (2, _t(1), 1, "click", 0.0),
        (3, _t(2), 1, "purchase", 50.0),
    ]
    got = {
        r["touch_type"]: r["attributed_revenue"]
        for r in position_based_attribution(_ev(spark, rows)).collect()
    }
    assert got == {"view": 25.0, "click": 25.0}


# --- label centroids --------------------------------------------------------


def test_label_centroids_exact_means(spark):
    from movie_rankings_spark.operators.embeddings import (
        centroid_pairwise_cosine,
        label_centroids,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [3.0, 0.0], 0),
            (3, [0.0, 2.0], 1),
            (4, [1.0, 1.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    cents = {
        r["label"]: (r["centroid"], r["n_members"])
        for r in label_centroids(df).collect()
    }
    assert cents[0] == ([2.0, 0.0], 2)
    assert cents[1] == ([0.0, 2.0], 1)
    assert cents[2] == ([1.0, 1.0], 1)

    cos = {
        (r["label_a"], r["label_b"]): r["cosine"]
        for r in centroid_pairwise_cosine(label_centroids(df)).collect()
    }
    assert cos[(0, 1)] == 0.0  # orthogonal prototypes
    assert abs(cos[(0, 2)] - 2 ** -0.5) < 1e-12
    assert abs(cos[(1, 2)] - 2 ** -0.5) < 1e-12


# --- edit-distance verify ---------------------------------------------------


def test_editdistance_verify_reports_pair_set(spark):
    from movie_rankings_spark.operators import dedup
    from movie_rankings_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_neardup_pairs(
            docs, threshold=0.5, num_hashes=64, bands=16
        ).collect()
    }
    out = _q("dedup_editdistance_verify", spark).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == pairs
    for r in out:
        assert 0.0 <= r["edit_sim"] <= 1.0
        assert r["edit_pass"] == (1.0 - r["edit_sim"] <= 0.2 + 1e-12)


def test_editdistance_identical_texts_sim_one(spark):
    from pyspark.sql import functions as FF

    df = spark.createDataFrame(
        [("abcd", "abcd"), ("abcd", "abxd"), ("ab", "ba")], "a string, b string"
    )
    got = df.select(FF.levenshtein("a", "b").alias("d")).collect()
    assert [r["d"] for r in got] == [0, 1, 2]


# --- audio framing ----------------------------------------------------------


def test_audio_window_features_numpy_reference(spark):
    import numpy as np
    from movie_rankings_spark.operators.multimodal import (
        audio_window_features,
    )

    payloads = [
        (1, "audio", bytes(range(10))),          # short: 1 frame
        (2, "audio", bytes([200, 100] * 400)),   # 800 bytes: 2 frames, negatives
        (3, "video", b"ignored"),                # filtered out
        (4, "audio", b""),                       # empty: no rows
    ]
    media = spark.createDataFrame(
        payloads, "media_id long, kind string, payload binary"
    )
    got = {
        (r["media_id"], r["frame_idx"]): (r["n_samples"], r["rms"], r["zcr"])
        for r in audio_window_features(media, frame=1024, hop=512).collect()
    }

    want = {}
    for mid, kind, p in payloads:
        if kind != "audio":
            continue
        pcm = np.frombuffer(p, dtype=np.int8).astype(np.float64)
        if pcm.size == 0:
            continue
        for i in range(max(1, int(np.ceil(pcm.size / 512)))):
            w = pcm[i * 512 : i * 512 + 1024]
            if w.size == 0:
                break
            zc = int(np.sum(np.abs(np.diff(np.signbit(w)))))
            want[(mid, i)] = (
                int(w.size),
                float(np.sqrt(np.mean(w * w))),
                zc / w.size if w.size > 1 else 0.0,
            )
    assert got == want
    # the 200-byte payload alternates sign every sample
    assert got[(2, 0)][2] > 0.9


def test_audio_frames_filters_non_audio_and_empty(spark):
    from movie_rankings_spark.operators.multimodal import (
        audio_window_features,
    )

    media = spark.createDataFrame(
        [(1, "video", b"xx"), (2, "audio", b"")],
        "media_id long, kind string, payload binary",
    )
    assert audio_window_features(media).count() == 0


# --- erasure audit ----------------------------------------------------------


def test_erasure_audit_partitions_rows(spark):
    from movie_rankings_spark.catalog import load_table

    out = _q("erasure_audit_events", spark).collect()
    ev = load_table(spark, SF_DIR, "events")
    total = ev.count()
    assert sum(r["n_rows"] for r in out) == total
    for r in out:
        assert r["n_erased"] + r["n_remaining"] == r["n_rows"]
        assert r["n_forgotten_users"] <= r["n_erased"]
    # erasure is complete: re-auditing the remaining rows erases nothing
    remaining = ev.filter(~(ev.user_id % 97 == 3))
    assert remaining.filter(remaining.user_id % 97 == 3).count() == 0
