"""CEP regex pattern matching (operators/cep.py): hand-computed
match counts, non-overlapping semantics, and tie ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.operators.cep import cep_pattern_matches


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )


def SYM():
    return (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("x")
    )


def test_cep_hand_computed(spark):
    # user 1: v v c p v c p -> 'vvcpvcp': two v+c+p matches (vvcp, vcp)
    # user 2: c p v -> 'cpv': zero (needs a leading view)
    rows = (
        [(1, t, t, e) for t, e in enumerate(
            ["view", "view", "click", "purchase", "view", "click", "purchase"]
        )]
        + [(2, t, t, e) for t, e in enumerate(["click", "purchase", "view"])]
    )
    out = {
        r["user_id"]: r
        for r in cep_pattern_matches(
            _df(spark, rows), "user_id", SYM(), "v+c+p",
            ts_cols=("ts", "event_id"),
        ).collect()
    }
    assert out[1]["symbols"] == "vvcpvcp"
    assert out[1]["n_matches"] == 2
    assert out[1]["matched_chars"] == 7  # 'vvcp' + 'vcp'
    assert out[2]["n_matches"] == 0 and out[2]["matched_chars"] == 0


def test_cep_non_overlapping_and_tiebreak(spark):
    # equal ts: event_id breaks the tie -> 'vcp' not 'cvp'
    rows = [(9, 5, 2, "click"), (9, 5, 1, "view"), (9, 5, 3, "purchase")]
    [r] = cep_pattern_matches(
        _df(spark, rows), "user_id", SYM(), "v+c+p", ts_cols=("ts", "event_id")
    ).collect()
    assert r["symbols"] == "vcp" and r["n_matches"] == 1
    # 'vcpcp': after consuming 'vcp', the tail 'cp' has no v -> 1 match
    rows2 = [(3, t, t, e) for t, e in enumerate(
        ["view", "click", "purchase", "click", "purchase"]
    )]
    [r2] = cep_pattern_matches(
        _df(spark, rows2), "user_id", SYM(), "v+c+p"
    ).collect()
    assert r2["n_matches"] == 1 and r2["matched_chars"] == 3
