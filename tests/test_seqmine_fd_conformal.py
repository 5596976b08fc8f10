"""Sequence-triple support (operators/seqmine.py), FD discovery
(operators/fdprofile.py), and split conformal (operators/conformal.py):
hand fixtures plus a brute-force / python-replay cross-check each."""

from __future__ import annotations

import hashlib
from datetime import datetime
from itertools import product

import numpy as np
from pyspark.sql import functions as F

from movie_rankings_spark.operators.conformal import (
    split_conformal_group_median,
)
from movie_rankings_spark.operators.fdprofile import fd_violations
from movie_rankings_spark.operators.seqmine import sequence_triple_support


def _ts(sec: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, sec)


def test_seqmine_hand_fixture(spark):
    # scope 1: A(1) B(2) C(3); scope 2: B(1) A(2) C(3)
    rows = [
        (1, "A", _ts(1)), (1, "B", _ts(2)), (1, "C", _ts(3)),
        (2, "B", _ts(1)), (2, "A", _ts(2)), (2, "C", _ts(3)),
    ]
    df = spark.createDataFrame(rows, "sid long, event_type string, ts timestamp")
    out = sequence_triple_support(df, ["sid"], "event_type", "ts")
    by = {(r["a"], r["b"], r["c"]): r["n_sequences"] for r in out.collect()}
    assert by[("A", "B", "C")] == 1          # only scope 1
    assert by[("B", "A", "C")] == 1          # only scope 2
    assert ("C", "A", "B") not in by         # nowhere
    assert out.collect()[0]["n_total_sequences"] == 2


def test_seqmine_repeated_types_and_ties(spark):
    # A A A supports (A,A,A); simultaneous events are NOT ordered
    rows = [
        (1, "A", _ts(1)), (1, "A", _ts(2)), (1, "A", _ts(3)),
        (2, "A", _ts(5)), (2, "B", _ts(5)),  # tie: no (A,B,*) order
    ]
    df = spark.createDataFrame(rows, "sid long, event_type string, ts timestamp")
    by = {
        (r["a"], r["b"], r["c"]): r["n_sequences"]
        for r in sequence_triple_support(df, ["sid"], "event_type", "ts").collect()
    }
    assert by[("A", "A", "A")] == 1
    assert ("A", "B", "A") not in by and ("B", "A", "A") not in by


def test_seqmine_brute_force(spark):
    rng = np.random.default_rng(9)
    rows = []
    seqs = {}
    for sid in range(25):
        n = rng.integers(2, 9)
        types = [str(t) for t in rng.integers(0, 4, size=n)]
        seqs[sid] = types  # strictly increasing ts per scope
        rows += [(sid, t, _ts(int(i + 1))) for i, t in enumerate(types)]
    df = spark.createDataFrame(rows, "sid long, event_type string, ts timestamp")
    got = {
        (r["a"], r["b"], r["c"]): r["n_sequences"]
        for r in sequence_triple_support(df, ["sid"], "event_type", "ts").collect()
    }
    for a, b, c in product("0123", repeat=3):
        expect = 0
        for types in seqs.values():
            hit = False
            for i in range(len(types)):
                if hit:
                    break
                if types[i] != a:
                    continue
                for j in range(i + 1, len(types)):
                    if types[j] != b:
                        continue
                    if c in types[j + 1:]:
                        hit = True
                        break
            expect += hit
        assert got.get((a, b, c), 0) == expect, (a, b, c)


def test_fd_violations_hand(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 10), (3, "y", 20), (3, "y", 30)],
        "id long, a string, b long",
    )
    rows = fd_violations(df, [("id", "a"), ("a", "b"), ("b", "a")]).collect()
    by = {(r["lhs"], r["rhs"]): r for r in rows}
    assert by[("id", "a")]["fd_holds"]  # id 3 repeats but maps to one a
    r = by[("a", "b")]
    assert not r["fd_holds"]
    assert r["n_groups"] == 2 and r["n_violating_groups"] == 1
    assert r["n_violating_rows"] == 2 and r["max_rhs_per_group"] == 2
    assert by[("b", "a")]["fd_holds"]  # each b value maps to one a


def test_fd_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, None), (2, "y")], "a long, b string"
    )
    [r] = fd_violations(df, [("a", "b")]).collect()
    assert r["fd_holds"] and r["n_groups"] == 2


def test_conformal_python_replay(spark):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(4000):
        g = "g" + str(i % 2)
        y = int(rng.integers(0, 1000)) + (500 if g == "g1" else 0)
        rows.append((i, g, y))
    df = spark.createDataFrame(rows, "k long, g string, y long")
    got = {
        r["group"]: r
        for r in split_conformal_group_median(
            df, F.col("k"), F.col("g"), F.col("y")
        ).collect()
    }
    split = {}
    for k, g, y in rows:
        h = hashlib.md5(str(k).encode()).hexdigest()[0]
        split.setdefault(
            "train" if h <= "7" else ("calib" if h <= "b" else "test"), []
        ).append((g, y))
    med = {}
    for g in ("g0", "g1"):
        ys = sorted(y for gg, y in split["train"] if gg == g)
        med[g] = ys[(len(ys) + 1) // 2 - 1]
    scores = sorted(abs(y - med[g]) for g, y in split["calib"])
    n = len(scores)
    k = (9 * (n + 1) + 9) // 10
    q = scores[k - 1]
    for g in ("g0", "g1"):
        r = got[g]
        assert r["pred_cents"] == med[g]
        assert r["q_hat"] == q and r["n_calib"] == n and r["conf_k"] == k
        te = [(gg, y) for gg, y in split["test"] if gg == g]
        cov = sum(abs(y - med[g]) <= q for _, y in te)
        assert r["n_test"] == len(te) and r["n_covered"] == cov
    # distribution-free guarantee: coverage >= 1 - alpha - slack
    total_cov = sum(got[g]["n_covered"] for g in got) / sum(
        got[g]["n_test"] for g in got
    )
    assert total_cov >= 0.85


def test_conformal_tiny_calibration_raises(spark):
    df = spark.createDataFrame(
        [(i, "g", 100) for i in range(5)], "k long, g string, y long"
    )
    try:
        split_conformal_group_median(
            df, F.col("k"), F.col("g"), F.col("y")
        ).collect()
        raised = False
    except ValueError:
        raised = True
    assert raised
