"""int8 quantization (operators/embeddings.py) and bigram-LM scoring
(operators/textops.py::bigram_lm_scores) against Python references."""

from __future__ import annotations

import math

from movie_rankings_spark.operators.embeddings import quantize_int8
from movie_rankings_spark.operators.textops import bigram_lm_scores


def test_quantize_int8_roundtrip_and_bounds(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 127.0]),
            (2, [0.0, 0.0]),  # all-zero: scale 0, no NaN
            (3, [-0.003, 0.001]),
        ],
        "vec_id int, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(emb).collect()}

    r1 = rows[1]
    assert r1["scale"] == 1.0  # max|x| = 127 -> scale 1
    assert r1["q"] == [1, -2, 1, 127]  # 0.5 rounds half-up
    assert r1["sum_q"] == 127
    assert r1["max_abs_err"] <= r1["scale"] / 2 + 1e-12

    r2 = rows[2]
    assert r2["scale"] == 0.0
    assert r2["q"] == [0, 0] and r2["max_abs_err"] == 0.0

    r3 = rows[3]
    # codes live in [-127, 127] by construction
    assert all(-127 <= qi <= 127 for qi in r3["q"])
    assert r3["max_abs_err"] <= r3["scale"] / 2 + 1e-12


def test_bigram_lm_score_matches_python_reference(spark):
    corpus = {
        10: "the cat sat",
        11: "the cat ran",
        12: "dog",  # single token: no bigrams, drops out
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert set(got) == {10, 11}

    # Python reference of the same model
    from collections import Counter

    bi: Counter = Counter()
    uni = set()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for did, text in corpus.items():
        ws = text.split(" ")
        uni.update(ws)
        pairs = list(zip(ws, ws[1:]))
        per_doc[did] = pairs
        bi.update(pairs)
    c1: Counter = Counter()
    for (w1, _), c in bi.items():
        c1[w1] += c
    v = len(uni)

    def dec9(x: float) -> float:
        return round(x, 9)  # DECIMAL(18,9) rounding of the log

    for did in (10, 11):
        logs = [
            dec9(math.log((bi[p] + 1) / (c1[p[0]] + v))) for p in per_doc[did]
        ]
        want = sum(logs) / len(logs)
        assert abs(got[did]["avg_logprob"] - want) < 1e-9
        assert got[did]["n_bigrams"] == len(logs)
