"""Winnowing fingerprints (operators/winnowing.py) and n-gram novelty
(operators/textops.py::ngram_novelty): the SIGMOD'03 match guarantee,
selection density, and hand-computed novelty fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.operators.textops import ngram_novelty
from movie_rankings_spark.operators.winnowing import (
    POS_CAP,
    winnow_fingerprints,
)


def _fps(spark, texts, k=3, w=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r
        for r in winnow_fingerprints(df, "text", k=k, w=w).collect()
    }


def _fp_hashes(spark, texts, k=3, w=4):
    """Selected HASHES (position stripped) per doc, via a raw rerun."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = winnow_fingerprints(df, "text", k=k, w=w)
    # fp_min/max are keys; recover hash sets with a tiny python mirror
    import hashlib

    sets = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < k:
            continue
        hs = []
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            hs.append(h * POS_CAP + p)
        sel = set()
        n_grams = len(hs)
        for s in range(max(n_grams - w, 0) + 1):
            sel.add(min(hs[s : s + w]))
        sets[i] = {x // POS_CAP for x in sel}
    return out, sets


def test_winnowing_matches_python_mirror(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d e f g h i j k l m n o p",
        "short doc here",          # exactly k words -> 1 gram
        "too short",               # < k words -> dropped
        "rep rep rep rep rep rep rep rep",  # all-tie grams
    ]
    rows = _fps(spark, texts)
    _, mirror = _fp_hashes(spark, texts)
    assert set(rows) == set(mirror)  # doc 3 dropped by both
    import hashlib

    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < 3:
            continue
        keys = []
        for p in range(len(toks) - 2):
            g = " ".join(toks[p : p + 3])
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            keys.append(h * POS_CAP + p)
        sel = set()
        for s in range(max(len(keys) - 4, 0) + 1):
            sel.add(min(keys[s : s + 4]))
        r = rows[i]
        assert r["n_grams"] == len(keys)
        assert r["n_fingerprints"] == len(sel)
        assert r["fp_min"] == min(sel)
        assert r["fp_max"] == max(sel)
        assert r["fp_checksum"] == sum(sel) % 2147483647


def test_winnowing_match_guarantee(spark):
    """Any shared run of >= w + k - 1 = 6 words must yield a common
    selected HASH between the two documents (SIGMOD'03 Theorem)."""
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"one two three {shared} four five six",
        f"{shared} completely different tail words here",
    ]
    _, sets = _fp_hashes(spark, texts)
    out = _fps(spark, texts)
    assert out[0]["n_fingerprints"] >= 1 and out[1]["n_fingerprints"] >= 1
    assert sets[0] & sets[1], "no shared fingerprint hash for a 6-word run"


def test_winnowing_density(spark):
    """Selected fraction stays near the paper's 2/(w+1) budget on a
    long random doc — winnowing must keep far fewer than all grams."""
    import random

    rng = random.Random(5)
    words = [f"w{rng.randrange(500)}" for _ in range(3000)]
    out = _fps(spark, [" ".join(words)])
    r = out[0]
    frac = r["n_fingerprints"] / r["n_grams"]
    assert 0.1 < frac < 0.6  # 2/(w+1) = 0.4 nominal, ties reduce it


def test_ngram_novelty_hand_computed(spark):
    rows = [
        (0, "a b c d"),        # reference: grams {abc, bcd}
        (1, "a b c d e"),      # cand: {abc, bcd, cde} -> 1 novel
        (2, "x y z"),          # cand: {xyz} -> 1 novel
        (3, "a b c"),          # cand: {abc} -> 0 novel
        (4, "a b"),            # cand: too short -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(df, F.col("doc_id") == 0, "text", k=3).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_distinct_grams"], out[1]["n_novel"]) == (3, 1)
    assert abs(out[1]["novelty"] - 1 / 3) < 1e-15
    assert (out[2]["n_distinct_grams"], out[2]["n_novel"]) == (1, 1)
    assert out[3]["n_novel"] == 0 and out[3]["novelty"] == 0.0


def test_pmi_collocations_hand_computed(spark):
    from movie_rankings_spark.operators.textops import pmi_collocations

    # "x y" appears 6 times; x,y appear only together; "a b" 5 times
    # among frequent unigrams
    texts = ["x y a b"] * 5 + ["x y c"] + ["a c b a c b"] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = pmi_collocations(df, "text", top_k=10, min_count=5).collect()
    import math
    from collections import Counter

    uni = Counter(w for t in texts for w in t.split())
    bi = Counter(
        f"{ws[i]} {ws[i+1]}"
        for t in texts
        for ws in [t.split()]
        for i in range(len(ws) - 1)
    )
    n_uni = sum(uni.values())
    n_bi = sum(len(t.split()) - 1 for t in texts if len(t.split()) >= 2)
    got = {r["bigram"]: r for r in rows}
    for bg, r in got.items():
        w1, w2 = bg.split(" ")
        assert r["c12"] == bi[bg] and bi[bg] >= 5
        ref = math.log(bi[bg] * n_uni * n_uni / (uni[w1] * uni[w2] * n_bi))
        assert abs(r["pmi"] - ref) < 1e-8
    # "x y" is the strongest collocation (x and y occur only together)
    assert rows[0]["bigram"] == "x y"


def test_nb_score_matches_python_mirror(spark):
    """nb_score on a toy corpus == an exact-decimal python mirror
    (per-cell ln quantized to 9 dp, decimal sums, argmax with class
    tie-break) — and the pipeline classifies the separable toy
    corpus perfectly."""
    import math
    from collections import Counter
    from decimal import Decimal, ROUND_HALF_UP

    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.nbayes import nb_score, nb_train

    texts = {
        0: ("en", "cat dog cat bird"),
        1: ("en", "dog cat dog"),
        2: ("fr", "chat chien chat"),
        3: ("fr", "chien chat chien oiseau"),
        4: ("en", "bird cat"),
    }
    df = spark.createDataFrame(
        [(i, l, t) for i, (l, t) in texts.items()],
        "doc_id long, lang string, text string",
    )
    model = nb_train(df, F.col("lang"), F.split(F.col("text"), " "))
    out = {
        r["doc_id"]: r
        for r in nb_score(
            df, F.col("doc_id"), F.split(F.col("text"), " "), model
        ).collect()
    }
    # python mirror
    cls_docs = Counter(l for l, _ in texts.values())
    cnt = Counter()
    for l, t in texts.values():
        for w in t.split():
            cnt[(l, w)] += 1
    vocab = sorted({w for _, w in cnt})
    tot_c = Counter()
    for (l, _w), n in cnt.items():
        tot_c[l] += n
    q9 = lambda x: Decimal(repr(x)).quantize(
        Decimal("1.000000000"), rounding=ROUND_HALF_UP
    )
    lp = {
        (l, w): q9(math.log((cnt[(l, w)] + 1) / (tot_c[l] + len(vocab))))
        for l in cls_docs
        for w in vocab
    }
    lprior = {
        l: q9(math.log(cls_docs[l] / sum(cls_docs.values())))
        for l in cls_docs
    }
    for i, (l, t) in texts.items():
        scores = {
            c: lprior[c] + sum(lp[(c, w)] for w in t.split())
            for c in cls_docs
        }
        best = min(sorted(scores), key=lambda c: (-scores[c], c))
        r = out[i]
        assert r["pred_class"] == best == l
        assert abs(r["best_score"] - float(scores[best])) < 1e-12


def test_rake_hand_computed(spark):
    from movie_rankings_spark.operators.textops import rake_keyphrases

    # stopwords (en): a the and of to in is
    texts = [
        "deep learning of neural networks",   # [deep learning] [neural networks]
        "deep learning is great",             # [deep learning] [great]
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = rake_keyphrases(df, "text", lang="en", top_k=10).collect()
    got = {r["phrase"]: r for r in rows}
    # freq: deep 2, learning 2, neural 1, networks 1, great 1
    # deg (sum of phrase lens): deep 4, learning 4, neural 2,
    # networks 2, great 1 -> ws: 2, 2, 2, 2, 1
    assert set(got) == {"deep learning", "neural networks", "great"}
    dl = got["deep learning"]
    assert (dl["n_words"], dl["n_occurrences"]) == (2, 2)
    assert abs(dl["score"] - 4.0) < 1e-12
    assert abs(got["neural networks"]["score"] - 4.0) < 1e-12
    assert abs(got["great"]["score"] - 1.0) < 1e-12
    # ties break phrase-ascending: "deep learning" < "neural networks"
    assert rows[0]["phrase"] == "deep learning"
