"""bpe_train vs a single-node reference trainer: identical merge
rules, counts, and order (the determinism claim)."""

from __future__ import annotations

from collections import Counter

from movie_rankings_spark.operators.tokenizer import bpe_train


def _ref_bpe(texts: list[str], n_merges: int):
    freq = Counter(w for t in texts for w in t.split(" "))
    words = [(list(w), c) for w, c in freq.items()]
    rules = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties lexicographic on (left, right)
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        rules.append((step, left, right, merged, n))
        for i, (syms, c) in enumerate(words):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            words[i] = (out, c)
    return rules


def test_bpe_train_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "aaa aaab abab the",
        "banana bandana the the",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["n"])
        for r in bpe_train(df, n_merges=8).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 8)
    assert len(got) == 8


def test_bpe_train_overlapping_pairs_greedy(spark):
    # "aaaa" under the a+a merge must become [aa, aa], not [aa, a, a]:
    # round 2's top pair is then (aa, aa).
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    got = [
        (r["left"], r["right"], r["n"]) for r in bpe_train(df, 2).collect()
    ]
    assert got[0] == ("a", "a", 6)  # 3 greedy pairs per word × wc 2
    assert got[1] == ("aa", "aa", 2)


def test_bpe_train_stops_when_exhausted(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = bpe_train(df, 10).collect()
    assert len(got) == 1  # after a+b -> ab there are no pairs left
