"""bpe_train vs a single-node reference trainer: identical merge
rules, counts, and order (the determinism claim)."""

from __future__ import annotations

from collections import Counter

from movie_rankings_spark.operators.tokenizer import bpe_train


def _ref_bpe(texts: list[str], n_merges: int):
    # zero-length tokens (consecutive/leading/trailing spaces) carry
    # no symbols: excluded from the vocabulary, like the engine/oracle
    freq = Counter(w for t in texts for w in t.split(" ") if w)
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


def test_bpe_oracle_sql_matches_reference_on_adversarial_corpus():
    """The r8 DuckDB twin's literal-replace greedy merge must equal
    the Python fold reference on tie-heavy / overlapping-run inputs
    ('aaaa' under a+a, merged-symbol adjacency, multi-round
    interactions) — pure DuckDB, no Spark session."""
    import duckdb
    import pandas as pd

    from movie_rankings_spark.operators.tokenizer import (
        bpe_encode_oracle_sql,
        bpe_train_oracle_sql,
    )

    texts = [
        "aaaa aaa aa a",
        "abab abab ab",
        "aab aab baa",
        "xyxy xyx yxy",
        "aaaa abab aab",
        "zz zz zz zzz",
    ]
    n_merges = 6
    ref = _ref_bpe(texts, n_merges)

    con = duckdb.connect()
    con.register("docs_df", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM docs_df")
    got = con.execute(bpe_train_oracle_sql(n_merges)).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref], (got, ref)

    # encode twin: per-doc token counts must match a Python re-encode
    enc = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe_encode_oracle_sql(n_merges)).fetchall()
    }

    def _apply(word: str) -> int:
        syms = list(word)
        for _, left, right, merged, _n in ref:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            syms = out
        return len(syms)

    for i, t in enumerate(texts):
        ws = t.split(" ")
        assert enc[i] == (len(ws), sum(_apply(w) for w in ws)), (i, enc[i])


def test_bpe_whitespace_irregular_corpus_engine_oracle_parity(spark):
    """The r8 ADVICE class: consecutive/leading/trailing spaces emit
    zero-length tokens. Engine and DuckDB twin must agree that an
    empty word contributes NO symbols, NO pairs, and NO token counts
    (without the filter, Spark's descending sequence(1,0) expanded ''
    to ['',''] — a phantom ('','') pair and n_tok=2)."""
    import duckdb
    import pandas as pd

    from movie_rankings_spark.operators.tokenizer import (
        bpe_encode_oracle_sql,
        bpe_encode_token_counts,
        bpe_train,
        bpe_train_oracle_sql,
    )

    texts = [
        "aa  aa   ab",      # consecutive spaces
        " leading aa",      # leading space
        "trailing ab ",     # trailing space
        "  ",               # only empties
        "ab aa ba",
    ]
    n_merges = 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ref = _ref_bpe(texts, n_merges)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["n"])
        for r in bpe_train(df, n_merges=n_merges).orderBy("step").collect()
    ]
    assert got == ref

    con = duckdb.connect()
    con.register(
        "docs_df", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM docs_df")
    oracle = [tuple(r) for r in con.execute(bpe_train_oracle_sql(n_merges)).fetchall()]
    assert oracle == ref

    enc_engine = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_token_counts(df, n_merges=n_merges).collect()
    }
    enc_oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe_encode_oracle_sql(n_merges)).fetchall()
    }
    assert enc_engine == enc_oracle
    # doc 3 ("  ") has zero non-empty words: no row on either side
    assert 3 not in enc_engine
