"""Sequence packing: exactness vs a Python greedy reference +
invariants (budget respected, order preserved, no doc lost)."""

from __future__ import annotations

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators.textops import pack_documents

MAX_TOKENS = 256


def _reference_pack(rows):
    """rows: [(lang, doc_id, n_tokens)] -> {(lang, doc_id): batch_id}"""
    out = {}
    by_lang = {}
    for lang, doc_id, n in sorted(rows):
        by_lang.setdefault(lang, []).append((doc_id, n))
    for lang, docs in by_lang.items():
        batch, used = 0, 0
        for doc_id, n in docs:
            if used > 0 and used + n > MAX_TOKENS:
                batch, used = batch + 1, 0
            used += n
            out[(lang, doc_id)] = batch
    return out


def test_packing_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_documents(docs, max_tokens=MAX_TOKENS).collect()
    rows = [(r["lang"], r["doc_id"], r["n_tokens"]) for r in packed]
    want = _reference_pack(rows)
    got = {(r["lang"], r["doc_id"]): r["batch_id"] for r in packed}
    assert got == want
    # nothing lost
    assert len(got) == docs.count()


def test_packing_respects_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_documents(docs, max_tokens=MAX_TOKENS)
    from pyspark.sql import functions as F

    over = (
        packed.groupBy("lang", "batch_id")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        # a batch may exceed the budget only when it is a single
        # oversized document
        .filter((F.col("t") > MAX_TOKENS) & (F.col("n") > 1))
        .count()
    )
    assert over == 0


def test_chunking_reconstructs_documents(spark):
    """Concatenating each chunk's stride-prefix (plus the last chunk's
    tail) reproduces the original token stream, for lengths around the
    chunk/stride boundaries."""
    from movie_rankings_spark.operators.textops import chunk_documents

    texts = [" ".join(f"w{i}" for i in range(n)) or "" for n in
             (1, 23, 24, 25, 31, 32, 33, 48, 49, 100)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = chunk_documents(docs, chunk_size=32, stride=24).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        toks = []
        for r in rs[:-1]:
            got = r["chunk_text"].split(" ")
            # every non-last chunk extends past the stride point (else
            # no further start offset would exist), but may still be
            # shorter than chunk_size when the document tail runs out
            assert len(got) == r["chunk_len"] > 24
            toks.extend(got[:24])
        toks.extend(rs[-1]["chunk_text"].split(" "))
        assert toks == texts[doc_id].split(" ")
        # overlap: consecutive chunks share chunk_size - stride tokens
        for a, b in zip(rs, rs[1:]):
            assert a["chunk_text"].split(" ")[24:] == \
                b["chunk_text"].split(" ")[: a["chunk_len"] - 24]
