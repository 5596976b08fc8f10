"""Boilerplate removal (textops.strip_boilerplate): planted-fixture
exactness vs a Python reference, plus conservation invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators.textops import strip_boilerplate

CHUNK = 4  # small window so fixtures stay readable


def _mk(words):
    return " ".join(words)


HEADER = [f"hdr{i}" for i in range(CHUNK)]  # planted recurring span
BODY_A = [f"a{i}" for i in range(CHUNK)]
BODY_B = [f"b{i}" for i in range(CHUNK)]
TAIL = ["tail0", "tail1"]  # shorter than the window -> always kept


def _fixture_docs(spark):
    rows = [
        # header + unique body + short tail
        (0, _mk(HEADER + BODY_A + TAIL)),
        # header + different unique body
        (1, _mk(HEADER + BODY_B)),
        # 100% boilerplate document (only the shared header)
        (2, _mk(HEADER)),
        # no boilerplate at all
        (3, _mk([f"c{i}" for i in range(CHUNK * 2)])),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_boilerplate_planted(spark):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _fixture_docs(spark), chunk_size=CHUNK, min_docs=2
        ).collect()
    }
    assert len(out) == 4  # row count conserved
    # doc 0: header removed, body + tail kept in order
    assert out[0]["clean_text"] == _mk(BODY_A + TAIL)
    assert out[0]["n_chunks_removed"] == 1
    assert out[0]["n_chunks_kept"] == 2
    # doc 1: header removed, body kept
    assert out[1]["clean_text"] == _mk(BODY_B)
    assert out[1]["n_chunks_removed"] == 1
    # doc 2: fully boilerplate -> empty but present
    assert out[2]["clean_text"] == ""
    assert out[2]["n_chunks_kept"] == 0
    assert out[2]["n_chunks_removed"] == 1
    # doc 3: untouched
    assert out[3]["clean_text"] == _mk([f"c{i}" for i in range(CHUNK * 2)])
    assert out[3]["n_chunks_removed"] == 0


def test_strip_boilerplate_min_docs_threshold(spark):
    """A span repeated within ONE document is not cross-doc boilerplate."""
    span = [f"s{i}" for i in range(CHUNK)]
    docs = spark.createDataFrame(
        [(0, _mk(span + span)), (1, _mk([f"x{i}" for i in range(CHUNK)]))],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(docs, chunk_size=CHUNK, min_docs=2).collect()
    }
    assert out[0]["clean_text"] == _mk(span + span)
    assert out[0]["n_chunks_removed"] == 0


def test_strip_boilerplate_conservation_sf(spark, sf_dir):
    """On real data: row count conserved, and kept+removed covers every
    chunk; clean_text of untouched docs equals the original text."""
    docs = load_table(spark, sf_dir, "documents")
    out = strip_boilerplate(docs, chunk_size=16, min_docs=2)
    assert out.count() == docs.count()
    untouched_mismatch = (
        out.filter(F.col("n_chunks_removed") == 0)
        .join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.col("clean_text") != F.col("text"))
        .count()
    )
    assert untouched_mismatch == 0
