"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
— the MOSS algorithm: from a document's k-gram hash sequence, select
the minimum hash of every sliding window of w consecutive grams. The
guarantee that makes it the standard copy-detection fingerprint: any
shared substring of at least w + k − 1 tokens between two documents
is caught by at least one COMMON selected fingerprint, while only
~2/(w+1) of grams are kept.

Reference parity: none — the reference scraper (top_movies.py) has no
text analysis; this extends the dedup family (§2 J8/J13 MinHash /
SimHash / prefix-filter) with the positional fingerprint those
set-similarity schemes don't give (winnowing localizes WHERE the
overlap is, which plagiarism/contamination forensics needs).

Deviation from the paper, documented: ties inside a window select the
LEFTMOST minimal hash (the paper prefers rightmost). Encoding
(hash, position) as the single integer key = h·2²⁰ + pos makes the
per-window argmin ONE bigint MIN over a w-row frame — no struct
window aggregates — and bigint min tie-breaks toward the smaller
position. The ~2/(w+1) density and the (w+k−1)-match guarantee are
unaffected (any total order over the window works).

Scale shape: tokenization and k-gram construction are in-row
higher-order functions (codegen, no UDF); the gram table shuffles
ONCE on doc_id for the per-doc position windows — rows ∝ corpus
tokens, the same budget as the MinHash shingle pass; everything after
is a per-doc aggregate. Positions are capped at 2²⁰ grams per doc
(the encoding's budget — ~4 MB documents at 4-char tokens; raise the
shift for longer docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: position bits in the combined (hash, pos) ordering key
POS_BITS = 20
POS_CAP = 1 << POS_BITS


def _word_kgrams(toks, k: int):
    """Word k-gram array expression, TOTAL on every input: sub-k
    documents yield an empty array instead of evaluating
    F.sequence(0, n<0) (which produces a DESCENDING [0,…,n] whose
    indices feed slice(start=0) and blow up at runtime). The
    conditional matters even when callers filter size >= k first —
    Catalyst pushes a downstream Generate's size(g) > 0 predicate
    into the same Filter, where the gram expression runs on the
    UNFILTERED rows."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(k)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprint summary.

    Selection: grams = word k-grams of the space-tokenized text
    (documents shorter than k words produce none and drop out);
    h(gram) = first 8 md5 hex digits as a long (engine-portable, the
    classifier convention); window starts run over
    pos ∈ [0, max(n_grams − w, 0)] with the frame clipped at the doc
    end, so short docs (k ≤ words < k+w−1) still yield one
    fingerprint. Fingerprints are the DISTINCT selected keys
    (h·2²⁰ + pos — position included, as the paper's fingerprint
    pairs are).

    Output per doc: doc_id, n_grams, n_fingerprints, fp_min, fp_max,
    fp_checksum (Σ distinct keys mod 2³¹−1 — exact integer arithmetic,
    so the whole row value-hashes against the SQL oracle).
    """
    toks = F.split(F.col(text_col), " ")
    grams = _word_kgrams(toks, k)
    g = (
        docs.filter(F.size(toks) >= k)
        .select("doc_id", grams.alias("g"))
        .select(
            "doc_id",
            F.size("g").alias("n_grams"),
            F.posexplode("g").alias("pos", "gram"),
        )
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
    keyed = g.select(
        "doc_id",
        "n_grams",
        "pos",
        (h * F.lit(POS_CAP) + F.col("pos")).alias("key"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, w - 1)
    )
    starts = keyed.withColumn("sel", F.min("key").over(win)).filter(
        F.col("pos") <= F.greatest(F.col("n_grams") - F.lit(w), F.lit(0))
    )
    fps = starts.select("doc_id", "n_grams", "sel").distinct()
    return (
        fps.groupBy("doc_id", "n_grams")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
            F.min("sel").alias("fp_min"),
            F.max("sel").alias("fp_max"),
            F.pmod(
                F.sum(F.col("sel").cast("decimal(38,0)")),
                F.lit(2147483647).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("fp_checksum"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_fingerprints",
            "fp_min",
            "fp_max",
            "fp_checksum",
        )
    )
