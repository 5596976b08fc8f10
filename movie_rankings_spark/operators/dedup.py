"""Deduplication operators over the documents table (north_star tier).

Four tiers, cheapest first — at 100 TB you run them in this order:
  1. exact       — md5-keyed groupBy; one shuffle of (hash, id) pairs.
  2. ngram       — exact n-gram Jaccard via shingle-inverted-index
                   join; quadratic in the worst case, used as the
                   verifier and the small-scale oracle.
  3. minhash+LSH — banded MinHash bucket join; candidates only, then
                   exact verification on the (tiny) candidate set.
                   This is the scale path: cost is O(docs × shingles)
                   for signatures + near-linear bucket join.
  4. simhash     — 48-bit fingerprints; hamming-ball candidates via
                   chunk buckets (pigeonhole), bit_count verification.

All JVM-side: xxhash64 for hashing, higher-order array functions for
set math. No Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import content_fingerprint, word_shingles

# --- 1. exact ---------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct content fingerprint: representative doc
    (min id) + duplicate count. The dedup'd corpus is the semi-join of
    documents against rep_doc_id."""
    return (
        docs.select(content_fingerprint(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Documents with exact duplicates removed (first doc_id wins).
    Window form: one shuffle on the fingerprint, no second join."""
    w = Window.partitionBy(content_fingerprint(F.col("text"))).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- 2. exact n-gram Jaccard ------------------------------------------------


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id",
        F.array_distinct(word_shingles(F.col("text"), n)).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All document pairs with n-gram Jaccard >= threshold, via an
    inverted-index equi-join on shingles.

    Scale: the shingle join explodes on frequent shingles — at 100 TB
    you first drop "stop shingles" (document frequency above a cap),
    which cannot push any true pair below threshold when the cap is
    chosen per Broder; here the corpus is synthetic word soup and the
    join is already balanced. Columns: doc_a, doc_b, jaccard."""
    sets = shingle_sets(docs, n)
    inv = sets.select("doc_id", "n_shingles", F.explode("shingles").alias("shingle"))
    a = inv.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_shingles").alias("n_a"),
        "shingle",
    )
    b = inv.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_shingles").alias("n_b"),
        "shingle",
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    jaccard = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- 3. MinHash + LSH -------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """num_hashes MinHash values per doc in one aggregation pass:
    hash family = xxhash64(shingle, i). Output: doc_id, sig array."""
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.col("text"), shingle_n))).alias(
            "shingle"
        ),
    )
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"mh_{i}" for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidates.
    The bucket join is an equi-join on (band, bucket_hash) — shuffle
    is proportional to docs × bands, never quadratic."""
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", j * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (array_intersect on
    the pair's shingle sets — no second inverted-index join). With
    16×4 banding, a pair at the 0.5 threshold is caught with
    p = 1-(1-0.5^4)^16 ≈ 0.64, and the planted near-dups (j≥0.95)
    with p ≈ 1-1e-18; verification makes precision exact."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, bands, rows)
    sets = shingle_sets(docs, shingle_n)
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jaccard = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- 4. SimHash -------------------------------------------------------------

SIMHASH_BITS = 48  # keeps the fingerprint a positive BIGINT


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """48-bit SimHash over whitespace tokens: per bit, sum ±1 across
    token hashes; the sign becomes the bit. One explode + one
    aggregation; 48 conditional sums stay in a single HashAggregate."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b_{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b_{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select("doc_id", fingerprint.alias("simhash"))


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Hamming-ball pairs via pigeonhole chunking: split 48 bits into
    4 chunks of 12; any pair within hamming<=max_hamming<=... shares at
    least one exact chunk when max_hamming < 4, and chunk-equality is
    an equi-join. Verification = bit_count(xor) <= max_hamming."""
    fp = simhash_fingerprints(docs)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 12)
                        .bitwiseAND(F.lit((1 << 12) - 1))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "chunk", "val"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "chunk", "val"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["chunk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
