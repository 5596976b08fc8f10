"""Product-quantization ANN (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) over the embeddings table.

The vector is split into ``m`` contiguous subspaces; each subspace
gets its own tiny k-means codebook (``n_codes`` entries), and a vector
is stored as ``m`` uint8 codes — a 64-dim float32 vector compresses
256 B → 8 B. Queries never decompress: a per-query lookup table of
``m × n_codes`` partial dot products turns scoring into ``m`` table
lookups + adds per candidate (asymmetric distance computation, ADC).

Scale shape (the reason PQ exists at 100 TB):
  * training touches the corpus ``n_iters`` times but shuffles only
    ``m × n_codes × subdim`` partial sums per partition (map-side
    combined posexplode means — same trick as
    similarity.kmeans_centroids);
  * encoding is a map-only Arrow pass; at scale the codes table is
    what you persist and scan — 32× smaller than the vectors;
  * query scoring scans codes, emits per-batch top-(k+buffer)
    candidates, and only those few rows are rescored against the
    full-precision vectors (exact-decimal cosine, same survivor
    pattern as similarity.cosine_topk_numpy).

Approximate by construction, so the registered query is rows-only;
recall against the exact brute-force ranking is pinned in
tests/test_pq.py.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movie_rankings_spark.functions.vectors import (
    NARROW,
    dot_exact,
    dot_exact_dec,
    norm_sq_exact,
    norm_sq_exact_dec,
)
from movie_rankings_spark.operators.similarity import (
    TOPK_SCHEMA,
    _collect_queries,
    _query_side,
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def pq_train_codebooks(
    embeddings: DataFrame,
    m_subspaces: int = 8,
    n_codes: int = 16,
    n_iters: int = 4,
) -> np.ndarray:
    """Lloyd's k-means per subspace, all subspaces in one distributed
    pass per iteration. Returns (m, n_codes, subdim) float64.

    Assignment rides the codebooks into an Arrow closure (they are
    KB-sized at any corpus scale); the mean update posexplodes
    (subspace, code, subvector) and partial-aggregates on
    (subspace, code, dim), so the shuffle carries codebook cells, not
    vectors. Init = deterministic head sample (min vec_ids), like the
    IVF trainer."""
    init = (
        embeddings.orderBy("vec_id").limit(n_codes).select("embedding").collect()
    )
    mat0 = _normalize(np.array([r["embedding"] for r in init], dtype=np.float64))
    dim = mat0.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible into {m_subspaces} subspaces")
    sub = dim // m_subspaces
    books = np.stack(
        [mat0[:, j * sub : (j + 1) * sub] for j in range(m_subspaces)]
    )  # (m, n_codes, sub)

    for _ in range(n_iters):

        def assign_cells(
            batches: Iterator[pd.DataFrame], books: np.ndarray = books
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = _normalize(
                    np.array(pdf["embedding"].tolist(), dtype=np.float64)
                )
                for j in range(m_subspaces):
                    seg = mat[:, j * sub : (j + 1) * sub]
                    scores = seg @ books[j].T - 0.5 * (books[j] ** 2).sum(1)
                    yield pd.DataFrame(
                        {
                            "subspace": np.int32(j),
                            "code": np.argmax(scores, axis=1).astype(np.int32),
                            "subvec": list(seg),
                        }
                    )

        cells = (
            embeddings.select("embedding")
            .mapInPandas(
                assign_cells, "subspace int, code int, subvec array<double>"
            )
            .select("subspace", "code", F.posexplode("subvec").alias("dim", "x"))
            .groupBy("subspace", "code", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = books.copy()  # empty cells keep their old centroid
        for r in cells:
            new[r["subspace"], r["code"], r["dim"]] = r["m"]
        books = new
    return books


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) — nearest codebook entry per
    subspace of the l2-normalized vector. Map-only Arrow pass; this
    output is what a 100 TB deployment persists and scans."""
    m, _, sub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _normalize(np.array(pdf["embedding"].tolist(), dtype=np.float64))
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                seg = mat[:, j * sub : (j + 1) * sub]
                # nearest by L2 == max (dot - ||c||²/2) per subspace
                scores = seg @ codebooks[j].T - 0.5 * (codebooks[j] ** 2).sum(1)
                codes[:, j] = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, codes array<int>"
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    m_subspaces: int = 8,
    n_codes: int = 16,
    candidate_factor: int = 16,
) -> DataFrame:
    """ADC top-k: LUT-score the codes, keep per-batch
    ``candidate_factor × k`` candidates, exact-rescore the survivors
    against the full-precision vectors. Output schema matches the
    other similarity paths (query_id, vec_id, cosine, rn).

    ``candidate_factor`` is the standard PQ rescore knob (rescoring
    ~100 candidates for k=5 is typical); per-BATCH, so the rescore
    set stays queries × buffer × partitions regardless of corpus
    size."""
    books = pq_train_codebooks(embeddings, m_subspaces, n_codes)
    codes = pq_encode(embeddings, books)
    q_ids, q_mat = _collect_queries(embeddings, query_ids)
    m, _, sub = books.shape
    # per-query LUT: luts[q][j][c] = <q_sub_j, books[j][c]>
    luts = np.stack(
        [
            np.stack(
                [qv[j * sub : (j + 1) * sub] @ books[j].T for j in range(m)]
            )
            for qv in q_mat
        ]
    )  # (nq, m, n_codes)
    buffer = candidate_factor * k

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            for qi, qid in enumerate(q_ids):
                approx = luts[qi][np.arange(m), cmat].sum(axis=1)
                mask = vec_ids != qid
                ids_m, app_m = vec_ids[mask], approx[mask]
                take = min(buffer, len(ids_m))
                if take == 0:
                    continue
                idx = np.argpartition(-app_m, take - 1)[:take]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(take, qid, dtype=np.int64),
                        "vec_id": ids_m[idx],
                        "cosine": app_m[idx],  # approx score, pruning only
                    }
                )

    candidates = codes.mapInPandas(score, TOPK_SCHEMA).select("query_id", "vec_id")
    q = _query_side(embeddings, query_ids)
    rescored = (
        embeddings.select("vec_id", "embedding")
        .join(F.broadcast(candidates), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                dot_exact(F.col("q_emb"), F.col("embedding"), NARROW)
                / (F.col("q_nrm") * F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .orderBy("query_id", "rn")
    )


def _subspace_slices(emb_col: str, m: int, sub: int) -> F.Column:
    """array of the m contiguous sub-vectors of an embedding column —
    posexplode'ing it yields (subspace index, sub-vector)."""
    return F.array(
        *[F.slice(F.col(emb_col), j * sub + 1, sub) for j in range(m)]
    )


def pq_topk_exact(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    m_subspaces: int = 8,
    n_codes: int = 16,
    candidate_factor: int = 8,
) -> DataFrame:
    """PQ ANN with the WHOLE algorithm engine-portable (r9): the
    oracle-checkable twin of :func:`pq_topk`, following the r8
    ivf_topk_exact template. Same algorithm skeleton — per-subspace
    codebooks, per-vector code assignment, per-query ADC lookup-table
    sums pruning to a candidate buffer, exact rescore of survivors —
    but every float step is replaced by its exact-decimal counterpart
    so codes, LUT sums, the candidate set and the final ranking are
    identical on any engine:

      * codebooks: the deterministic head sample (lowest ``n_codes``
        vec_ids), sliced into ``m_subspaces`` sub-vectors; the code id
        IS the head vector's vec_id (labels need no contiguity);
      * assignment: nearest codebook entry per subspace by L2 over the
        RAW sub-vectors — argmax of ``2·dot − ‖c‖²`` with dot/norm as
        exact DECIMAL(28,12) sums (ties: lower code id). No float
        normalization pass (the GEMM tier's l2-normalize is the one
        step with no engine-neutral form);
      * ADC: approx(q,v) = Σ_j LUT[q][j][code_j] with LUT entries kept
        DECIMAL and summed exactly — order-independent, so the
        candidate buffer (top ``candidate_factor·k`` per query, ties
        lower vec_id, self excluded) is deterministic;
      * rescore: exact-decimal cosine on the full vectors, top-k.

    Scale shape: assignment joins the (corpus × m) sub-vector explode
    against a broadcast m×n_codes codebook — the same corpus-sized
    flops the float trainer pays, as codegen'd expressions; ADC scans
    the CODES table (m ints per vector, the 32×-compressed
    representation) against a broadcast LUT with a map-side-combining
    sum; only nq × buffer survivors touch full vectors again."""
    spark = embeddings.sparkSession
    dim = embeddings.select(F.size("embedding")).first()[0]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible into {m_subspaces} subspaces")
    sub = dim // m_subspaces
    buffer = candidate_factor * k

    cb = (
        embeddings.orderBy("vec_id")
        .limit(n_codes)
        .select(
            F.col("vec_id").alias("code"),
            F.posexplode(_subspace_slices("embedding", m_subspaces, sub)).alias(
                "j", "c_sub"
            ),
        )
        .select(
            "j",
            "code",
            "c_sub",
            norm_sq_exact_dec(F.col("c_sub"), NARROW).alias("c_nsq"),
        )
    )
    corpus_sub = embeddings.select(
        "vec_id",
        F.posexplode(_subspace_slices("embedding", m_subspaces, sub)).alias(
            "j", "v_sub"
        ),
    )
    d = dot_exact_dec(F.col("v_sub"), F.col("c_sub"), NARROW)
    # argmax hash aggregate, not a window: the partial aggregate
    # combines (corpus × m) × n_codes candidate rows to corpus × m
    # rows map-side before the shuffle — an n_codes× shuffle-byte
    # reduction, no per-key sort (r9). Ties break to the lower code
    # via the negated-code struct field (lexicographic max).
    codes = (
        corpus_sub.join(F.broadcast(cb), "j")
        .select(
            "vec_id", "j", "code", (d + d - F.col("c_nsq")).alias("score")
        )
        .groupBy("vec_id", "j")
        .agg(
            F.max(
                F.struct(
                    F.col("score"), (-F.col("code")).alias("_nc"), F.col("code")
                )
            ).alias("_b")
        )
        .select("vec_id", "j", F.col("_b.code").alias("code"))
    )

    q_sub = (
        embeddings.filter(F.col("vec_id").isin(list(query_ids)))
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(
                _subspace_slices("embedding", m_subspaces, sub)
            ).alias("j", "q_sub"),
        )
    )
    lut = q_sub.join(F.broadcast(cb), "j").select(
        "query_id",
        "j",
        "code",
        dot_exact_dec(F.col("q_sub"), F.col("c_sub"), NARROW).alias("pdot"),
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("vec_id").asc()
    )
    candidates = (
        codes.join(F.broadcast(lut), ["j", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").alias("approx"))
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= buffer)
        .select("query_id", "vec_id")
    )

    q = _query_side(embeddings, query_ids)
    rescored = (
        embeddings.select(
            "vec_id",
            "embedding",
            F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("nrm"),
        )
        .join(F.broadcast(candidates), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                dot_exact(F.col("q_emb"), F.col("embedding"), NARROW)
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", "rn")
        .orderBy("query_id", "rn")
    )
