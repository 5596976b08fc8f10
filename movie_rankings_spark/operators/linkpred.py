"""Adamic–Adar link prediction (Adamic & Adar 2003; the standard
common-neighbour baseline of Liben-Nowell & Kleinberg 2007) — "which
item pairs are NOT yet co-purchased but share many co-purchase
neighbours?", the recommender-adjacent query over the same graph the
PageRank/triangles/LPA/k-core operators analyse.

score(u, v) = Σ_{z ∈ N(u) ∩ N(v)} 1 / ln(deg z)

— each common neighbour votes, rare neighbours vote louder. As
DataFrame ops this is the TRIANGLES wedge shape re-used for scoring:

- wedges: the symmetric edge list self-joined on the CENTER z —
  (z,u) ⋈ (z,v) with u < v enumerates each unordered pair once per
  common neighbour;
- weight: the center's 1/ln(deg) as a per-z column joined on before
  the wedge explode (|nodes|-row table);
- score: one map-side-combined groupBy (u, v) summing the weights;
- "not yet linked": one LEFT ANTI join against the edge list;
- top-k: TakeOrderedAndProject on the exact integer score.

Hub guard: wedge count is Σ_z deg(z)², so a hot center would emit
deg² pairs. Centers above ``max_degree`` are excluded — the standard
scale guard (cf. copurchase_edges' max_basket); their per-pair weight
1/ln(deg) is the smallest in the graph, and the SAME cap is applied
in the DuckDB twin, so the contract (not an approximation of it) is
what the oracle hashes.

Exactness: per-center weights are quantized to round(1e9/ln(deg)) as
BIGINT — the DSIR DECIMAL-rounded-ln convention — so the per-pair sum
is exact integer addition (order-independent across partitions and
engines); ln runs on small-integer degrees where both engines'
correctly-rounded libm agree, and the final unscale is one IEEE
division. No floats accumulate.

At 100 TB: degrees and weights are |nodes|-row aggregates; the wedge
table is bounded by cap²·|nodes| with map-side combine into (u,v)
partials; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for the 1/ln(deg) weights
W_SCALE = 1_000_000_000


def adamic_adar_topk(
    edges: DataFrame,
    k: int = 30,
    max_degree: int = 64,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-``k`` non-adjacent pairs by Adamic–Adar score over a
    symmetric edge list. Output: node_a < node_b, n_common,
    score_x1e9 (exact bigint), score (double). Order: score desc,
    then (node_a, node_b) asc — fully deterministic."""
    # the edge list feeds the degree aggregate, the wedge join AND the
    # existing-link anti join — persist or each consumer re-derives it
    # from the base tables (the pagerank `weighted` convention)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist_tracked()
    e.count()  # materialize: three consumers read the cached edge list
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= max_degree)
    ).select(
        F.col("src").alias("z"),
        F.round(F.lit(float(W_SCALE)) / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("w"),
    )
    # annotate each edge with its center's weight once, then wedge
    ew = e.join(centers, e["src"] == centers["z"]).select(
        "z", F.col("dst").alias("nbr"), "w"
    )
    left = ew.select("z", F.col("nbr").alias("node_a"), "w")
    right = ew.select(F.col("z").alias("z2"), F.col("nbr").alias("node_b"))
    wedges = left.join(
        right,
        (F.col("z") == F.col("z2")) & (F.col("node_a") < F.col("node_b")),
    ).select("node_a", "node_b", "w")
    scores = wedges.groupBy("node_a", "node_b").agg(
        F.sum("w").alias("score_x1e9"),
        F.count(F.lit(1)).alias("n_common"),
    )
    new_links = scores.join(
        e.select(
            F.col("src").alias("node_a"), F.col("dst").alias("node_b")
        ),
        ["node_a", "node_b"],
        "left_anti",
    )
    return (
        new_links.select(
            "node_a",
            "node_b",
            "n_common",
            "score_x1e9",
            (F.col("score_x1e9").cast("double") / F.lit(float(W_SCALE))).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score_x1e9"), F.asc("node_a"), F.asc("node_b"))
        .limit(k)
    )


def adamic_adar_oracle_sql(
    k: int, max_degree: int, edges_cte: str
) -> str:
    """DuckDB twin: identical cap, identical round(1e9/ln(deg))
    BIGINT weights, identical exact integer sum and ordering.
    ``edges_cte`` defines relation ``e`` (src, dst, symmetric)."""
    return f"""WITH {edges_cte},
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
centers AS (
  SELECT src AS z,
         CAST(round({W_SCALE}.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w
  FROM deg WHERE d BETWEEN 2 AND {max_degree}
),
ew AS (SELECT e.src AS z, e.dst AS nbr, c.w FROM e JOIN centers c ON e.src = c.z),
wedges AS (
  SELECT a.nbr AS node_a, b.nbr AS node_b, a.w
  FROM ew a JOIN ew b ON a.z = b.z AND a.nbr < b.nbr
),
scores AS (
  SELECT node_a, node_b, SUM(w) AS score_x1e9, COUNT(*) AS n_common
  FROM wedges GROUP BY node_a, node_b
)
SELECT node_a, node_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(score_x1e9 AS BIGINT) AS score_x1e9,
       CAST(score_x1e9 AS DOUBLE) / {W_SCALE}.0 AS score
FROM scores s
WHERE NOT EXISTS (
  SELECT 1 FROM e WHERE e.src = s.node_a AND e.dst = s.node_b
)
ORDER BY score_x1e9 DESC, node_a ASC, node_b ASC
LIMIT {k}"""
