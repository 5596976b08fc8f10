"""Synchronous label-propagation community detection (Raghavan et al.
2007) — the third iterative-graph operator next to connected
components (operators/components.py) and PageRank
(operators/pagerank.py).

LPA finds densely-connected communities without a cluster-count
parameter: every node starts as its own label; each round every node
adopts the label most frequent among its neighbours. The classic
algorithm is asynchronous with random tie-breaks; this implementation
is the DETERMINISTIC synchronous variant — all nodes update from the
previous round's labels simultaneously, frequency ties resolve to the
smallest label — so a fixed round count yields one well-defined
labelling that an independent engine reproduces exactly (the unrolled
DuckDB twin in plans/frontier_queries.py). Synchronous LPA can
oscillate on bipartite-ish structures rather than converge, which is
why the round count is part of the query contract instead of a
convergence loop.

Per round, as DataFrame ops:

- gather: edges ⋈ labels on src ships each neighbour's current label
  to dst — one equi-join; the edge table is static so AQE reuses its
  shuffle layout round over round (the pagerank shape);
- count: groupBy (dst, label) with map-side partial aggregation;
- argmax: one more partial-aggregated groupBy taking
  max(struct(cnt, −label)) — frequency desc, label asc — NEVER a
  window over a single partition.

State is O(|nodes|); per-round cost is two bounded shuffles;
localCheckpoint truncates lineage each round exactly like the CC and
PageRank loops. No collect anywhere — the driver never sees the
graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_rounds: int = 4,
) -> DataFrame:
    """(node, label) after ``n_rounds`` synchronous updates; ties by
    min label. Pass both edge directions for an undirected graph
    (copurchase_edges already does). Isolated nodes never appear —
    every node in `edges` has ≥ 1 neighbour by construction."""
    # the edge table feeds every round's gather join — persist it or
    # each round re-derives it from the base tables (the pagerank
    # `weighted` convention)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist_tracked()
    e.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist_tracked()
    )
    from movie_rankings_spark.caching import rotating_checkpoint
    from movie_rankings_spark.operators.adaptive import state_hint

    n_nodes = nodes.count()
    ckpt = rotating_checkpoint(edges.sparkSession)
    labels = ckpt(nodes.select("node", F.col("node").alias("label")))
    for _ in range(n_rounds):
        # r10: label state is node-sized vs the static edge table —
        # adaptive broadcast (operators/adaptive.py), values unchanged
        gathered = (
            e.join(state_hint(labels, n_nodes), e["src"] == labels["node"])
            .select("dst", "label")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt DESC, label ASC): max over struct(cnt, -label)
        # keeps the aggregation partial/mergeable — no per-node window
        labels = (
            gathered.groupBy("dst")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"),
                        (-F.col("label")).alias("neg"),
                        F.col("label"),
                    )
                ).alias("top")
            )
            .select(F.col("dst").alias("node"), F.col("top.label").alias("label"))
        )
        # rotating: free the previous round's label checkpoint (node-
        # sized, but n_rounds copies add up — the r8 kcore finding)
        labels = ckpt(labels)
    nodes.unpersist()
    e.unpersist()  # labels is checkpointed — safe to release here
    return labels


def community_sizes(labels: DataFrame) -> DataFrame:
    """(label, n_nodes) per community, largest first — the summary a
    dashboard reads; deterministic order (size desc, label asc)."""
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), F.asc("label"))
    )
