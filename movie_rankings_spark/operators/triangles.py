"""Distributed triangle counting (SURVEY.md §2c [EXT] graph tier —
third graph operator next to connected components and PageRank).

Algorithm: degree-ordered edge orientation (Cohen 2009 / Suri &
Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
Reducer"). Every undirected edge is oriented from its lower-ranked
endpoint to its higher-ranked one under the total order
rank(v) = (degree(v), v); wedges are then built ONLY from each
node's out-edges and closed by a final edge join.

Why this is the 100 TB form: with degree ordering the out-degree of
every node is O(√m), so the wedge (intermediate) table is bounded by
Σ out_deg² = O(m^1.5) instead of Σ deg² — which a skewed hub node
(the "last reducer") would otherwise blow up to deg²_max. All three
steps are plain equi-joins + one count: no driver-side adjacency, no
iteration.

The triangle COUNT is orientation-invariant, so the DuckDB oracle
uses the independent naive a<b<c three-way join — a genuinely
different formulation that must agree exactly (integers throughout;
the one double, global clustering 3T/W, is a single shared division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical (u < v) undirected edge set from a directed edge list."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return edges.filter(F.col(src) != F.col(dst)).select(u, v).distinct()


def triangle_stats(und: DataFrame) -> DataFrame:
    """One-row graph summary: nodes, edges, wedges (open+closed paths
    of length 2 = Σ d(d−1)/2), triangles, and the global clustering
    coefficient 3·T/W. ``und`` must be canonical (u < v, distinct).
    """
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    # orient from lower (degree, id) to higher — rank(u) < rank(v)
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # o feeds both wedge sides and the closure probe: persist so the
    # degree joins run once, not three times.
    o = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("d_dst"),
    ).persist_tracked()
    x, y = o.alias("x"), o.alias("y")
    wedge = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (
            (F.col("x.d_dst") < F.col("y.d_dst"))
            | (
                (F.col("x.d_dst") == F.col("y.d_dst"))
                & (F.col("x.dst") < F.col("y.dst"))
            )
        ),
    ).select(F.col("x.dst").alias("wa"), F.col("y.dst").alias("wb"))
    closed = wedge.join(
        o.select("src", "dst"),
        (F.col("wa") == F.col("src")) & (F.col("wb") == F.col("dst")),
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    counts = und.agg(
        F.count(F.lit(1)).alias("n_edges"),
    )
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(d * (d - 1)) div 2").alias("n_wedges"),
    )
    return (
        nodes_wedges.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                (F.col("n_triangles") * 3).cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("global_clustering"),
        )
    )


def triangle_count_naive(und: DataFrame) -> DataFrame:
    """Reference three-way join (a<b<c) — O(Σ d²) wedge table, used
    only by tests to pin the oriented form's count."""
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    return (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
