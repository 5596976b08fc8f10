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
    from movie_rankings_spark.operators.adaptive import state_hint

    # r10: und feeds the degree union (2 scans), the orientation join
    # and the edge count — persist it so the upstream (basket explode +
    # distinct) runs once, and the measured edge count drives the
    # adaptive broadcasts below (node-sized degree table, edge-sized
    # closure probe side). Values unchanged throughout.
    und = und.persist_tracked()
    n_edges = und.count()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(
            state_hint(
                deg.withColumnRenamed("node", "u").withColumnRenamed(
                    "d", "du"
                ),
                2 * n_edges,
            ),
            "u",
        )
        .join(
            state_hint(
                deg.withColumnRenamed("node", "v").withColumnRenamed(
                    "d", "dv"
                ),
                2 * n_edges,
            ),
            "v",
        )
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
    # r10: the closure probe side is edge-sized while the wedge table
    # is O(m^1.5) — broadcast the small side when it fits
    closed = wedge.join(
        state_hint(o.select("src", "dst"), n_edges),
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


def local_clustering(und: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient — triangles through the
    node over its wedge count: lcc(v) = 2·T_v / (d_v·(d_v−1)) — the
    node-level refinement of triangle_stats' one global number: hub
    nodes with low lcc are brokers, high-lcc nodes sit inside tight
    communities (the feature a graph-aware sampler or fraud screen
    reads). ``und`` must be canonical (u < v, distinct).

    Shape: the same degree-ordered orientation as triangle_stats
    (wedge work bounded O(m^1.5), 'curse of the last reducer'-proof);
    each closed triangle fans out its THREE corners through one
    explode, then a map-side-combined per-node count. Nodes in no
    triangle surface with n_triangles = 0 via the degree left join.
    Exactness: counts are exact BIGINTs; lcc is one IEEE division of
    exact integers. Output: one row per node with degree ≥ 2 — node,
    degree, n_triangles, lcc — ordered by node.
    """
    from movie_rankings_spark.operators.adaptive import state_hint

    # the degree union reads und twice and the orientation join once:
    # persist so an expensive upstream (e.g. basket explode) runs once
    und = und.persist_tracked()
    n_edges = und.count()  # r10: drives the adaptive broadcasts below
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist_tracked()  # orientation joins + the output read this
    )
    e = und.join(
        state_hint(
            deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"),
            2 * n_edges,
        ),
        "u",
    ).join(
        state_hint(
            deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"),
            2 * n_edges,
        ),
        "v",
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("d_dst"),
    ).persist_tracked()  # wedge sides + closure probe read this
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
    ).select(
        F.col("x.src").alias("wc"),
        F.col("x.dst").alias("wa"),
        F.col("y.dst").alias("wb"),
    )
    closed = wedge.join(
        state_hint(o.select("src", "dst"), n_edges),
        (F.col("wa") == F.col("src")) & (F.col("wb") == F.col("dst")),
    )
    per_node = (
        closed.select(
            F.explode(F.array("wc", "wa", "wb")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    dd = F.col("d").cast("double")
    return (
        deg.filter(F.col("d") >= 2)
        .join(per_node, "node", "left")
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            (
                F.lit(2.0)
                * F.coalesce(F.col("t"), F.lit(0)).cast("double")
                / (dd * (dd - F.lit(1.0)))
            ).alias("lcc"),
        )
        .orderBy("node")
    )


def degree_assortativity(und: DataFrame) -> DataFrame:
    """Newman's degree assortativity coefficient — the Pearson
    correlation of endpoint degrees over the edge STUB list (each
    undirected edge contributes both orientations): r > 0 means hubs
    attach to hubs (social-style graphs), r < 0 hubs attach to leaves
    (hub-and-spoke catalogs) — the one-number mixing summary next to
    the clustering tier, and the first thing to check before trusting
    degree-based sampling.

    Exactness: with stubs (x, y), Σd_x = Σd_y and Σd_x² = Σd_y² by
    symmetry, so r = (M·Σd_x·d_y − (Σd_x)²) / (M·Σd_x² − (Σd_x)²)
    needs only three stub moments — all exact BIGINTs through
    DECIMAL(38,0) (degree products bounded by n²·m) — and r is one
    shared IEEE expression of them. One degree aggregate + one
    broadcast-degree join; no window.

    Output: ONE row — n_nodes, n_edges, n_stubs, sum_d, sum_dsq,
    sum_prod, assortativity."""
    # the degree union and the stub union each read und twice:
    # persist so an expensive upstream (basket explode) runs once
    und = und.persist_tracked()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist_tracked()  # node count + both stub joins read this
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    stubs = und.select("u", "v").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    joined = stubs.join(
        F.broadcast(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du")),
        "u",
    ).join(
        F.broadcast(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv")),
        "v",
    )
    d19 = "decimal(19,0)"
    m = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_stubs"),
        F.sum(F.col("du").cast(d19)).cast("decimal(38,0)").alias("sum_d"),
        F.sum((F.col("du").cast(d19) * F.col("du")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sum_dsq"),
        F.sum((F.col("du").cast(d19) * F.col("dv")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sum_prod"),
    )
    md = F.col("n_stubs").cast("double")
    sd = F.col("sum_d").cast("double")
    r = F.try_divide(
        md * F.col("sum_prod").cast("double") - sd * sd,
        md * F.col("sum_dsq").cast("double") - sd * sd,
    )
    return m.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        (F.col("n_stubs") / F.lit(2)).cast("long").alias("n_edges"),
        "n_stubs",
        F.col("sum_d").cast("long").alias("sum_d"),
        F.col("sum_dsq").cast("long").alias("sum_dsq"),
        F.col("sum_prod").cast("long").alias("sum_prod"),
        r.alias("assortativity"),
    )
