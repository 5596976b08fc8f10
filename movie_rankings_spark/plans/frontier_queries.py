"""Round-4 operator tier: deterministic mergeable HLL registers,
PPS/Horvitz–Thompson sampling, label-propagation communities, and the
skyline operator — four classically-distributed analytics shapes, each
value-hash oracleable (no rows-only carve-outs; see the operator
modules for the exactness arguments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators import hllsketch, pps
from movie_rankings_spark.operators.communities import (
    community_sizes,
    label_propagation,
)
from movie_rankings_spark.operators.pagerank import copurchase_edges
from movie_rankings_spark.operators.skyline import (
    skyline_2d,
    skyline_oracle_sql,
)
from movie_rankings_spark.plans.registry import REGISTRY


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- deterministic mergeable HLL over events --------------------------------

_HLL_P = 8

_HLL_ORACLE = hllsketch.hll_oracle_sql(
    _HLL_P,
    key_sql="user_id",
    day_group="CAST(ts AS DATE)",
    merge_group="event_type",
    table="events",
)


@REGISTRY.register("hll_registers_rollup", _HLL_ORACLE)
def hll_registers_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HLL distinct-user rollup: per-(event_type, day)
    md5-derived register tables built once, MERGED (max per register)
    up to event_type, with the raw estimate α·m²/Z — the same
    store-daily-sketches / merge-for-dashboards contract as
    hll_users_mergeable_rollup, but with every value reproducible on
    any engine (oracle-exact, closing the r3 "HLL rows-only" gap).
    p=8 → 256 registers: at the tiny test cardinalities the RAW
    estimate sits in the linear-counting regime (the correction's
    inputs n_set/scaled_sum_set are part of the output; accuracy at
    proper cardinality is gated in tests/test_hll.py); production
    would run p=12–14 unchanged."""
    e = _t(spark, sf_dir, "events")
    daily = hllsketch.hll_build(
        e.withColumn("day", F.to_date("ts")),
        key="user_id",
        group_cols=["event_type", "day"],
        p=_HLL_P,
    )
    return hllsketch.hll_merge_estimate(
        daily, merge_to=["event_type"], p=_HLL_P
    ).orderBy("event_type")


# --- PPS + Horvitz–Thompson sampling audit over orders -----------------------

_PPS_N = 500

_PPS_ORACLE = pps.pps_oracle_sql(
    key_sql="o_orderkey",
    weight_sql="o_totalprice",
    group_sql="o_orderpriority",
    n_target=_PPS_N,
    table="orders",
    group_alias="o_orderpriority",
)


@REGISTRY.register("pps_sample_orders", _PPS_ORACLE)
def pps_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Poisson-PPS draw (expected n=500, weight = order value)
    audited per priority class: exact population count/total beside
    the sample size and the Horvitz–Thompson estimates rebuilt from
    the sample alone. Selection is an integer cross-multiplication on
    md5 uniforms — engine-exact, so the entire draw (not just its
    moments) value-hash matches the oracle."""
    return pps.pps_sample_report(
        _t(spark, sf_dir, "orders"),
        key_col="o_orderkey",
        weight_col="o_totalprice",
        group_cols=["o_orderpriority"],
        n_target=_PPS_N,
    )


# --- label-propagation communities over the co-purchase graph ----------------


def _lpa_oracle(n_rounds: int = 4) -> str:
    """Unrolled DuckDB twin of synchronous min-tie-break LPA over the
    co-purchase graph (same edge construction as _pagerank_oracle):
    each round re-derives every node's label as the most frequent
    neighbour label, ties to the smallest — pure integer logic, no
    floats anywhere."""
    parts = [
        """WITH baskets AS (
  SELECT list_distinct(list(l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
), ok AS (SELECT parts FROM baskets WHERE len(parts) BETWEEN 2 AND 30),
e AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM ok, LATERAL unnest(parts) AS a(p), LATERAL unnest(parts) AS b(p)
  WHERE a.p <> b.p
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e)"""
    ]
    for k in range(1, n_rounds + 1):
        parts.append(
            f""",
g{k} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS cnt
  FROM e JOIN l{k - 1} l ON e.src = l.node
  GROUP BY e.dst, l.label
),
l{k} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (
             PARTITION BY node ORDER BY cnt DESC, label ASC
           ) AS rn
    FROM g{k}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT label, COUNT(*) AS n_nodes FROM l{n_rounds}
GROUP BY label ORDER BY n_nodes DESC, label ASC LIMIT 20"""
    )
    return "".join(parts)


@REGISTRY.register("communities_copurchase", _lpa_oracle())
def communities_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities on the item co-purchase graph
    (operators/communities.py): 4 synchronous rounds, frequency-then-
    min-label updates — all integer logic, so the unrolled DuckDB twin
    hash-matches the full labelling. Top-20 communities by size.
    The co-purchase graph is symmetric, so every node both sends and
    receives in each round (no dangling special case)."""
    edges = copurchase_edges(_t(spark, sf_dir, "lineitem"))
    labels = label_propagation(edges, n_rounds=4)
    return community_sizes(labels).limit(20)


# --- skyline / Pareto frontier over parts ------------------------------------

_SKYLINE_ORACLE = skyline_oracle_sql(
    x_sql="p_retailprice",
    y_sql="p_size",
    table="part",
    select_sql="a.p_partkey, a.p_brand, a.p_retailprice, a.p_size",
    order_sql="a.p_retailprice ASC, a.p_size DESC, a.p_partkey ASC",
)


@REGISTRY.register("skyline_parts_frontier", _SKYLINE_ORACLE)
def skyline_parts_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts — no part is both cheaper and larger:
    the bucketed prefix-max skyline (operators/skyline.py) whose
    linear plan must reproduce the oracle's quadratic NOT-EXISTS
    semantics exactly, ties and duplicates included."""
    part = _t(spark, sf_dir, "part")
    return (
        skyline_2d(part, "p_retailprice", "p_size")
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
        .orderBy(
            F.asc("p_retailprice"), F.desc("p_size"), F.asc("p_partkey")
        )
    )
