"""Wide-join TPC-H tier (SURVEY.md §2 row J2 breadth) — Q2/Q7/Q8/Q9/
Q11/Q16/Q20/Q21 shapes adapted to the driver schema.

The driver's star schema has no ``partsupp`` table and lineitem has no
``l_commitdate``/``l_receiptdate``, so the four queries that need them
are adapted while preserving their *plan shape* (the thing that matters
at 100 TB):

  * Q2's per-supplier ``ps_supplycost`` → each supplier's best
    observed unit price ``MIN(l_extendedprice / l_quantity)`` per
    (part, supplier) — same correlated-min argmin over a region.
  * Q9's ``ps_supplycost`` → a retail-price cost proxy
    (``0.8 * p_retailprice * l_quantity``) — same 5-way join + two-key
    aggregate.
  * Q11's ``partsupp`` inventory value → lineitem value
    (``l_extendedprice * l_quantity``) per part for one nation's
    suppliers — same GROUP BY + global-scalar HAVING threshold.
  * Q16's ``partsupp`` supplier relation → distinct ``l_suppkey`` per
    part from lineitem; the comment-based complaint filter → a
    negative-``s_acctbal`` exclusion (same NOT-IN anti-join shape).
  * Q20/Q21's lateness → ``l_shipdate > o_orderdate + N days``.

Determinism follows plans/relational_queries.py: exact decimal sums
cast to double, unique ORDER BY tie-breakers, years as ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.plans.registry import REGISTRY


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _vol_dec():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


# --- Q2: minimum-cost supplier (correlated scalar subquery shape) ----------

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY 1, 2
), regional AS (
  SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal,
         n.n_name AS nation, ps.supplycost
  FROM ps
  JOIN part p     ON p.p_partkey = ps.l_partkey
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_size <= 15 AND p.p_type = 'STANDARD'
)
SELECT s_acctbal, s_name, nation, p_partkey, p_brand, supplycost
FROM regional
WHERE supplycost = (SELECT MIN(r2.supplycost) FROM regional r2
                    WHERE r2.p_partkey = regional.p_partkey)
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


@REGISTRY.register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the canonical correlated-MIN-scalar-subquery-in-
    WHERE, de-correlated into a per-part window min. ``ps_supplycost``
    (no partsupp table) is proxied as each supplier's best observed
    unit price ``MIN(l_extendedprice / l_quantity)`` per (part,
    supplier) — supplier-DEPENDENT, unlike Q9's retail proxy, so the
    argmin is non-trivial.

    Plan: one shuffle builds the (part, supplier) cost table from
    lineitem; dims (region-filtered supplier+nation, size/type-filtered
    part) broadcast into it; then the correlated ``= (SELECT MIN …)``
    becomes ``MIN() OVER (PARTITION BY p_partkey)`` + filter — the
    window reuses the aggregate's hash distribution on the already
    dim-pruned slice instead of re-scanning the fact (never a
    nested-loop re-execution per outer row). Ties on min cost are kept,
    as in standard Q2. Division is IEEE double in both engines, and MIN
    selects (not accumulates), so the equality filter is exact."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    supp_region = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    regional = ps.join(
        F.broadcast(supp_region), ps["l_suppkey"] == F.col("s_suppkey")
    ).join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])

    w = Window.partitionBy("p_partkey")
    return (
        regional.withColumn("_min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_brand", "supplycost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("nation").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


# --- Q7: volume shipping between two nations -------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


@REGISTRY.register("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (top_movies.py has no joins beyond SURVEY J1;
    this is the [EXT] J2 breadth tier). Both nation sides are broadcast
    so the pair-disjunction filter runs inside the fact stage; the only
    big shuffle is lineitem⋈orders on orderkey. Only nation (fixed 25
    rows) is hint-forced; supplier/customer strategy is left to the
    size-based planner + AQE, so at sf0.01 they broadcast but at 100 TB
    the same code degrades to co-partitioned shuffle joins instead of
    OOMing on a forced broadcast."""
    pair = ("NATION_1", "NATION_2")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    o = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n2 = n1.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("n2_name")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_nationkey"))
        .filter(F.col("n_name") != F.col("n2_name"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.col("n2_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_vol_dec()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share ---------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_7'
                     THEN CAST(volume AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 00:00:00'
) GROUP BY o_year ORDER BY o_year
"""


@REGISTRY.register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way star join, conditional-sum ratio. The
    p_type filter shrinks part before it joins, so the fact scan is
    pre-filtered by the most selective dimension first; only
    nation/region are hint-forced — part/supplier/customer broadcast
    only while the size-based planner + AQE say they fit, degrading to
    shuffle joins at scale. mkt_share divides two exact decimal sums
    (identical doubles both engines)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_7", _vol_dec()).otherwise(zero))
                .cast("double")
                / F.sum(_vol_dec()).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9: product-type profit (cost proxy) ----------------------------------

_Q9_ORACLE = """
SELECT nation, o_year, CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.8 * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) GROUP BY 1, 2 ORDER BY 1, 2
"""


@REGISTRY.register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape with ``0.8 * p_retailprice * l_quantity`` standing
    in for ps_supplycost (no partsupp table in the driver schema). The
    LIKE filter shrinks part ~25× before it joins (broadcast only
    while the size-based planner + AQE say it fits); profit arithmetic
    is plain double IEEE ops — identical expression tree both engines —
    then an exact decimal sum."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# --- Q11: important parts by value share -----------------------------------

_Q11_ORACLE = """
WITH natl AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(18,4)) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_0'
)
SELECT l_partkey, CAST(SUM(value) AS DOUBLE) AS part_value
FROM natl GROUP BY l_partkey
HAVING SUM(value) > (SELECT SUM(value) * 0.001 FROM natl)
ORDER BY part_value DESC, l_partkey LIMIT 100
"""


@REGISTRY.register("q11_important_parts", _Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global-scalar threshold
    (lineitem value standing in for partsupp inventory). The national
    slice is computed once, aggregated by part, and the 1-row global
    total joins back as a broadcast — no second fact scan. At 100 TB
    the per-part aggregate is the one shuffle; the threshold join is
    free."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    natl = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity"))
            .cast("decimal(18,4)")
            .alias("value"),
        )
    )
    per_part = natl.groupBy("l_partkey").agg(F.sum("value").alias("_sum"))
    total = per_part.agg(
        (F.sum("_sum") * F.lit(0.001)).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_sum") > F.col("_threshold"))
        .select("l_partkey", F.col("_sum").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
        .limit(100)
    )


# --- Q16: supplier count per part profile ----------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@REGISTRY.register("q16_supplier_part_profile", _Q16_ORACLE)
def q16_supplier_part_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per (brand, type, size)
    with a NOT-IN exclusion (negative-balance suppliers standing in for
    the complaint-comment filter). NOT IN over a null-free key = a
    broadcast LEFT ANTI join; the distinct count is Catalyst's
    two-level partial-distinct aggregate."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# --- Q20: heavy shippers of a part class -----------------------------------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_name, s.s_suppkey
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7', 'NATION_8')
  AND s.s_suppkey IN (
    SELECT l_suppkey FROM shipped
    WHERE qty > (SELECT AVG(qty) * 0.5 FROM shipped))
ORDER BY s.s_name
"""


@REGISTRY.register("q20_heavy_red_shippers", _Q20_ORACLE)
def q20_heavy_red_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested aggregated subquery feeding a semi-join
    (above-half-average shipped quantity standing in for the availqty
    threshold — no partsupp). ``shipped`` is aggregated once and reused
    for both the per-supplier totals and the global average; the final
    semi-join is a broadcast of ≤|suppliers| keys."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = shipped.agg((F.avg("qty") * F.lit(0.5)).alias("_thr"))
    heavy = (
        shipped.join(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("_thr"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7", "NATION_8")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(heavy), s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


# --- Q21: suppliers who kept orders waiting --------------------------------

_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_0'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


@REGISTRY.register("q21_waiting_suppliers", _Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest join topology in the suite —
    fact⋈fact⋈self-semi⋈self-anti. Lateness = shipped >60 days after
    order date (no l_commitdate/l_receiptdate in the driver schema).
    All three lineitem encounters hash on l_orderkey, so the semi and
    anti joins reuse the same partitioning as l1⋈orders — three
    co-partitioned shuffles, no broadcast of the fact. The correlated
    o_orderdate in the NOT EXISTS rides on the already-joined left
    side, so no extra orders join is needed."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    l1 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .filter(late)
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey"))
        & (F.col("l3_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )
