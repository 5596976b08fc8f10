"""Market-basket association rules over order baskets.

The statistics layer on top of the co-purchase graph tier
(pagerank/triangles use the same edges): for item pairs bought in the
same order, emit support / confidence / lift — the classic
recommendation & assortment signal, and at corpus scale the shape
matters more than the formula:

  1. Distinct (basket, item) — dedups line-level repeats so a basket
     contributes one unit of support per item.
  2. FREQUENT-ITEM PREFILTER (the a-priori property): an item below
     min_item_support cannot appear in any frequent pair, so the
     quadratic within-basket pair join runs over frequent items only.
     This is what bounds the explode — a 100-item basket of long-tail
     items generates zero pairs.
  3. Within-basket pair self-join (a < b) + pair-count aggregate.
  4. Rules in both directions with confidence n_ab/n_antecedent and
     lift N·n_ab/(n_a·n_b).

Shuffles: item-support agg, basket self-join on the basket key, pair
agg — each linear in its input. Basket-size skew (one giant order)
is the known hazard: the prefilter caps it in practice and AQE
skew-join handles the residue; a hard per-basket item cap is the
documented escape hatch for adversarial data.

Exactness: all counts are integers; confidence/lift are double
ratios of exact bigints — bit-reproducible in DuckDB, so the query is
value-hash checked.

Reference scope: north-star [EXT] tier (reference has no basket
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 20,
    min_pair_support: int = 3,
) -> DataFrame:
    """Rules (antecedent → consequent) over co-occurring item pairs.

    Columns: antecedent, consequent, n_antecedent, n_consequent,
    n_both, n_baskets, confidence, lift."""
    # persisted: the basket-count scalar, the item-support aggregate,
    # and the frequent-item join all read it — uncached, the fact
    # would be scanned three times.
    bi = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .persist_tracked()
    )
    n_baskets = bi.agg(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    support = (
        bi.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .filter(F.col("n_item") >= min_item_support)
    )
    frequent = bi.join(support, "item").select("basket", "item", "n_item")
    a = frequent.select(
        "basket", F.col("item").alias("ia"), F.col("n_item").alias("n_a")
    )
    b = frequent.select(
        "basket", F.col("item").alias("ib"), F.col("n_item").alias("n_b")
    )
    pairs = (
        a.join(b, "basket")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(
            F.count(F.lit(1)).alias("n_both"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .filter(F.col("n_both") >= min_pair_support)
    )
    fwd = pairs.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        F.col("n_a").alias("n_antecedent"),
        F.col("n_b").alias("n_consequent"),
        "n_both",
    )
    rev = pairs.select(
        F.col("ib").alias("antecedent"),
        F.col("ia").alias("consequent"),
        F.col("n_b").alias("n_antecedent"),
        F.col("n_a").alias("n_consequent"),
        "n_both",
    )
    rules = fwd.unionByName(rev).crossJoin(F.broadcast(n_baskets))
    conf = F.col("n_both").cast("double") / F.col("n_antecedent").cast("double")
    lift = (
        F.col("n_both").cast("double") * F.col("n_baskets").cast("double")
    ) / (F.col("n_antecedent").cast("double") * F.col("n_consequent").cast("double"))
    return rules.select(
        "antecedent",
        "consequent",
        "n_antecedent",
        "n_consequent",
        "n_both",
        "n_baskets",
        conf.alias("confidence"),
        lift.alias("lift"),
    )


def item_cosine_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_item_support: int = 20,
    min_pair_support: int = 3,
    max_basket: int = 100,
) -> DataFrame:
    """Item-item collaborative filtering: per item the top-k most
    similar items by binary cosine over the basket sets —
    cos(i,j) = n_both / √(n_i·n_j) — the "users who bought X also
    bought Y" neighborhood model next to association_rules'
    confidence/lift (lift normalizes by independence, cosine by
    SIZE, so it doesn't collapse onto the most popular items).

    Scale shape (the association_rules conventions, plus the item-CF
    power-user guard): distinct (basket, item) → a-priori frequent-
    item prefilter → baskets larger than ``max_basket`` SURVIVING
    items are dropped entirely (a 10⁴-item basket contributes
    O(10⁸) pairs and no signal — the standard CF pruning; the knob
    to raise with executor memory), then the within-basket a<b pair
    self-join, pair-count aggregate, and a per-item top-k window
    over both pair directions (partitioned by item — never a global
    sort). Exactness: counts exact BIGINTs; cosine one IEEE
    expression of exact integers; ranking ties break (cosine desc,
    n_both desc, neighbor asc).

    Output: item, rank, neighbor, n_item, n_neighbor, n_both,
    cosine — ordered by (item, rank)."""
    from pyspark.sql import Window

    bi = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .persist_tracked()  # support agg + frequent join read this
    )
    support = (
        bi.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_item"))
        .filter(F.col("n_item") >= min_item_support)
    )
    frequent = bi.join(support, "item").select("basket", "item", "n_item")
    sized = (
        frequent.withColumn(
            "_bsz", F.count(F.lit(1)).over(Window.partitionBy("basket"))
        )
        .filter(F.col("_bsz") <= max_basket)
        .drop("_bsz")
    )
    a = sized.select(
        "basket", F.col("item").alias("ia"), F.col("n_item").alias("n_a")
    )
    b = sized.select(
        "basket", F.col("item").alias("ib"), F.col("n_item").alias("n_b")
    )
    pairs = (
        a.join(b, "basket")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_both"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .filter(F.col("n_both") >= min_pair_support)
    )
    fwd = pairs.select(
        F.col("ia").alias("item"),
        F.col("ib").alias("neighbor"),
        F.col("n_a").alias("n_item"),
        F.col("n_b").alias("n_neighbor"),
        "n_both",
    )
    rev = pairs.select(
        F.col("ib").alias("item"),
        F.col("ia").alias("neighbor"),
        F.col("n_b").alias("n_item"),
        F.col("n_a").alias("n_neighbor"),
        "n_both",
    )
    cosine = F.col("n_both").cast("double") / F.sqrt(
        F.col("n_item").cast("double") * F.col("n_neighbor").cast("double")
    )
    scored = fwd.unionByName(rev).withColumn("cosine", cosine)
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("n_both").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item",
            F.col("rank").cast("int").alias("rank"),
            "neighbor",
            "n_item",
            "n_neighbor",
            "n_both",
            "cosine",
        )
        .orderBy("item", "rank")
    )
