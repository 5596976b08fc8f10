"""Join-key skew profiling — the observability pass you run BEFORE
picking a join strategy at 100 TB.

Every shuffle join / aggregation hashes on a key; a power-law key
makes one reducer the straggler. This operator reports, per candidate
key, the frequency-distribution facts that decide the mitigation:
max/avg ratio (skew factor → salting or AQE skew-join), top-1 share
(→ broadcast the hot key's rows separately), key cardinality
(→ broadcast vs shuffle side choice).

Plan: one groupBy(key).count() shuffle (map-side combine makes the
shuffle O(distinct keys)), then a single-row aggregate of the count
distribution. Moments use exact integer/decimal sums, and the final
stddev/ratio formulas are double arithmetic written identically in
the DuckDB oracle — the same exactness contract as anomaly_zscore.

Reference scope: north-star [EXT] observability tier (the reference
has no profiling surface; `top_movies.py` operates on 30 rows).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str, label: str) -> DataFrame:
    """One row of skew statistics for `df` grouped by `key`."""
    counts = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("n"))
    agg = counts.agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("n").cast("decimal(28,0)").alias("s"),
        F.sum(F.col("n").cast("decimal(18,0)") * F.col("n"))
        .cast("decimal(38,0)")
        .alias("ss"),
        F.max("n").alias("mx"),
        F.min("n").alias("mn"),
    )
    avg = agg["s"].cast("double") / agg["nk"]
    return agg.select(
        F.lit(label).alias("key_name"),
        F.col("nk").cast("long").alias("n_keys"),
        F.col("s").cast("long").alias("total_rows"),
        F.col("mx").cast("long").alias("max_rows"),
        F.col("mn").cast("long").alias("min_rows"),
        avg.alias("avg_rows"),
        F.sqrt(
            F.greatest(
                F.col("ss").cast("double") / F.col("nk") - avg * avg, F.lit(0.0)
            )
        ).alias("stddev_rows"),
        (F.col("mx").cast("double") / avg).alias("skew_factor"),
        (F.col("mx").cast("double") / F.col("s").cast("double")).alias("top_share"),
    )


def skew_profiles(profiles: list[DataFrame]) -> DataFrame:
    """Union of per-key profiles — each input is an independent
    scan+shuffle; the union is row-count len(profiles)."""
    return reduce(lambda a, b: a.unionByName(b), profiles)


def column_ndv_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column NDV in ONE scan: stack (column, value-string)
    pairs with a single explode, distinct, then count per column —
    every phase a HashAggregate with map-side combine; the shuffle is
    NDV-sized, never fact-sized. Exposed separately so audit queries
    that already have the counts/min-max (e.g. the approx profile's
    in-query HLL-error gate) can buy exact NDV for one scan instead
    of re-running the full two-scan exact profile."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return (
        stacked.filter(F.col("v").isNotNull())
        .distinct()
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def column_profile(
    df: DataFrame, renders: dict[str, object], exact: bool = True
) -> DataFrame:
    """ANALYZE-TABLE-style per-column statistics in ONE aggregate pass:
    one row per profiled column with n_rows, n_nulls, n_distinct, and
    min/max rendered to engine-portable strings.

    `renders` maps column name → a function(Column) -> Column that
    renders min/max to a string deterministically across engines
    (doubles via DECIMAL(18,4), timestamps via cast — bare double→
    string formatting differs between engines).

    Plan shape — two column-pruned scans, hash aggregates only, no
    sort over fact-sized data:

      1. counts + native-ordered min/max for every column in one
         grouping-free aggregate (min/max compare in the column's own
         type and render AFTER — a string-stacked min would order
         numerics lexicographically). No grouping keys ⇒ even the
         string-buffer SortAggregate fallback inserts no Sort.
      2. exact NDV via a stacked (column, value-string) explode →
         distinct → per-column count: every phase is a HashAggregate
         with map-side combine; the shuffle is NDV-sized.

    The obvious one-scan alternative — N count(distinct) in one
    aggregate — compiles to an Expand (×N+1 row multiply) feeding
    SortAggregates KEYED on the value columns (string buffers forbid
    hash aggregation), i.e. two full sorts of N× the fact: measured
    5.1 s vs ~1 s for this form at sf0.1. At 100 TB swap step 2 for
    approx_count_distinct inside step 1 (HLL partials hash-aggregate
    fine) — one scan, same schema, approximate NDV. That 100 TB form
    is `exact=False` (r4): HLL NDV folded into pass 1, exactly one
    scan of the fact, identical output schema."""
    cols = list(renders)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        render = renders[c]
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            render(F.min(c)).cast("string").alias(f"{c}__min"),
            render(F.max(c)).cast("string").alias(f"{c}__max"),
        ]
        if not exact:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__ndv"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).cast("long").alias("n_nulls"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                *(
                    []
                    if exact
                    else [F.col(f"{c}__ndv").cast("long").alias("n_distinct")]
                ),
            )
            for c in cols
        ]
    )
    base = row.select(F.explode(per_col).alias("p")).select("p.*")
    if not exact:
        return base.select(
            "column",
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        ).orderBy("column")

    ndv = column_ndv_exact(df, cols)
    return (
        base.join(F.broadcast(ndv), "column", "left")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias(
                "n_distinct"
            ),
            "min_value",
            "max_value",
        )
        .orderBy("column")
    )
