"""Functional-dependency profiling — does column A determine column B?

Reference parity: no profiling surface exists in the reference
(top_movies.py); this extends the data-profiling tier (A14 skew
profiler, A25 column profile) with the dependency-discovery check a
schema-inference / data-quality engine runs (the pairwise core of
Metanome-style FD discovery): for each candidate (lhs → rhs) pair,
how many lhs groups map to more than one rhs value, and how many rows
sit in those violating groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_violations(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Violation profile of candidate functional dependencies: for
    every (lhs, rhs) pair, lhs → rhs holds iff no lhs value
    co-occurs with two distinct rhs values. Reports, per pair, the
    group counts a cleaning pipeline triages by: total lhs groups,
    violating groups, rows inside violating groups, and the largest
    rhs fan-out.

    Shape: ONE fact scan — each row explodes into |pairs| stacked
    (pair, lhs-string, rhs-string) structs (a BOUNDED ×|pairs|
    blow-up, the A25 stacked-NDV convention), then two map-side-
    combined hash aggregates roll (pair, lhs, rhs) → (pair, lhs) →
    pair; every shuffle after the first is group-sized, never
    fact-sized, and no pair gets its own scan. Rows where either
    side is NULL are excluded (NULL determines nothing).

    Exactness: all counts exact longs ⇒ value-hash exact.

    Output: one row per pair — lhs, rhs, n_groups,
    n_violating_groups, n_violating_rows, max_rhs_per_group,
    fd_holds — ordered by (lhs, rhs).
    """
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # the explode multiplies rows ×|pairs| after the scan; spread the
    # input across the shuffle width first so a single small parquet
    # file doesn't serialize the whole blow-up into one task
    stacked = df.repartition(n_shuffle).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lhs).alias("lhs"),
                        F.lit(rhs).alias("rhs"),
                        F.col(lhs).cast("string").alias("lv"),
                        F.col(rhs).cast("string").alias("rv"),
                    )
                    for lhs, rhs in pairs
                ]
            )
        ).alias("s")
    ).select("s.*").filter(
        F.col("lv").isNotNull() & F.col("rv").isNotNull()
    )
    cells = stacked.groupBy("lhs", "rhs", "lv", "rv").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    groups = cells.groupBy("lhs", "rhs", "lv").agg(
        F.count(F.lit(1)).cast("long").alias("n_rhs"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    return (
        groups.groupBy("lhs", "rhs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("n_violating_rows"),
            F.max("n_rhs").cast("long").alias("max_rhs_per_group"),
        )
        .select(
            "lhs",
            "rhs",
            "n_groups",
            "n_violating_groups",
            "n_violating_rows",
            "max_rhs_per_group",
            (F.col("n_violating_groups") == 0).alias("fd_holds"),
        )
        .orderBy("lhs", "rhs")
    )


def inclusion_dependencies(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table INCLUSION-dependency check — the referential-
    integrity half of schema profiling (fd_violations is the
    intra-table half): for each candidate (dependent column ⊆
    referenced column) pair, does every non-NULL dependent value
    appear in the referenced column, and if not, how many distinct
    values are dangling? The Metanome-style IND primitive a
    foreign-key discovery / data-contract engine runs per release.

    ``pairs``: (label, dependent_df, dep_col, referenced_df, ref_col).

    Shape: per pair, BOTH sides reduce to column-pruned DISTINCT
    value tables (map-side combined, shuffle ∝ distinct values, never
    rows), then ONE left-anti join counts dangling values; the
    per-pair results (1 row each) union into the report. The pair
    list is bounded and declared — no schema-wide quadratic sweep.
    Values compare as strings (cross-type candidates stay checkable).

    Exactness: counts exact longs; the violation share is one IEEE
    division. Output: one row per pair — pair_label, dep_column,
    ref_column, n_distinct_dep, n_dangling, dangling_share,
    ind_holds — ordered by pair_label."""
    outs = []
    for label, dep_df, dep_col, ref_df, ref_col in pairs:
        dep = (
            dep_df.select(F.col(dep_col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .persist_tracked()  # the distinct count AND the anti join read this
        )
        ref = (
            ref_df.select(F.col(ref_col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        dangling = dep.join(ref, "v", "left_anti")
        outs.append(
            dep.agg(F.count(F.lit(1)).cast("long").alias("n_distinct_dep"))
            .crossJoin(
                F.broadcast(
                    dangling.agg(
                        F.count(F.lit(1)).cast("long").alias("n_dangling")
                    )
                )
            )
            .select(
                F.lit(label).alias("pair_label"),
                F.lit(dep_col).alias("dep_column"),
                F.lit(ref_col).alias("ref_column"),
                "n_distinct_dep",
                "n_dangling",
                F.try_divide(
                    F.col("n_dangling").cast("double"),
                    F.col("n_distinct_dep").cast("double"),
                ).alias("dangling_share"),
                (F.col("n_dangling") == 0).alias("ind_holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("pair_label")
