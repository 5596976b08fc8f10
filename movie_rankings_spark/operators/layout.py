"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

Parquet row-group and file skipping works off min/max stats, which a
single-column sort only makes selective for that one column. Bit-
interleaving two key columns into a Morton code and range-partitioning
on it clusters the data so that BOTH columns have tight per-file
min/max ranges — point/range predicates on either dimension then prune
most files at scan time (the same layout trick Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``; here built from primitives).

Everything is closed-form integer bit math on JVM codegen expressions
(shiftleft/shiftright/AND/OR folded into one projection) — no UDF, no
extra shuffle beyond the one range-exchange the re-layout write pays
anyway. At 100 TB the write is a full re-shuffle by design (that IS
the layout change); the payoff is every subsequent scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension (z-value fits comfortably in a long)
ZBITS = 16


def morton_interleave(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: ``a``'s
    bit i lands at position 2i+1, ``b``'s at 2i. Clamps each input to
    its low bits first, so out-of-range keys degrade to wraparound
    rather than overflow."""
    a = a.bitwiseAND(F.lit((1 << bits) - 1))
    b = b.bitwiseAND(F.lit((1 << bits) - 1))
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def zorder_bucket_stats(
    df: DataFrame, a: Column, b: Column, bucket_shift: int = 20
) -> DataFrame:
    """Per-z-bucket occupancy and min/max of both dimensions — the
    stats a file-skipping reader would see if each bucket were one
    file. Buckets are fixed-width slices of the Morton range
    (``z >> bucket_shift``), so the result is engine-neutral and
    oracle-checkable, unlike Spark's internal range-partition bounds.
    """
    z = morton_interleave(a, b)
    return (
        df.select(
            F.shiftright(z, bucket_shift).alias("z_bucket"),
            a.alias("_a"),
            b.alias("_b"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_a").alias("a_min"),
            F.max("_a").alias("a_max"),
            F.min("_b").alias("b_min"),
            F.max("_b").alias("b_max"),
        )
        .orderBy("z_bucket")
    )


def write_zordered(df: DataFrame, a: Column, b: Column, path: str, files: int = 8):
    """Re-layout ``df`` into ``files`` parquet files clustered on the
    Morton curve of (a, b): range-exchange on the z-value balances
    file sizes from a sampled distribution, the within-partition sort
    tightens row-group stats inside each file."""
    z = morton_interleave(a, b).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_sql(a: str, b: str, bits: int = ZBITS) -> str:
    """The identical interleave as DuckDB SQL (oracle side)."""
    a = f"({a} & {(1 << bits) - 1})"
    b = f"({b} & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"
