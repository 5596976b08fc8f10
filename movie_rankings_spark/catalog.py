"""Table catalog over the driver's synthetic parquet tables.

Schemas documented in FIXTURES.md §B. All reads are plain
``spark.read.parquet`` so Catalyst gets native filter pushdown and
column pruning for free — never pre-materialize or cache here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: scans below this on-disk size never fan out (dimension tables —
#: region/nation/supplier — are broadcast-side everywhere; an extra
#: exchange would be pure overhead)
_FANOUT_MIN_BYTES = int(os.environ.get("MRS_SCAN_FANOUT_MIN_BYTES", "65536"))

#: hash-repartition key per table: a (near-)unique id, so the spread
#: is even; HASH partitioning (not round-robin) because it is
#: deterministic per row (retry-safe with no sort-before-repartition
#: pass — round-robin pays a single-threaded local sort of the whole
#: scan first) and downstream ops keyed the same way reuse it
_FANOUT_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _fanout_small_scan(df: DataFrame, path: str, key: str | None) -> DataFrame:
    """Widen an UNSPLITTABLE small scan to the session's core count
    (r10; guide §2.5 "input skew: one huge unsplittable file …
    repartition immediately after the read", §6 scan parallelism).

    The bench parquet files are written as a SINGLE row group, and a
    parquet scan can only split at row-group boundaries — so no
    maxPartitionBytes / minPartitionNum setting can widen it, and
    every scan-side projection, filter, explode, regex, hash and
    partial aggregate of every query runs in ONE task while the other
    31 cores idle (measured: the exact-decimal assignment fold went
    4.3 s → 0.8 s with this fan-out; q1-style partial aggregates are
    single-threaded without it).

    Gated on the MEASURED scan partitioning: the round-robin exchange
    is added only when the scan yields fewer splits than the session
    has cores, so on real deployments — many files / many row groups
    — this is the identity and the plan is byte-for-byte what it was.
    Values are partitioning-independent by this engine's exactness
    conventions (decimal/integer aggregates, order-stated windows),
    re-verified for every registered query against the DuckDB oracle
    after the change. MRS_SCAN_FANOUT=0 disables (A/B knob)."""
    if os.environ.get("MRS_SCAN_FANOUT", "1") == "0":
        return df
    try:
        if os.path.getsize(path) < _FANOUT_MIN_BYTES:
            return df
    except OSError:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        return df.repartition(target, df[key])
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    path = table_path(sf_dir, name)
    return _fanout_small_scan(
        spark.read.parquet(path), path, _FANOUT_KEY.get(name)
    )


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet. Depending on the Spark
    build, that column surfaces as either raw nanos BIGINT (older 4.x
    honoring spark.sql.legacy.parquet.nanosAsLong, set in session.py)
    or natively as TIMESTAMP_NTZ truncated to micros (4.1+, where the
    legacy conf is inert). Both paths normalize to a plain TIMESTAMP at
    microsecond precision — bit-identical to DuckDB's epoch_us(ts), so
    oracle comparisons agree regardless of build."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = table_path(sf_dir, "events")
    raw = spark.read.parquet(path)
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        out = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        out = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return _fanout_small_scan(out, path, _FANOUT_KEY.get("events"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
