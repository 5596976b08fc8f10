"""Scratch experiment (r10): A/B the transformWithStateInPandas
queries' state-store partitioning and RocksDB changelog checkpointing.
Uses the REAL registered query functions; run_to_batch is wrapped so
state_partitions can be overridden per configuration.

Usage: python tools/exp_stream_tws.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import bench  # noqa: F401,E402
from movie_rankings_spark.plans import all_queries  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402
import movie_rankings_spark.streaming.events as ev  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("exp-stream-tws")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.range(1000).mapInPandas(lambda it: it, "id long").count()

QUERIES = [
    "stream_tws_session_timeout",
    "stream_tws_lastk_events",
    "stream_transform_with_state",
]

_orig_rtb = ev.run_to_batch

_CHANGELOG = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def set_sp(sp):
    def patched(df, output_mode="complete", name=None, state_partitions=8):
        # keep the declared JVM-state default; override only the
        # None ("session default") Python-state path
        eff = sp if state_partitions is None else state_partitions
        return _orig_rtb(df, output_mode, name, eff)

    ev.run_to_batch = patched


def timeq(q, n=2):
    fn = all_queries.QUERIES[q]
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        rows = len(fn(spark, sf_dir).collect())
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best, rows


# warm-up at sf0.001
for q in QUERIES:
    all_queries.QUERIES[q](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

for label, sp, changelog in [
    ("base sp=None(32)", None, False),
    ("sp=8", 8, False),
    ("sp=16", 16, False),
    ("sp=8+changelog", 8, True),
    ("sp=None+changelog", None, True),
]:
    set_sp(sp)
    spark.conf.set(_CHANGELOG, "true" if changelog else "false")
    for q in QUERIES:
        best, rows = timeq(q)
        print(f"{label:22s} {q:32s} {best:6.2f}s rows={rows}", flush=True)
ev.run_to_batch = _orig_rtb
