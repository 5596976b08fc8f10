"""Per-query best-of-N re-measure for the r10 optimization round.

Mimics bench.py methodology exactly (construct + full collect, warm
session, sf0.001 warm-up pass for the measured queries, cache cleared
between queries) so numbers are comparable to BENCH_FULL_r10_sf0.1.json,
but runs only the named queries — the tight measure/optimize loop of
spark_optimization_guide.md §1.

Usage: python tools/opt_measure.py [-n N] [sf_dir] query [query ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: F401,E402  (extends worker PYTHONPATH for protobuf)
from movie_rankings_spark.plans import all_queries  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    bad = [q for q in names if q not in all_queries.QUERIES]
    if bad or not names:
        print(f"unknown or missing queries: {bad}")
        return 2

    try:
        load0 = os.getloadavg()[0]
    except OSError:
        load0 = None
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("opt-measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from movie_rankings_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.normpath(sf_dir) != warm_dir:
        for q in names:
            all_queries.QUERIES[q](spark, warm_dir).collect()
            spark.catalog.clearCache()

    calib = bench.calibration_seconds(spark, sf_dir)
    out: dict[str, float] = {}
    for q in names:
        fn = all_queries.QUERIES[q]
        spark.sparkContext.setJobDescription(f"opt-measure: {q}")
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            rows = len(fn(spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        out[q] = round(best, 3)
        print(f"# {q}: {best:.3f}s rows={rows}", file=sys.stderr)
    print(
        json.dumps(
            {
                "queries": out,
                "calib": round(calib, 4),
                "load_avg_start": load0,
                "n": n,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
