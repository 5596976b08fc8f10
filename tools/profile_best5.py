"""Best-of-5 quiet re-measure + stage profile for the r8 watch items
(VERDICT r8 item 4): mood_median_doclen_source,
stream_tws_session_timeout, survival_logrank_segment,
mahalanobis_segment_profile at sf0.1, with uptime/loadavg recorded,
plus a Spark-UI REST stage profile (the r7 cms/dsir method) for
stream_tws_session_timeout.

Run ONLY on a quiet box with no other Spark session alive.

Usage: python tools/profile_best5.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

WATCH = (
    "mood_median_doclen_source",
    "survival_logrank_segment",
    "mahalanobis_segment_profile",
    "stream_tws_session_timeout",
)

PROFILE = "stream_tws_session_timeout"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = tuple(sys.argv[2:]) or WATCH

    # import the package BEFORE the session: _ensure_protobuf() must
    # extend the worker PYTHONPATH before the JVM captures the env,
    # or transformWithState's streaming python runner can't import
    # the vendored protobuf
    import bench  # noqa: F401
    from movie_rankings_spark.plans import all_queries  # noqa: F401

    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-best5")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")  # REST stage profile
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    print(f"# uptime/load: {os.getloadavg()}", file=sys.stderr)
    # warm: tables + one run of each target at sf0.001
    from movie_rankings_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    for name in names:
        all_queries.QUERIES[name](spark, "/root/testdata/sf0.001").collect()

    calib = bench.calibration_seconds(spark, sf_dir)
    out = {
        "sf_dir": sf_dir,
        "calibration_seconds": round(calib, 4),
        "calibration_anchor": bench._calibration_anchor("/root/repo"),
        "load_avg_1_5_15": list(os.getloadavg()),
        "best_of_5": {},
        "runs": {},
    }

    ui = "http://localhost:4040/api/v1"
    with urllib.request.urlopen(f"{ui}/applications") as r:
        app_id = json.load(r)[0]["id"]

    def stage_totals() -> dict[str, float]:
        with urllib.request.urlopen(
            f"{ui}/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        return {
            "n_stages": len(stages),
            "executorRunTime_s": sum(s["executorRunTime"] for s in stages)
            / 1000.0,
            "executorCpuTime_s": sum(s["executorCpuTime"] for s in stages)
            / 1e9,
        }

    for name in names:
        fn = all_queries.QUERIES[name]
        runs = []
        before = stage_totals() if name == PROFILE else None
        for _ in range(5):
            start = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - start, 4))
            spark.catalog.clearCache()
        out["runs"][name] = runs
        out["best_of_5"][name] = min(runs)
        if before is not None:
            after = stage_totals()
            out["stage_profile"] = {
                "query": name,
                "stages_5_runs": after["n_stages"] - before["n_stages"],
                "executorRunTime_s_5_runs": round(
                    after["executorRunTime_s"] - before["executorRunTime_s"], 2
                ),
                "executorCpuTime_s_5_runs": round(
                    after["executorCpuTime_s"] - before["executorCpuTime_s"], 2
                ),
            }
        print(f"# {name}: best {min(runs):.3f}s runs={runs}", file=sys.stderr)

    out["load_avg_after"] = list(os.getloadavg())
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
