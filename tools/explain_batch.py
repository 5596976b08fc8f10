"""Dump .explain('formatted') for a list of queries to plans/r10/.

Usage: python tools/explain_batch.py <suffix> <query> [query ...]
  suffix: 'before' or 'after' — output file is plans/r10/<query>_<suffix>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: F401,E402
from movie_rankings_spark.plans.all_queries import QUERIES  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("explain-batch")
    outdir = os.path.join("/root/repo", "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
