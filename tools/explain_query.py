#!/usr/bin/env python
"""Dump the physical plan of any registered query.

Usage: python tools/explain_query.py <query_name> [sf_dir] [mode]
  mode: simple (default) | formatted | extended | cost | codegen
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from movie_rankings_spark.plans.all_queries import QUERIES  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in QUERIES:
        print(f"usage: {sys.argv[0]} <query> [sf_dir] [mode]; known:")
        print("  " + "\n  ".join(sorted(QUERIES)))
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mode = sys.argv[3] if len(sys.argv) > 3 else "simple"
    spark = get_spark("explain")
    df = QUERIES[name](spark, sf_dir)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
