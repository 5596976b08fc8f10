"""Capture the PER-ROUND physical plan of the iterative (Pregel-as-
join) operators, before/after the r10 adaptive state broadcast.

The registered queries materialize their loops during construction
(checkpoint/count actions), so ``tools/explain_batch.py`` on the final
DataFrame shows only a projection over checkpointed RDDs. This tool
rebuilds ONE round's join exactly as the operator does — state table
from a localCheckpoint (the LogicalRDD-no-stats shape the planner sees
mid-loop) joined against the static edge table — with and without the
``operators/adaptive.state_hint`` broadcast, and dumps both plans.

Usage: python tools/explain_round.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Writes plans/r10/pagerank_copurchase_round_{before,after}.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: F401,E402
from pyspark.sql import functions as F  # noqa: E402

from movie_rankings_spark.catalog import load_table  # noqa: E402
from movie_rankings_spark.operators.adaptive import state_hint  # noqa: E402
from movie_rankings_spark.operators.pagerank import copurchase_edges  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("explain-round")
    edges = copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    e = edges.select("src", "dst").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    weighted = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).persist()
    weighted.count()
    # the mid-loop state shape: a localCheckpoint'd LogicalRDD
    ranks = nodes.select(
        "node", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    c = F.round(F.col("rank") * F.col("w") * F.lit(1e15)).cast("long")
    outdir = os.path.join("/root/repo", "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    for suffix, state in (
        ("before", ranks),
        ("after", state_hint(ranks, n)),
    ):
        contribs = (
            weighted.join(state, weighted["src"] == state["node"])
            .select("dst", c.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        path = os.path.join(
            outdir, f"pagerank_copurchase_round_{suffix}.txt"
        )
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(
                f"# ONE pagerank round's contribs plan ({suffix} the r10\n"
                f"# adaptive state broadcast), n_nodes={n}, sf_dir={sf_dir}\n"
            )
            fh.write(_fmt(contribs))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
