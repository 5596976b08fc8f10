"""Salted two-phase per-group top-k — the skew-safe form.

A plain ``row_number().over(partitionBy(group))`` sends every row of a
group to ONE reducer; a hot group (power-law keys are the norm in web
and LLM corpora) serializes the whole query behind that task. The
salted form:

  phase 1: shuffle on (group, salt) — a hot group spreads over
           ``salt_buckets`` tasks; keep the per-salt top-k
           (WindowGroupLimit prunes before this shuffle too);
  phase 2: shuffle only the surviving ≤ k × salt_buckets candidates
           per group and take the true top-k.

Correct for any k: a group's true top-k rows each rank ≤ k within
their own salt bucket, so phase 1 never discards them. The salt is a
deterministic value hash — no RNG, stable across retries (a
requirement for task re-execution at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_group_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    salt_cols: Sequence[str],
    k: int,
    salt_buckets: int = 8,
    rank_col: str = "rk",
) -> DataFrame:
    """Per-group top-k by ``order_by`` (must be a total order within
    each group — include a unique tie-breaker). ``salt_cols`` are the
    hashed-for-salt columns; any value-bearing column works, spreading
    rows of one group across buckets."""
    group_cols = list(group_cols)
    order_by = list(order_by)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))

    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    candidates = (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_salt", "_rk1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        candidates.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
