"""As-of (temporal latest-prior) join — an operator Spark lacks natively.

Semantics: for every left row, attach the payload of the right row with
the greatest ``ts`` satisfying ``right.ts < left.ts`` (strict, the
default) or ``<=`` within the same key group; null payload when no such
row exists (LEFT ASOF JOIN).

Implementation is the scalable union-and-window form, NOT a range join:
both sides are unioned on (keys, ts), sorted once per key, and the
payload is carried forward with ``last(payload, ignorenulls=True)``
over a running frame. Cost is one shuffle + sort on the key — identical
to a single window function — versus the candidate explosion of a
``l.ts > r.ts`` theta-join, which at 100 TB is quadratic per key. Late
boundary handling: on equal ``ts`` the left row sorts BEFORE right rows
(strict) so a same-timestamp right row is not visible to it.

Determinism contract: callers must ensure at most one right row per
(keys, ts) — pre-deduplicate otherwise — because ties at the same
timestamp have no defined winner in any as-of engine (DuckDB included).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    *,
    strict: bool = True,
    prefix: str = "prev_",
) -> DataFrame:
    """LEFT ASOF JOIN: left columns + ``prefix``-renamed payload columns
    from the latest-prior right row per key group."""
    keys = list(keys)
    left_cols = left.columns

    l2 = left.select(
        *[F.col(c) for c in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_q"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
    )
    r2 = right.select(
        *[F.col(c) for c in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_q"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    # strict: left rows sort before right rows at equal ts, so a
    # same-ts right row is outside the running frame; non-strict: after.
    q_order = F.col("_q").desc() if strict else F.col("_q").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), q_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_prev", F.last("_p", ignorenulls=True).over(w))

    return carried.filter(F.col("_q") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[F.col(f"_prev.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
