"""Vector expression library over `array<float>` embedding columns.

Two paths:
  * exact decimal path — per-element products rounded to DECIMAL(28,12)
    then summed exactly, so dot products are order-independent and
    bit-identical to the DuckDB oracle. JVM-only (higher-order
    functions), used by oracle-checked queries.
  * numpy path (operators/similarity.py) — Arrow-batched matrix math,
    the actual 100 TB hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def _exact_sum(arr: Column) -> Column:
    """Exact fold-sum of a decimal array (re-cast each step keeps the
    accumulator type fixed)."""
    return F.aggregate(
        arr,
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + x).cast(_DEC),
    )


def dot_exact_dec(a: Column, b: Column) -> Column:
    """Exact dot product kept as DECIMAL(28,12) — for callers that go
    on summing/comparing (ADC lookup sums, assignment argmax), where a
    premature double cast would reintroduce order dependence."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    return _exact_sum(prods)


def norm_sq_exact_dec(a: Column) -> Column:
    sq = F.transform(
        a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC)
    )
    return _exact_sum(sq)


def dot_exact(a: Column, b: Column) -> Column:
    return dot_exact_dec(a, b).cast("double")


def norm_sq_exact(a: Column) -> Column:
    return norm_sq_exact_dec(a).cast("double")


def cosine_exact(a: Column, b: Column) -> Column:
    return dot_exact(a, b) / (
        F.sqrt(norm_sq_exact(a)) * F.sqrt(norm_sq_exact(b))
    )
