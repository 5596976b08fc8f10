"""Vector expression library over `array<float>` embedding columns.

Two paths:
  * exact decimal path — per-element products rounded to DECIMAL(.,12)
    then summed exactly, so dot products are order-independent and
    bit-identical to the DuckDB oracle. JVM-only (higher-order
    functions), used by oracle-checked queries.
  * numpy path (operators/similarity.py) — Arrow-batched matrix math,
    the actual 100 TB hot path.

Precision tiers (r10 optimization): Spark ``Decimal`` keeps values on
a compact unscaled LONG only while the declared precision is <= 18;
above that every interpreted higher-order-function step allocates a
``java.math.BigDecimal`` — measured 10x slower on the fold these
functions compile to (125k 64-dim dots: 11.8s at DECIMAL(28,12) vs
1.2s at DECIMAL(18,12), identical values on every row). Rounding is
the same HALF_UP at either precision, so for in-range values the two
types are value-identical and the narrow tier is pure speed.

``NARROW`` (DECIMAL(18,12), |value| < 10^6) is therefore used at every
call site whose operands are RAW embedding vectors: with element
magnitudes |x| <= B and dimension d, every per-element product and
every partial fold sum is bounded by d.B^2 — for the float32
embeddings this engine stores (B ~ 1, d = 64) that is < 10^2, a
scale-INDEPENDENT bound (dimension and element range do not grow with
the corpus), with the documented validity envelope d.B^2 < 10^6.

``_DEC`` (DECIMAL(28,12)) remains the default for operands whose
magnitude grows with the data — spherical k-means centroid SUM
vectors (element magnitude ~ cluster_size x B, unbounded at 100 TB)
and anything else un-audited. tests/test_vectors_narrow.py pins the
narrow/wide value equivalence across the envelope.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"
#: Long-backed fast tier — ONLY for operands with the d.B^2 < 10^6
#: bound documented above (raw embedding x raw embedding).
NARROW = "decimal(18,12)"


def _exact_sum(arr: Column, dec: str) -> Column:
    """Exact fold-sum of a decimal array (re-cast each step keeps the
    accumulator type fixed)."""
    return F.aggregate(
        arr,
        F.lit(0).cast(dec),
        lambda acc, x: (acc + x).cast(dec),
    )


def dot_exact_dec(a: Column, b: Column, dec: str = _DEC) -> Column:
    """Exact dot product kept as DECIMAL(.,12) — for callers that go
    on summing/comparing (ADC lookup sums, assignment argmax), where a
    premature double cast would reintroduce order dependence."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(dec)
    )
    return _exact_sum(prods, dec)


def norm_sq_exact_dec(a: Column, dec: str = _DEC) -> Column:
    sq = F.transform(
        a, lambda x: (x.cast("double") * x.cast("double")).cast(dec)
    )
    return _exact_sum(sq, dec)


def dot_exact(a: Column, b: Column, dec: str = _DEC) -> Column:
    return dot_exact_dec(a, b, dec).cast("double")


def norm_sq_exact(a: Column, dec: str = _DEC) -> Column:
    return norm_sq_exact_dec(a, dec).cast("double")


def cosine_exact(a: Column, b: Column, dec: str = _DEC) -> Column:
    return dot_exact(a, b, dec) / (
        F.sqrt(norm_sq_exact(a, dec)) * F.sqrt(norm_sq_exact(b, dec))
    )
