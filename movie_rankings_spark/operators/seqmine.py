"""Sequential pattern mining — support counting for ordered event-type
patterns inside per-entity event sequences.

Reference parity: no sequence surface exists in the reference
(top_movies.py); this is the discovery companion to the fixed funnels
(operators/funnel.py) and the session transition matrix
(operators/sessionize.py): instead of checking ONE hand-picked ordered
pattern, it scores EVERY type triple by the share of sequences that
contain it in order — the candidate-generation step of GSP/PrefixSpan
(Srikant & Agrawal 1996; Pei et al. 2001) restricted to length-3
patterns, which is the pattern length funnels actually consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sequence_triple_support(
    events: DataFrame,
    scope_cols: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Support of every ordered event-type triple (a, b, c): the
    number of scopes (sequences) containing events typed a, b, c at
    STRICTLY increasing timestamps, over all |types|³ candidates
    (repeated types allowed — (view, view, purchase) is a real
    pattern).

    The existence test never enumerates event triples: a scope
    contains (a, b, c) in order ⟺ it has a b-typed event strictly
    inside the open interval (min ts of a, max ts of c) — pick the
    a-event at its minimum and the c-event at its maximum to complete
    any such witness, and conversely any ordered triple's b sits in
    that interval. Ties in ts are NOT ordered (strict <), which keeps
    the predicate a pure function of timestamp values — deterministic
    across engines with no tiebreak column.

    Shape: TWO fact scans by design — one groupBy to the per-(scope,
    type) min/max table, one slim (scope, type, ts) projection probed
    against it. The probe joins each event to its scope's |types|²
    (a, c) interval rows — a BOUNDED ×|types|² blow-up (the same
    budget as the A83/A84 domain grids) — then distinct + count
    aggregate with map-side combine; no window, no per-scope sort,
    no event-triple enumeration anywhere. The min/max table is
    persisted: it feeds both the interval grid and the
    total-sequence count, and is |types|× smaller than the fact.

    Exactness: supports are exact longs; the support ratio is one
    correctly-rounded division ⇒ value-hash exact.

    Output: one row per triple with support ≥ 1 — a, b, c,
    n_sequences, n_total_sequences, support (fraction of all
    sequences).
    """
    sc = [F.col(c) for c in scope_cols]
    ev = events.select(
        *sc,
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("m"),
    ).filter(F.col("t").isNotNull() & F.col("m").isNotNull())
    pt = (
        ev.groupBy(*scope_cols, "t")
        .agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
        .persist_tracked()
    )
    tot = (
        pt.select(*scope_cols)
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_total_sequences"))
    )
    p1 = pt.select(*scope_cols, F.col("t").alias("a"), "mn")
    p3 = pt.select(*scope_cols, F.col("t").alias("c"), "mx")
    ac = p1.join(p3, scope_cols)
    tr = (
        ev.join(ac, scope_cols)
        .filter((F.col("m") > F.col("mn")) & (F.col("m") < F.col("mx")))
        .select(*scope_cols, "a", F.col("t").alias("b"), "c")
        .distinct()
    )
    sup = tr.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_sequences")
    )
    return (
        sup.crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "c",
            "n_sequences",
            "n_total_sequences",
            (
                F.col("n_sequences").cast("double")
                / F.col("n_total_sequences").cast("double")
            ).alias("support"),
        )
        .orderBy(F.col("n_sequences").desc(), "a", "b", "c")
    )
