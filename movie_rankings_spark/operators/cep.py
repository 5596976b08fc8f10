"""Complex-event-processing pattern matching over per-key event
sequences — the batch MATCH_RECOGNIZE / FlinkCEP primitive: encode
each key's time-ordered event types as a symbol string and count the
non-overlapping regex matches. "How many view…→click→purchase journeys
did each user complete?" asked as a PATTERN, not as the fixed
three-stage funnel the funnel tier hard-codes — any regular
expression over the event alphabet works (retries: `e+s`, abandoned
carts: `c+[^p]*$`, …).

Reference parity: none (the reference has no events); extends the
sessionize/funnel/seqmine family (§2 A22/A45/A95) with the
regex-shaped sequence query those fixed shapes can't express.

Scale posture: ONE shuffle on the key for the ordered per-key
reassembly (array_sort over collect_list — the attribution/session
convention). The per-key SYMBOL STRING must fit in task memory — the
standard CEP contract (per-user event counts are bounded in any real
log; a key with 10⁸ events is a bot to filter upstream, not a CEP
input). Matching is Java regex on the JVM (codegen), non-overlapping
leftmost semantics — identical to DuckDB's RE2 for patterns without
backreferences, which the oracle relies on; keep patterns to the
RE2-safe subset (no lookaround, no backrefs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cep_pattern_matches(
    events: DataFrame,
    key_col: str,
    symbol: Column,
    pattern: str,
    ts_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per-key non-overlapping match counts of ``pattern`` over the
    key's time-ordered symbol string.

    ``symbol``: a single-character column encoding each event (build
    with F.when chains; every event must map to exactly one char —
    use a catch-all like '.'→'x' so sequence length stays the event
    count). Tie order inside equal timestamps follows ``ts_cols``.

    Output per key: key, n_events, symbols (the string — auditable),
    n_matches, matched_chars (total chars inside matches) — ordered
    by key."""
    ordered = events.select(
        F.col(key_col).alias("k"),
        F.struct(*[F.col(c) for c in ts_cols], symbol.alias("sym")).alias("e"),
    )
    seqs = ordered.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list("e")), lambda x: x["sym"]
            ),
        ).alias("symbols"),
    )
    matches = F.expr(f"regexp_extract_all(symbols, '{pattern}', 0)")
    return seqs.select(
        F.col("k").alias(key_col),
        "n_events",
        "symbols",
        F.size(matches).cast("long").alias("n_matches"),
        F.aggregate(
            matches,
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.length(m).cast("long"),
        ).alias("matched_chars"),
    ).orderBy(key_col)
