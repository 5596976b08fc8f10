"""Cross-source corpus overlap matrix — pairwise shingle-set overlap
between document SOURCES (Jaccard + containment), the corpus-level
audit next to the document-level dedup tier.

Why a pipeline needs it: before mixing corpora (token_budget_mix) or
deduplicating across them, you want to KNOW how much two sources share
— a high containment of source A in source B means "A is mostly a
subset of B, dedup before mixing or you double-count"; it is also the
train-vs-benchmark overlap number contamination reports cite (Brown
et al. 2020 App. C measure overlap exactly this way, n-gram sets).

Shape — never a doc×doc comparison:

- one explode of the corpus into DISTINCT (source, 3-gram shingle)
  pairs (the dedup_ngram shingle construction, shared SQL semantics);
- per-source set sizes: one map-side-combined groupBy;
- intersections: group shingles by VALUE, collect the sorted set of
  sources containing each (bounded by |sources|, a handful), explode
  the ≤ |sources|² ordered pairs, count per pair. The corpus-sized
  table is shuffled ONCE (by shingle); everything after is
  |sources|-bounded.

Exactness: counts are integers; Jaccard/containment are single IEEE
divisions of exact integers — engine-portable, value-hash oracleable.

At 100 TB: hash the shingle (xxhash64) before the groupBy so the
shuffle carries fixed-width keys (the dedup_substring_spans note) —
the string form here keeps the oracle exact. |sources| is small by
construction (it is a catalog attribute); if it weren't, the
pair-explode bound |sources|² is the thing to watch, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import word_shingles


def set_overlap_matrix(items: DataFrame) -> DataFrame:
    """Pairwise overlap of distinct item sets between groups — the
    generic core: ``items`` has columns (src, g) = (group, member).
    Works for any "which groups share members" audit: shingle sets
    per corpus source (source_overlap_matrix), user audiences per
    event type (overlap_event_audiences), SKUs per region, ...

    Output per (src_a < src_b): n_a, n_b, n_common, jaccard,
    containment (of the smaller set), ordered."""
    sh = (
        items.select("src", "g")
        .distinct()
        .persist_tracked()  # feeds both the per-group sizes and the pair count
    )
    sh.count()  # materialize so every consumer reads the cached set
    sizes = sh.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    by_shingle = sh.groupBy("g").agg(
        F.sort_array(F.collect_set("src")).alias("ss")
    )
    pairs = (
        by_shingle.filter(F.size("ss") >= 2)
        .select(F.explode("ss").alias("src_a"), "ss")
        .select("src_a", F.explode("ss").alias("src_b"))
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        pairs.join(sizes.select(F.col("src").alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(sizes.select(F.col("src").alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )
    return out


def source_overlap_matrix(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairwise overlap of distinct n-gram shingle sets between
    document groups — set_overlap_matrix over the shingle explode."""
    return set_overlap_matrix(
        docs.select(
            F.col(group_col).alias("src"),
            F.explode(word_shingles(F.col(text_col), n)).alias("g"),
        )
    )


def audience_overlap_matrix(
    events: DataFrame,
    group_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """Audience overlap between event types: which behaviours share
    USERS (exact |A∩B|, Jaccard, containment per type pair) — the
    warehouse companion to the corpus-level source overlap, same
    single-shuffle core. At 100 TB the distinct (type, user) reduce
    is the only fact-sized shuffle; everything after is bounded by
    |types| and |types|²."""
    return set_overlap_matrix(
        events.select(
            F.col(group_col).alias("src"), F.col(member_col).alias("g")
        )
    )


def audience_overlap_oracle_sql(
    group_sql: str = "event_type",
    member_sql: str = "user_id",
    table: str = "events",
) -> str:
    """DuckDB twin of audience_overlap_matrix."""
    return f"""
WITH e AS (SELECT DISTINCT {group_sql} AS src, {member_sql} AS g FROM {table}),
sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY src),
inter AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e a JOIN e b ON a.g = b.g AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, x.n AS n_a, y.n AS n_b, n_common,
       CAST(n_common AS DOUBLE) / (x.n + y.n - n_common) AS jaccard,
       CAST(n_common AS DOUBLE) / least(x.n, y.n) AS containment
FROM inter
JOIN sizes x ON src_a = x.src
JOIN sizes y ON src_b = y.src
ORDER BY src_a, src_b
"""


def source_overlap_oracle_sql(
    shingles_sql: str, group_sql: str = "source", table: str = "documents"
) -> str:
    """DuckDB twin. ``shingles_sql`` is the list-of-shingles expression
    over a row of ``table`` (the _SHINGLES text shared with the dedup
    oracles, so both tiers provably shingle identically)."""
    return f"""
WITH s AS (SELECT {group_sql} AS src, {shingles_sql} AS sh FROM {table}),
e AS (SELECT DISTINCT src, unnest(sh) AS g FROM s),
sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY src),
inter AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e a JOIN e b ON a.g = b.g AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, x.n AS n_a, y.n AS n_b, n_common,
       CAST(n_common AS DOUBLE) / (x.n + y.n - n_common) AS jaccard,
       CAST(n_common AS DOUBLE) / least(x.n, y.n) AS containment
FROM inter
JOIN sizes x ON src_a = x.src
JOIN sizes y ON src_b = y.src
ORDER BY src_a, src_b
"""
