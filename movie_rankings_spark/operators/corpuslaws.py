"""Corpus-law diagnostics: Zipf rank-frequency slope and Heaps
vocabulary-growth fit — the statistical fingerprints a corpus-quality
report prints next to the per-doc quality scores.

Why a pipeline computes these: natural language reliably shows
Zipf's law (freq ∝ rank^s, s ≈ −1) and Heaps' law (V ∝ n^β,
β ≈ 0.4–0.6). Synthetic/boilerplate/spam corpora deviate hard —
a Zipf slope near 0 means near-uniform token use (machine soup), a
Heaps β near 1 means unbounded vocabulary (serial numbers, hashes).
Both fits are one-line OLS in log-log space; the engineering content
is doing the regression EXACTLY so the whole report value-hashes:

- logs are quantized per-point to round(ln(x)·1e9) BIGINT (the DSIR
  DECIMAL-rounded-ln convention) — ln of small integers where both
  engines' correctly-rounded libm agree;
- OLS moments (Σx, Σy, Σxy, Σx²) accumulate in DECIMAL(38,0) —
  exact, order-independent;
- slope/intercept are two IEEE divisions of exact integers at the
  very end.

Scale: the Zipf fit reduces the corpus to the top-k word histogram
(one explode + map-side-combined count, TakeOrdered tail k rows);
the rank window runs over those k rows only (a reviewed bounded
global window, the vocab_top_words class). The Heaps fit reduces to
one (tokens, types) row per source — |sources| points. Nothing
corpus-sized survives the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words

#: fixed-point scale for quantized logs
L_SCALE = 1_000_000_000


def _qln(col) -> Column:
    return F.round(F.log(col.cast("double")) * F.lit(float(L_SCALE))).cast(
        "long"
    )


def _ols_fit(pts: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Exact-moment OLS of quantized-log points: 1 row (n_points,
    slope, intercept), moments in DECIMAL(38,0)."""
    d38 = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(x).cast(d38)).alias("sx"),
        F.sum(F.col(y).cast(d38)).alias("sy"),
        F.sum((F.col(x).cast(d38) * F.col(y).cast(d38)).cast(d38)).alias("sxy"),
        F.sum((F.col(x).cast(d38) * F.col(x).cast(d38)).cast(d38)).alias("sxx"),
    )
    num = F.col("n").cast(d38) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / F.lit(float(L_SCALE))
        ).alias("intercept_ln"),
    )


def zipf_slope(docs: DataFrame, top_k: int = 100) -> DataFrame:
    """Zipf fit over the top-``top_k`` word frequencies: 1 row
    (n_points, slope, intercept_ln). slope ≈ −1 for natural text;
    intercept_ln is ln of the fitted rank-1 frequency."""
    freq = (
        docs.select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(top_k)
    )
    # rank over the k-row table — bounded global window (reviewed,
    # the vocab_top_words class)
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("f"), F.asc("w")))
    )
    pts = ranked.select(_qln(F.col("r")).alias("x"), _qln(F.col("f")).alias("y"))
    return _ols_fit(pts)


def heaps_fit(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Heaps fit across groups: per-group (tokens n, types V) points,
    fitted ln V = β·ln n + ln K. Output: one row per group (group,
    n_tokens, n_types) PLUS the fitted beta / k broadcast onto every
    row, so data and fit hash together; ordered by group."""
    per = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(words(F.col("text"))).alias("w"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("w").alias("n_types"),
        )
        .persist_tracked()  # feeds the fit and the output rows
    )
    per.count()
    fit = _ols_fit(
        per.select(
            _qln(F.col("n_tokens")).alias("x"), _qln(F.col("n_types")).alias("y")
        )
    ).select(
        F.col("slope").alias("heaps_beta"),
        F.col("intercept_ln").alias("heaps_ln_k"),
    )
    return (
        per.crossJoin(F.broadcast(fit))
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "n_types",
            "heaps_beta",
            "heaps_ln_k",
        )
        .orderBy(group_col)
    )


def zipf_oracle_sql(top_k: int = 100, table: str = "documents") -> str:
    """DuckDB twin of zipf_slope: same top-k histogram, same
    quantized logs, same HUGEINT-exact moments."""
    return f"""
WITH freq AS (
  SELECT w, COUNT(*) AS f FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM {table}
  ) GROUP BY w ORDER BY f DESC, w ASC LIMIT {top_k}
),
ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS r FROM freq
),
pts AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e9) AS BIGINT) AS x,
         CAST(round(ln(CAST(f AS DOUBLE)) * 1e9) AS BIGINT) AS y
  FROM ranked
),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) / 1e9 AS intercept_ln
FROM m
"""


def heaps_oracle_sql(
    group_sql: str = "source", table: str = "documents"
) -> str:
    """DuckDB twin of heaps_fit."""
    return f"""
WITH per AS (
  SELECT {group_sql} AS grp,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
  FROM (
    SELECT {group_sql}, unnest(string_split(text, ' ')) AS w FROM {table}
  ) GROUP BY 1
),
pts AS (
  SELECT CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT) AS x,
         CAST(round(ln(CAST(n_types AS DOUBLE)) * 1e9) AS BIGINT) AS y
  FROM per
),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM pts
)
SELECT per.grp AS {group_sql}, per.n_tokens, per.n_types,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS heaps_beta,
       (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) / 1e9 AS heaps_ln_k
FROM per CROSS JOIN m
ORDER BY {group_sql}
"""
