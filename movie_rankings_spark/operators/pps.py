"""Probability-proportional-to-size (PPS / Poisson) sampling with a
Horvitz–Thompson estimator (Horvitz & Thompson 1952) — the survey-
sampling sibling of the equal-rate and Neyman samplers in
operators/textops.py / plans/llm_queries.py.

Why it earns a place in the scale tier: sampling 0.1% of a 100 TB
fact table uniformly wastes most of the budget on rows that carry no
mass; PPS includes row i with probability π_i = min(1, n·w_i/W), so
high-weight rows are (near-)certainly kept and the HT estimator
Σ v_i/π_i over the SAMPLE is unbiased for the population total — the
standard way a pipeline audits revenue/traffic totals from a sketch-
sized sample.

Everything here is engine-exact, which is what makes the whole draw
value-hash oracleable (no rows-only carve-out):

- weights are integerized to cents (round-half-up at a fixed scale);
- W = Σ w is an exact integer aggregate (order-independent);
- the selection test is an INTEGER CROSS-MULTIPLICATION — row i is
  sampled iff  u_i · W < n · w_i · 2^16  computed in DECIMAL(38,0)
  (never a float inequality, whose u/W division could round
  differently across engines), with u_i a 16-bit md5 field — the
  deterministic-uniform convention of split_train_val_test;
- the HT weights use the EXACT inclusion probability of that
  quantized test: under a 16-bit uniform u there are exactly
  k = min(2^16, ceil(n·w·2^16/W)) passing u values, so
  π_i = k/2^16 — computed by integer ceil-division and one division
  by a power of two (exact in IEEE), making Σ 1/π_i genuinely
  unbiased for the design actually drawn. (Weighting by the
  continuous min(1, n·w/W) instead would bias rows with tiny π by up
  to ~2×: at π ≈ 2^-16 the quantization error dominates.)
- π_i and v_i/π_i are IEEE ·/÷ on exactly-representable values —
  correctly-rounded operations both JVM and DuckDB reproduce
  bit-for-bit.

Scale shape: TWO pruned scans of the fact table — a weight-column-only
pass for the 1-row total W (broadcast), then the selection pass (the
quality_filtered_docs convention: at 100 TB re-scanning two pruned
columns beats caching a corpus-sized frame). Selection + HT weighting
are stateless row expressions; the per-group report is one map-side-
combinable aggregate. Nothing collects, nothing resamples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16-bit uniform field keeps every cross-product inside DECIMAL(38,0)
#: headroom even at 100 TB weight totals (W_cents ≤ ~1e18 → products
#: ≤ ~6.5e22 ≪ 1e38).
U_BITS = 16
U_SCALE = 2**U_BITS


def _u16(key: Column, salt: str) -> Column:
    """Deterministic uniform integer in [0, 2^16) from md5(salt:key)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")


def pps_sample_report(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    group_cols: list[str],
    n_target: int,
    salt: str = "pps",
) -> DataFrame:
    """Per-group audit of one Poisson-PPS draw of expected size
    ``n_target``: exact population count/total next to the sample
    size and the Horvitz–Thompson estimates rebuilt from the sample
    alone.

    Output: group..., n_rows, total_w (exact, cents), n_certainty
    (π = 1 rows), n_sampled, ht_count_est, ht_total_est (HT
    estimates of n_rows and total_w from the sample)."""
    w_cents = F.round(F.col(weight_col) * 100).cast("long")
    u = _u16(F.col(key_col), salt)
    base = df.select(
        *group_cols, w_cents.alias("w"), u.alias("u")
    )
    tot = base.agg(F.sum("w").alias("w_total")).persist_tracked()
    d38 = "decimal(38,0)"
    lhs = F.col("u").cast(d38) * F.col("w_total").cast(d38)
    rhs = (
        F.lit(n_target).cast(d38)
        * F.col("w").cast(d38)
        * F.lit(U_SCALE).cast(d38)
    )
    sampled = F.col("_lhs") < F.col("_rhs")
    certainty = (
        F.lit(n_target).cast(d38) * F.col("w").cast(d38)
        >= F.col("w_total").cast(d38)
    )
    # π = k/2^16 with k = min(2^16, ceil(n·w·2^16/W)) — the EXACT
    # inclusion probability of the quantized 16-bit test above
    # (integer ceil-division, then one division by a power of two,
    # which IEEE doubles represent exactly). `div` is Spark's
    # IntegralDivide: exact on DECIMAL(38,0), result LONG.
    k = F.least(
        F.lit(U_SCALE).cast("long"),
        F.expr(
            "CAST(_rhs + CAST(w_total AS DECIMAL(38,0)) - 1 AS DECIMAL(38,0))"
            " div CAST(w_total AS DECIMAL(38,0))"
        ),
    )
    rows = base.crossJoin(F.broadcast(tot)).select(
        *group_cols,
        "w",
        "w_total",
        lhs.alias("_lhs"),
        rhs.alias("_rhs"),
        certainty.alias("_cert"),
    ).withColumn("_pi", k.cast("double") / F.lit(float(U_SCALE)))
    out = (
        rows.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("w").alias("total_w"),
            F.sum(F.when(F.col("_cert"), 1).otherwise(0))
            .cast("long")
            .alias("n_certainty"),
            F.sum(F.when(sampled, 1).otherwise(0))
            .cast("long")
            .alias("n_sampled"),
            # per-row scaled-integer quantization (round(x·1e6) as
            # BIGINT — the pagerank decimal_mass convention: a direct
            # double→DECIMAL cast rounds differently across engines),
            # exact order-independent integer sum, one final unscale
            (
                F.sum(
                    F.round(
                        F.when(sampled, 1.0 / F.col("_pi")).otherwise(0.0)
                        * 1e6
                    )
                    .cast("long")
                    .cast("decimal(28,0)")
                ).cast("double")
                / F.lit(1e6)
            ).alias("ht_count_est"),
            (
                F.sum(
                    F.round(
                        F.when(
                            sampled,
                            F.col("w").cast("double") / F.col("_pi"),
                        ).otherwise(0.0)
                        * 1e6
                    )
                    .cast("long")
                    .cast("decimal(28,0)")
                ).cast("double")
                / F.lit(1e6)
            ).alias("ht_total_est"),
        )
    )
    return out.orderBy(*group_cols) if group_cols else out


def pps_oracle_sql(
    key_sql: str,
    weight_sql: str,
    group_sql: str,
    n_target: int,
    table: str,
    salt: str = "pps",
    group_alias: str = "grp",
) -> str:
    """DuckDB twin: identical md5 16-bit uniform, identical
    HUGEINT-exact cross-multiplied selection, identical exact
    quantized π (HUGEINT ceil-division, then /2^16), identical IEEE
    HT arithmetic; HT sums quantize per-row to round(x·1e6) BIGINT
    (the pagerank decimal_mass convention) so the summation is exact
    and order-independent on both engines."""
    return f"""
WITH base AS (
  SELECT {group_sql} AS {group_alias},
         CAST(round({weight_sql} * 100) AS BIGINT) AS w,
         CAST('0x' || substr(md5('{salt}:' || CAST({key_sql} AS VARCHAR)), 1, 4)
              AS BIGINT) AS u
  FROM {table}
),
tot AS (SELECT SUM(w) AS w_total FROM base),
rows_t AS (
  SELECT {group_alias}, w,
         CAST(u AS HUGEINT) * CAST(w_total AS HUGEINT)
           < CAST({n_target} AS HUGEINT) * CAST(w AS HUGEINT) * {U_SCALE}
           AS sampled,
         CAST({n_target} AS HUGEINT) * CAST(w AS HUGEINT)
           >= CAST(w_total AS HUGEINT) AS cert,
         CAST(least(CAST({U_SCALE} AS HUGEINT),
              (CAST({n_target} AS HUGEINT) * CAST(w AS HUGEINT) * {U_SCALE}
               + CAST(w_total AS HUGEINT) - 1) // CAST(w_total AS HUGEINT))
              AS DOUBLE) / {float(U_SCALE)} AS pi
  FROM base CROSS JOIN tot
)
SELECT {group_alias},
       COUNT(*) AS n_rows,
       CAST(SUM(w) AS BIGINT) AS total_w,
       CAST(SUM(CASE WHEN cert THEN 1 ELSE 0 END) AS BIGINT) AS n_certainty,
       CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CAST(CAST(round(
              (CASE WHEN sampled THEN 1.0 / pi ELSE 0.0 END) * 1e6)
              AS BIGINT) AS DECIMAL(28,0))) AS DOUBLE) / 1e6
         AS ht_count_est,
       CAST(SUM(CAST(CAST(round(
              (CASE WHEN sampled THEN CAST(w AS DOUBLE) / pi
                    ELSE 0.0 END) * 1e6)
              AS BIGINT) AS DECIMAL(28,0))) AS DOUBLE) / 1e6
         AS ht_total_est
FROM rows_t
GROUP BY {group_alias} ORDER BY {group_alias}
"""
