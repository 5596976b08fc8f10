"""Poisson bootstrap confidence intervals — uncertainty for massive
aggregates in ONE pass (Chamandy et al., "Estimating Uncertainty for
Massive Data Streams", Google 2012; the scale substitute for the
classical resample-n-times bootstrap, which cannot run when the data
does not fit anywhere).

Each row joins replica b with weight w ~ Poisson(1) instead of being
resampled: replica b's mean is Σ w·x / Σ w, and the spread of the B
replica means estimates the sampling distribution of the true mean.
No resampling pass, no per-replica scan — ONE scan explodes each row
into its B (replica, weight) contributions and a single
map-side-combinable groupBy reduces to |groups|·B partial sums, so
the shuffle is bounded by groups × B regardless of data volume.

Engine-exact by construction, which makes even the CI value-hash
oracleable (the PPS convention):

- the Poisson(1) draw is the QUANTIZED inverse CDF of a 16-bit md5
  uniform — integer thresholds (floor(CDF·2^16)) in a CASE ladder,
  identical constants on both engines, tail capped at 7
  (P(X>7) < 1e-5 absorbed into the last rung);
- per-replica sums are exact integers (value in cents · weight);
- the CI is ORDER STATISTICS of the B replica means (2nd smallest /
  2nd largest for B=32, a ~94% interval) — no quantile
  interpolation, whose definition differs across engines;
- replica means are IEEE divisions of exactly-representable
  integers: correctly rounded, bit-identical on JVM and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

U_SCALE = 2**16

#: floor(CDF_Poisson(1)(k) * 2^16) for k = 0..6; u >= last rung -> 7.
#: Stored as 4-char lowercase hex: md5's fixed-width hex slice compares
#: LEXICOGRAPHICALLY exactly like the integer it encodes (both engines
#: use binary string comparison on ASCII), so the inverse-CDF ladder
#: runs on plain string compares — no hex->int conversion per row
#: (conv() measured ~2.5s for 5M rows at sf0.1; substring+compares ~0.3s).
#: Integer values: 24109, 48218, 60273, 64291, 65296, 65497, 65530.
POISSON1_THRESHOLDS_HEX = (
    "5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9", "fffa",
)


def _poisson_weight(u_hex):
    """Quantized Poisson(1) inverse CDF over a 16-bit uniform encoded
    as a 4-char lowercase hex string (see POISSON1_THRESHOLDS_HEX)."""
    w = F.lit(7)
    for k in range(len(POISSON1_THRESHOLDS_HEX) - 1, -1, -1):
        w = F.when(u_hex < F.lit(POISSON1_THRESHOLDS_HEX[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str],
    n_replicas: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Per-group mean of ``value_col`` with a Poisson-bootstrap
    confidence interval from ``n_replicas`` one-pass replicas.

    Output: group..., n_rows, mean_value (exact full-data mean),
    ci_lo, ci_hi (2nd smallest / 2nd largest replica mean), n_replicas.
    Values are integerized to cents so every sum is exact."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    # Three measured traps shape this plan (sf0.1, B=32, fresh-plan
    # timings — warm re-collects lie via shuffle reuse):
    # building all B weights inside one per-row array blows the
    # generated method past the JIT limit -> interpreted eval (19.5s);
    # a conv(hex,16,10) per (row, replica) is the next hot spot
    # (~2.5s of 6.9s) — replaced by lexicographic hex compares, see
    # POISSON1_THRESHOLDS_HEX. Each md5 yields EIGHT 16-bit uniforms,
    # so ceil(B/8) hashes are computed per ROW before the explode and
    # each exploded replica slices its own 4 hex chars (4.4s total).
    # Replica -1 carries weight 1 for every row: its "replica sums"
    # ARE the exact totals, so the true mean falls out of the same
    # single scan/aggregate as the bootstrap replicas (no second pass).
    key = F.col(key_col).cast("string")
    h = F.concat(
        *[
            F.md5(F.concat(key, F.lit(f":{salt}:{j}")))
            for j in range((n_replicas + 7) // 8)
        ]
    )
    base = df.select(*group_cols, cents.alias("_v"), h.alias("_h"))
    exploded = base.select(
        *group_cols,
        "_v",
        "_h",
        F.explode(F.lit(list(range(-1, n_replicas)))).alias("_b"),
    )
    # project the hex slice ONCE: inlining it into the CASE ladder
    # re-evaluates the substring per rung (measured +1.8s at sf0.1)
    exploded = exploded.select(
        *group_cols,
        "_v",
        "_b",
        F.expr("substring(_h, _b * 4 + 1, 4)").alias("_u"),
    ).select(
        *group_cols,
        "_v",
        "_b",
        F.when(F.col("_b") == -1, F.lit(1))
        .otherwise(_poisson_weight(F.col("_u")))
        .alias("_w"),
    )
    per_rep = exploded.groupBy(*group_cols, "_b").agg(
        F.sum(F.col("_w").cast("decimal(28,0)") * F.col("_v")).alias("_ws"),
        F.sum("_w").cast("long").alias("_wn"),
    ).persist_tracked()  # feeds the CI branch and the exact-mean branch
    # replica mean in cents; a replica whose total weight is 0 (only
    # possible for microscopic groups) is excluded from the order
    # statistics on both engines
    rep_means = per_rep.filter(
        (F.col("_b") >= 0) & (F.col("_wn") > 0)
    ).select(
        *group_cols,
        (F.col("_ws").cast("double") / F.col("_wn").cast("double")).alias(
            "_m"
        ),
    )
    w_asc = Window.partitionBy(*group_cols).orderBy(F.col("_m").asc())
    w_desc = Window.partitionBy(*group_cols).orderBy(F.col("_m").desc())
    ci = (
        rep_means.withColumn("_ra", F.row_number().over(w_asc))
        .withColumn("_rd", F.row_number().over(w_desc))
        .groupBy(*group_cols)
        .agg(
            F.max(F.when(F.col("_ra") == 2, F.col("_m"))).alias("ci_lo"),
            F.max(F.when(F.col("_rd") == 2, F.col("_m"))).alias("ci_hi"),
            F.count(F.lit(1)).cast("long").alias("n_replicas"),
        )
    )
    overall = per_rep.filter(F.col("_b") == -1).select(
        *group_cols,
        F.col("_wn").alias("n_rows"),
        (
            F.col("_ws").cast("double")
            / F.col("_wn").cast("double")
            / F.lit(100.0)
        ).alias("mean_value"),
    )
    out = overall.join(ci, group_cols).select(
        *group_cols,
        "n_rows",
        "mean_value",
        (F.col("ci_lo") / F.lit(100.0)).alias("ci_lo"),
        (F.col("ci_hi") / F.lit(100.0)).alias("ci_hi"),
        "n_replicas",
    )
    return out.orderBy(*group_cols) if group_cols else out
