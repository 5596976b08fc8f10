"""Nonparametric two-sample distribution tests — exact Kolmogorov–
Smirnov and Mann–Whitney U — plus a Benford first-digit audit: the
"did this distribution shift?" toolkit a pipeline runs when a
metric's SHAPE (not just its mean) matters: comparing document-length
profiles across sources, price distributions across order classes,
or screening a numeric column for fabricated values.

Why these, next to the existing drift/anomaly family:
- drift_train_val_js (operators/drift.py) compares BINNED histograms
  — resolution is the bin width. KS is the exact, binning-free
  supremum distance between the two empirical CDFs, with the value
  where the gap peaks (the actionable part: WHERE the shapes split).
- The t-test assumes normality; Mann–Whitney is the standard
  rank-based alternative ("do A's values stochastically dominate
  B's?") and its rank-biserial effect size is the number reported
  next to the p-value.
- Benford's law flags fabricated or truncated numeric columns before
  they poison features: organic multiplicative data has first digit
  d with probability log10(1 + 1/d); uniform or hand-entered data
  does not.

Exactness contract (the gini/quantile_rank_map conventions):
- both tests reduce the fact to the DISTINCT-VALUE count table with
  per-group tallies (one map-side-combined shuffle);
- exact cumulative counts over that table come from the bucketed
  two-pass (per-bucket windows + driver-prefix-summed offsets at
  `statistics.quantile_rank_map`) — never an Exchange
  SinglePartition window and never a value-domain theta join (the
  roc_curve pattern is for DOMAIN-bounded values; price-like columns
  have ~N distinct values and would make that join quadratic);
- every statistic numerator is an exact BIGINT (KS distance as
  max|cumA·nB − cumB·nA|; U doubled so midrank ties stay integral);
  the final ks_d / rank-biserial / z are single IEEE expressions of
  those integers, written identically in the oracle.
- documented bound: exact as long as n_a·n_b < 2^62 (per-test pair
  count fits a BIGINT) — beyond that the sums must move to
  DECIMAL(38,0), which halves throughput and is not needed below
  ~2·10^9 rows per side.

The reference's statistical surface is sum and mean
(`top_movies.py:140,143`); this extends the §2 A8/A43 family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketed_cum2(
    df: DataFrame,
    value_col: str,
    a_ind: Column,
    b_ind: Column,
    buckets: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Distinct-value table (v, ca, cb, cum_a, cum_b) with EXACT
    inclusive cumulative per-group counts over v ascending, without a
    global sort: approx_percentile bounds place values into contiguous
    buckets (placement is heuristic, every count below is exact),
    per-bucket windows run in parallel, and a ≤ buckets-row collect
    prefix-sums the per-bucket/per-group offsets on the driver —
    quantile_rank_map's two-pass, carried for two groups at once.

    NULL values of value_col are EXCLUDED (they have no place on the
    real line, and NULLS FIRST in the per-bucket window would
    otherwise count them as a distinct smallest value) — the same
    contract spearman_rho and ks_group_vs_rest already enforce.

    Returns (cum_df, n_a, n_b); the totals are driver-known (they
    fall out of the offsets collect) so callers embed them as
    literals instead of re-aggregating.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = max(1, min(int(n), 4096))

    rows = df.select(
        F.col(value_col).cast("long").alias("v"),
        a_ind.cast("long").alias("_a"),
        b_ind.cast("long").alias("_b"),
    ).filter(((F.col("_a") + F.col("_b")) > 0) & F.col("v").isNotNull())
    # the ONLY fact-sized pass: materialized into the persisted
    # distinct-value table; bounds/totals/final all read the cache
    vc = (
        rows.groupBy("v")
        .agg(
            F.sum("_a").cast("long").alias("ca"),
            F.sum("_b").cast("long").alias("cb"),
        )
        .persist_tracked()
    )
    if n > 1:
        # unweighted percentiles of the distinct values: the per-bucket
        # windows run over vc ROWS, so balancing |V| per bucket (not row
        # mass) is the right load balance — and it reads the cache, not
        # the fact. Placement is heuristic; every count below is exact.
        bounds = vc.agg(
            F.percentile_approx(
                "v", F.lit([i / n for i in range(1, n)]), F.lit(10_000)
            ).alias("b")
        ).collect()[0]["b"]
    else:
        bounds = []
    bounds = sorted(set(bounds or []))
    bucket = (
        F.size(F.filter(F.lit(bounds), lambda b: F.col("v") > b))
        if bounds
        else F.lit(0)
    )
    vb = vc.withColumn("_bucket", bucket)
    totals = {
        r["_bucket"]: (r["ta"], r["tb"])
        for r in vb.groupBy("_bucket")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .collect()
    }
    offsets, run_a, run_b = [], 0, 0
    for b in range(len(bounds) + 1):
        offsets.append((b, run_a, run_b))
        ta, tb = totals.get(b, (0, 0))
        run_a += ta
        run_b += tb
    off = spark.createDataFrame(
        offsets, "_bucket int, _off_a long, _off_b long"
    )
    w = Window.partitionBy("_bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        vb.withColumn("_ra", F.sum("ca").over(w))
        .withColumn("_rb", F.sum("cb").over(w))
        .join(F.broadcast(off), "_bucket")
        .select(
            "v",
            "ca",
            "cb",
            (F.col("_off_a") + F.col("_ra")).cast("long").alias("cum_a"),
            (F.col("_off_b") + F.col("_rb")).cast("long").alias("cum_b"),
        )
    )
    return cum, int(run_a), int(run_b)


def ks_two_sample(
    df: DataFrame, value_col: str, a_ind: Column, b_ind: Column
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance.

    Output: ONE row — n_a, n_b, d_num = max_v |cumA(v)·n_b −
    cumB(v)·n_a| (exact BIGINT), at_value (the SMALLEST v attaining
    the max — deterministic tie-break), ks_d = d_num/(n_a·n_b) (one
    IEEE division of exact integers).

    The supremum over the step ECDFs is attained at a jump, i.e. at
    an observed distinct value, so scanning the distinct-value table
    is exhaustive. One fact-sized shuffle (the distinct-value
    groupBy); everything after runs on |V| rows.
    """
    cum, n_a, n_b = _bucketed_cum2(df, value_col, a_ind, b_ind)
    d_num = F.abs(
        F.col("cum_a") * F.lit(n_b) - F.col("cum_b") * F.lit(n_a)
    ).cast("long")
    m = cum.agg(
        F.max(
            F.struct(d_num.alias("d_num"), (-F.col("v")).alias("_nv"))
        ).alias("_m")
    )
    denom = float(n_a) * float(n_b)
    return m.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.col("_m.d_num").alias("d_num"),
        (-F.col("_m._nv")).cast("long").alias("at_value"),
        (F.col("_m.d_num").cast("double") / F.lit(denom)).alias("ks_d"),
    )


def mannwhitney_u(
    df: DataFrame, value_col: str, a_ind: Column, b_ind: Column
) -> DataFrame:
    """Exact Mann–Whitney U with midrank tie handling, rank-biserial
    effect size, and the tie-corrected normal z approximation.

    U_A counts pairs (a, b) with a > b, ties ½ each. Doubling keeps
    it integral: u_a_x2 = Σ_v ca(v)·(2·cumltB(v) + cb(v)) — every
    term an exact product of counts; u_b_x2 = 2·n_a·n_b − u_a_x2.
    rank_biserial = (u_a_x2 − n_a·n_b)/(n_a·n_b) and
    z = (u_a_x2 − n_a·n_b) / (2·sqrt(var)), with the tie-corrected
    var = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))) — the tie sum is
    an exact BIGINT; var/z are IEEE expressions of exact integers
    written identically in the oracle.

    Output: ONE row — n_a, n_b, u_a_x2, u_b_x2, tie_term,
    rank_biserial, z. Same single-shuffle shape as ks_two_sample.
    """
    cum, n_a, n_b = _bucketed_cum2(df, value_col, a_ind, b_ind)
    term = F.col("ca") * (
        F.lit(2) * (F.col("cum_b") - F.col("cb")) + F.col("cb")
    )
    t = F.col("ca") + F.col("cb")
    m = cum.agg(
        F.sum(term).cast("long").alias("u_a_x2"),
        F.sum(t * t * t - t).cast("long").alias("tie_term"),
    )
    prod = float(n_a) * float(n_b)
    n = n_a + n_b
    ties = F.col("tie_term").cast("double") / F.lit(
        float(n) * float(n - 1)
    )
    var = F.lit(prod / 12.0) * (F.lit(float(n + 1)) - ties)
    centered = F.col("u_a_x2").cast("double") - F.lit(prod)
    return m.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        "u_a_x2",
        (F.lit(2 * n_a * n_b) - F.col("u_a_x2")).cast("long").alias(
            "u_b_x2"
        ),
        "tie_term",
        (centered / F.lit(prod)).alias("rank_biserial"),
        (centered / (F.lit(2.0) * F.sqrt(var))).alias("z"),
    )


#: Benford expectations log10(1 + 1/d), frozen to full double
#: precision so the Spark plan and the oracle SQL share the SAME
#: literal (neither engine's log10 is consulted at query time).
BENFORD_EXPECTED = {
    1: 0.30102999566398120,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_first_digit(df: DataFrame, cents_col: Column) -> DataFrame:
    """First-significant-digit audit against Benford's law over a
    positive integral column (prices in cents keep the first
    significant digit of the price itself).

    Output: 9 rows (digit 1–9, missing digits kept at 0) — digit,
    observed, total, share, expected, dev = share − expected.
    The expected shares are injected as frozen literals
    (BENFORD_EXPECTED) into BOTH engines, so share/dev are IEEE
    expressions of exact integers and shared constants — value-hash
    exact. One map-side-combined shuffle to ≤ 9 cells.
    """
    spark = df.sparkSession
    obs = (
        df.select(cents_col.cast("long").alias("_c"))
        .filter(F.col("_c") > 0)
        .groupBy(
            F.substring(F.col("_c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    frame = spark.createDataFrame(
        [(d, e) for d, e in BENFORD_EXPECTED.items()],
        "digit int, expected double",
    )
    filled = (
        frame.join(obs, "digit", "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)).cast("long"))
        .persist_tracked()  # total branch + output branch over 9 rows
    )
    total = filled.agg(F.sum("observed").cast("long").alias("total"))
    share = F.col("observed").cast("double") / F.col("total").cast("double")
    return (
        filled.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "observed",
            "total",
            share.alias("share"),
            "expected",
            (share - F.col("expected")).alias("dev"),
        )
        .orderBy("digit")
    )


def spearman_rho(df: DataFrame, col_a: Column, col_b: Column) -> DataFrame:
    """Exact Spearman rank correlation between two integral columns —
    Pearson correlation of the midrank vectors, the monotone-
    association screen that survives outliers and nonlinearity (the
    rank sibling of statistics.py's Pearson `corr_price_quantity`).

    Shape: the fact reduces ONCE to the distinct-(a, b) pair table
    (map-side combined, persisted); per-variable midranks come from
    the same bucketed-cumulative machinery as ks_two_sample over that
    cached table (never a global-sort window); rank maps equi-join
    back onto the pair table.

    Exactness: midranks are doubled to stay integral (r2 = 2·cumlt +
    c + 1); the three rank moments are exact DECIMAL(38,0) sums
    (every operand ≤ 2n, so Σ c·r2·r2 ≤ 4n³ — exact for n < ~2·10^12);
    Σ c·r2 ≡ n(n+1) is an identity, so the centered numerator/
    denominators are exact integer DIFFERENCES (no catastrophic
    cancellation in floating point — the naive double expansion loses
    every digit of a weak correlation at n ~ 10^6), and rho is one
    IEEE expression of those exact integers, mirrored verbatim in the
    oracle (DuckDB computes the same integers in HUGEINT).

    Output: ONE row — n_rows, rho.
    """
    pairs = (
        df.select(
            col_a.cast("long").alias("va"), col_b.cast("long").alias("vb")
        )
        .filter(F.col("va").isNotNull() & F.col("vb").isNotNull())
        .groupBy("va", "vb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist_tracked()  # rank passes + join read this, not the fact
    )
    cum_a, n, _ = _bucketed_cum2(pairs, "va", F.col("c"), F.lit(0))
    cum_b, _, _ = _bucketed_cum2(pairs, "vb", F.col("c"), F.lit(0))
    ranka = cum_a.select(
        F.col("v").alias("va"),
        (F.lit(2) * F.col("cum_a") - F.col("ca") + F.lit(1))
        .cast("long")
        .alias("r2a"),
    )
    rankb = cum_b.select(
        F.col("v").alias("vb"),
        (F.lit(2) * F.col("cum_a") - F.col("ca") + F.lit(1))
        .cast("long")
        .alias("r2b"),
    )

    def d19(c: Column) -> Column:
        return c.cast("decimal(19,0)")

    j = pairs.join(ranka, "va").join(rankb, "vb")
    m = j.agg(
        F.sum(d19(F.col("c")) * d19(F.col("r2a")) * d19(F.col("r2b"))).alias(
            "sab"
        ),
        F.sum(d19(F.col("c")) * d19(F.col("r2a")) * d19(F.col("r2a"))).alias(
            "saa"
        ),
        F.sum(d19(F.col("c")) * d19(F.col("r2b")) * d19(F.col("r2b"))).alias(
            "sbb"
        ),
    )
    nd = F.lit(n).cast("decimal(19,0)")
    # Σ doubled midranks over all rows is n(n+1) exactly — the
    # driver-known n makes Sa = Sb a literal instead of a fourth sum
    sa = nd * F.lit(n + 1).cast("decimal(19,0)")
    num = nd * F.col("sab") - sa * sa
    den_a = nd * F.col("saa") - sa * sa
    den_b = nd * F.col("sbb") - sa * sa
    # try_divide: a zero-variance column (every value tied) makes the
    # denominator 0 — DuckDB's x/0.0 is NULL, and try_divide mirrors
    # that exactly where ANSI `/` would raise
    rho = F.try_divide(
        num.cast("double"),
        F.sqrt(den_a.cast("double")) * F.sqrt(den_b.cast("double")),
    )
    return m.select(
        F.lit(n).cast("long").alias("n_rows"), rho.alias("rho")
    )


def ks_group_vs_rest(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group two-sample KS against the REST of the corpus, for
    every group at once — "which source's length profile deviates?",
    the curation sweep run before re-weighting a multi-source mix
    (ks_two_sample answers one designed contrast; this screens all
    |groups| of them in one pass).

    Contract: value_col is integral and DOMAIN-bounded (document
    lengths, ages, star ratings — not price-like ~N-distinct columns;
    those belong to ks_two_sample's bucketed machinery). The fact
    reduces ONCE to the (group, value) cell table (~|groups|·|domain|
    rows, persisted); cumulatives come from a broadcast theta join of
    the bounded distinct-value grid (the roc_curve pattern — never a
    global window), and the rest-side ECDF is derived as
    (global − group), so no second pass exists anywhere.

    Exactness: D numerator per group is the exact BIGINT
    max |cum_g·n_rest − cum_rest·n_g| with the smallest attaining
    value as the deterministic tie-break (bound n_g·n_rest < 2^62);
    ks_d is one IEEE division.

    Output: (group, n_group, n_rest, d_num, at_value, ks_d), ordered
    by group.
    """
    cells = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .filter(F.col("g").isNotNull() & F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist_tracked()  # grid + totals + both cum sides read this
    )
    grid = cells.select("v").distinct().select(F.col("v").alias("v_at"))
    # inclusive cumulative per group at EVERY grid value (a group's
    # ECDF must be evaluated at other groups' jump points too)
    cum_g = (
        cells.join(F.broadcast(grid), F.col("v") <= F.col("v_at"))
        .groupBy("g", "v_at")
        .agg(F.sum("c").cast("long").alias("cum_g"))
    )
    cum_all = (
        cells.groupBy("v")
        .agg(F.sum("c").cast("long").alias("cv"))
        .join(F.broadcast(grid), F.col("v") <= F.col("v_at"))
        .groupBy("v_at")
        .agg(F.sum("cv").cast("long").alias("cum_all"))
    )
    n_g = cells.groupBy("g").agg(F.sum("c").cast("long").alias("n_group"))
    n_all = cells.agg(F.sum("c").cast("long").alias("n_total"))
    j = (
        cum_g.join(F.broadcast(cum_all), "v_at")
        .join(F.broadcast(n_g), "g")
        .crossJoin(F.broadcast(n_all))
    )
    n_rest = F.col("n_total") - F.col("n_group")
    d = F.abs(
        F.col("cum_g") * n_rest
        - (F.col("cum_all") - F.col("cum_g")) * F.col("n_group")
    ).cast("long")
    picked = j.groupBy("g", "n_group", "n_total").agg(
        F.max(
            F.struct(d.alias("d_num"), (-F.col("v_at")).alias("_nv"))
        ).alias("_m")
    )
    return picked.select(
        F.col("g").alias("group"),
        "n_group",
        (F.col("n_total") - F.col("n_group")).alias("n_rest"),
        F.col("_m.d_num").alias("d_num"),
        (-F.col("_m._nv")).cast("long").alias("at_value"),
        F.try_divide(
            F.col("_m.d_num").cast("double"),
            (
                F.col("n_group") * (F.col("n_total") - F.col("n_group"))
            ).cast("double"),
        ).alias("ks_d"),
    ).orderBy("group")
