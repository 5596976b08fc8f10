"""Information-theoretic corpus diagnostics: mutual information
between two categorical columns and Cohen's kappa between two
raters — the association metrics a curation pipeline runs next to
chi² (operators/statistics.py::chi2_contingency) when deciding
whether a metadata column is informative and whether two cheap
quality heuristics actually agree.

Why a pipeline computes these:
- MI(lang; source) answers "does knowing the source tell me the
  language?" in nats — the feature-selection / leakage screen run
  before conditioning sampling rates on a column. chi² tests
  *whether* the columns are dependent; MI measures *how much*.
- Cohen's kappa corrects raw rater agreement for chance: two
  heuristic labelers that both say "keep" 90% of the time agree 81%
  by luck alone. Kappa is the standard gate before trusting a cheap
  heuristic as a proxy for an expensive one (label-QA for training
  filters).

Exactness contract (the chi2/corpuslaws conventions):
- every reduction is integer COUNT/SUM (order-independent, exact);
- PMI logs are quantized to round(ln(x)·1e9) BIGINT — the
  corpuslaws L_SCALE fixed-point convention — so the per-cell MI
  decomposition value-hashes across engines;
- kappa needs no logs at all: p_o and p_e are single IEEE divisions
  of exact integer sums, written identically in the oracle.

Scale: both operators reduce the fact table to a contingency table
whose cardinality is the product of the label domains (|langs|·
|sources|, 2·2) — one map-side-combined shuffle reads the 100 TB
side, everything downstream is kilobytes. Marginals come from
re-aggregating the cached cell table, never a second fact scan.

The reference's statistical surface is sum and mean
(`top_movies.py:140,143`); this is the §2 A8 family extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.operators.corpuslaws import L_SCALE


def mutual_information_cells(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Per-cell MI decomposition of the a × b contingency table.

    Output (one row per observed cell, ordered by a, b):
    a, b, observed, row_total, col_total, grand_total,
    pmi_q9  = round(ln(observed·N / (row_total·col_total)) · 1e9),
    mi_contrib_q9 = observed · pmi_q9.

    MI in nats = Σ mi_contrib_q9 / (N · 1e9); the per-cell rows keep
    the decomposition auditable (which cells carry the association)
    exactly as chi2_contingency exposes per-cell chi² terms.

    One shuffle on (a, b); marginals re-aggregate the cached cell
    table (|A|·|B| rows); grand total joins in as a broadcast 1-row
    aggregate. The PMI ratio is evaluated in ONE double expression,
    written identically in the DuckDB oracle, then quantized — the
    corpuslaws fixed-point-log convention.
    """
    cells = (
        df.groupBy(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
        .persist_tracked()  # 3 downstream branches over |A|x|B| rows
    )
    rt = cells.groupBy("a").agg(F.sum("observed").cast("long").alias("row_total"))
    ct = cells.groupBy("b").agg(F.sum("observed").cast("long").alias("col_total"))
    g = cells.agg(F.sum("observed").cast("long").alias("grand_total"))

    ratio = (
        F.col("observed").cast("double") * F.col("grand_total").cast("double")
    ) / (F.col("row_total").cast("double") * F.col("col_total").cast("double"))
    pmi_q9 = F.round(F.log(ratio) * F.lit(float(L_SCALE))).cast("long")

    return (
        cells.join(rt, "a")
        .join(ct, "b")
        .crossJoin(F.broadcast(g))
        .withColumn("pmi_q9", pmi_q9)
        .select(
            "a",
            "b",
            "observed",
            "row_total",
            "col_total",
            "grand_total",
            "pmi_q9",
            (F.col("observed") * F.col("pmi_q9")).alias("mi_contrib_q9"),
        )
        .orderBy("a", "b")
    )


def cohens_kappa(df: DataFrame, a: Column, b: Column) -> DataFrame:
    """Chance-corrected agreement between two 0/1 raters.

    Input: two integer label expressions over the same rows. Output:
    ONE row — n_rows, n_agree, po (observed agreement), pe (chance
    agreement from the marginals), kappa = (po − pe) / (1 − pe).

    All moments (n, agree, per-rater positive counts) come from a
    single map-side-combined aggregate over the fact — one scan, one
    1-row result; po/pe/kappa are IEEE divisions of exact integers,
    mirrored verbatim in the oracle. The 2×2 chance term expands to
    pe = (pa·pb + (n−pa)·(n−pb)) / n² — integer products up to n²,
    computed in DECIMAL(38,0) then divided once.

    NULL contract: rows where EITHER rater expression is NULL are
    excluded before aggregation, so n_rows and every moment sum cover
    the same population (SUM's NULL-skipping would otherwise count
    such rows in n_rows but silently drop them from n_agree/pa/pb,
    deflating po and skewing pe).
    """
    d38 = "decimal(38,0)"
    df = df.filter(a.isNotNull() & b.isNotNull())
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((a == b).cast("long")).cast("long").alias("n_agree"),
        F.sum(a.cast("long")).cast("long").alias("pa"),
        F.sum(b.cast("long")).cast("long").alias("pb"),
    )
    po = F.col("n_agree").cast("double") / F.col("n_rows").cast("double")
    pe_num = (
        F.col("pa").cast(d38) * F.col("pb").cast(d38)
        + (F.col("n_rows") - F.col("pa")).cast(d38)
        * (F.col("n_rows") - F.col("pb")).cast(d38)
    )
    pe = pe_num.cast("double") / (
        F.col("n_rows").cast(d38) * F.col("n_rows").cast(d38)
    ).cast("double")
    return m.select(
        "n_rows",
        "n_agree",
        F.col("pa").alias("rater_a_pos"),
        F.col("pb").alias("rater_b_pos"),
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


def feature_info_gain(
    df: DataFrame,
    target_col: Column,
    features: "dict[str, Column]",
    n_shuffle: int = 32,
) -> DataFrame:
    """Information-gain feature ranking: MI(target; f) for every
    candidate feature f, plus the entropies and the symmetric
    uncertainty SU = 2·MI/(H(f)+H(t)) — the filter-method feature-
    selection sweep (which columns predict the label at all) run
    before any model training.

    Shape: ONE stacked fact scan (×|features| bounded explode, the
    fd_violations convention, repartitioned ahead of the blow-up) to
    the (feature, value, target) cell table (persisted); marginals
    and totals re-aggregate that bounded table; MI/H assemble per
    feature with one more bounded aggregate. Never a per-feature
    rescan.

    Exactness: every count is an exact long; each ln is evaluated on
    the same exact-ratio double in both engines and quantized to
    fixed-point q9 (the mutual_information_cells convention), so the
    cross-cell sums are exact integer sums; the final nats are single
    divisions ⇒ value-hash exact.

    Output: one row per feature — feature, n_rows, n_cells,
    mi_nats, h_feature, h_target, su — ordered by feature.
    """
    qsc = F.lit(float(L_SCALE))
    stacked = (
        df.repartition(n_shuffle)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("f"),
                            expr.cast("string").alias("fv"),
                        )
                        for name, expr in features.items()
                    ]
                )
            ).alias("e"),
            target_col.cast("string").alias("t"),
        )
        .select("e.f", "e.fv", "t")
        .filter(F.col("fv").isNotNull() & F.col("t").isNotNull())
    )
    cells = (
        stacked.groupBy("f", "fv", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .persist_tracked()  # marginals + MI assembly read this
    )
    rt = cells.groupBy("f", "fv").agg(
        F.sum("o").cast("long").alias("rn")
    )
    ct = cells.groupBy("f", "t").agg(F.sum("o").cast("long").alias("cn"))
    g = cells.groupBy("f").agg(F.sum("o").cast("long").alias("n"))

    ratio = (
        F.col("o").cast("double") * F.col("n").cast("double")
    ) / (F.col("rn").cast("double") * F.col("cn").cast("double"))
    mi = (
        cells.join(rt, ["f", "fv"])
        .join(ct, ["f", "t"])
        .join(F.broadcast(g), "f")
        .select(
            "f",
            (
                F.col("o")
                * F.round(F.log(ratio) * qsc).cast("long")
            ).alias("c_q9"),
        )
        .groupBy("f")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("c_q9").cast("long").alias("mi_q9"),
        )
    )

    def entropy(marg, cnt_col, out):
        p = F.col(cnt_col).cast("double") / F.col("n").cast("double")
        return (
            marg.join(F.broadcast(g), "f")
            .select(
                "f",
                (
                    F.col(cnt_col)
                    * F.round(F.log(p) * qsc).cast("long")
                ).alias("h_q9"),
            )
            .groupBy("f")
            .agg((-F.sum("h_q9")).cast("long").alias(out))
        )

    hf = entropy(rt, "rn", "hf_q9")
    ht = entropy(ct, "cn", "ht_q9")
    den = F.col("n").cast("double") * qsc
    mi_nats = F.col("mi_q9").cast("double") / den
    h_f = F.col("hf_q9").cast("double") / den
    h_t = F.col("ht_q9").cast("double") / den
    return (
        g.join(mi, "f")
        .join(hf, "f")
        .join(ht, "f")
        .select(
            F.col("f").alias("feature"),
            F.col("n").alias("n_rows"),
            "n_cells",
            mi_nats.alias("mi_nats"),
            h_f.alias("h_feature"),
            h_t.alias("h_target"),
            F.try_divide(
                F.lit(2.0) * mi_nats, h_f + h_t
            ).alias("su"),
        )
        .orderBy("feature")
    )


def uncertainty_coefficient(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Theil's uncertainty coefficient U — the ASYMMETRIC categorical
    association next to Cramér's V: U(A|B) = MI/H(A) is "what
    fraction of A's entropy does knowing B remove", which answers
    the feature-selection question V's symmetric [0,1] cannot
    ("B predicts A, but A barely predicts B").

    Fixed-point entropy arithmetic (the mutual_information_cells
    convention): every ln is quantized round(ln·1e9) as a BIGINT at
    the bounded cell/marginal tables, so the entropy numerators
    N·lnq(N) − Σ t·lnq(t) and the MI numerator Σ o·pmi_q9 are exact
    DECIMAL(38,0) sums, and each U is ONE exact-integer ratio —
    engine-exact division of two longs. One fact scan (persisted
    cells; marginals re-aggregate the cache).

    Output: ONE row — n_obs, r_levels, c_levels, h_row, h_col,
    mi_nats, u_row_given_col, u_col_given_row, u_symmetric."""
    d38 = "decimal(38,0)"
    scale = F.lit(float(L_SCALE))
    cells = (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .persist_tracked()  # marginals + MI branch read this
    )
    rt = cells.groupBy("a").agg(F.sum("o").cast("long").alias("t"))
    ct = cells.groupBy("b").agg(F.sum("o").cast("long").alias("t"))

    def _lnq(c):
        return F.round(F.log(c.cast("double")) * scale).cast("long")

    def _ent_num(marg):
        # Σ t·lnq(t) as exact decimal, plus level count
        return marg.agg(
            F.sum((F.col("t").cast("decimal(19,0)") * _lnq(F.col("t"))).cast(d38))
            .cast(d38)
            .alias("s_tln"),
            F.count(F.lit(1)).cast("long").alias("levels"),
            F.sum("t").cast("long").alias("n"),
        )
    hr = _ent_num(rt)
    hc = _ent_num(ct)
    g = cells.agg(F.sum("o").cast("long").alias("n_obs"))
    ratio = (
        F.col("o").cast("double") * F.col("n_obs").cast("double")
    ) / (F.col("rt").cast("double") * F.col("ct").cast("double"))
    mi = (
        cells.join(
            F.broadcast(rt.select(F.col("a"), F.col("t").alias("rt"))), "a"
        )
        .join(
            F.broadcast(ct.select(F.col("b"), F.col("t").alias("ct"))), "b"
        )
        .crossJoin(F.broadcast(g))
        .select(
            (
                F.col("o").cast("decimal(19,0)")
                * F.round(F.log(ratio) * scale).cast("long")
            )
            .cast(d38)
            .alias("contrib")
        )
        .agg(F.sum("contrib").cast(d38).alias("mi_num"))
    )
    j = (
        g.crossJoin(F.broadcast(hr.select(
            F.col("s_tln").alias("r_tln"),
            F.col("levels").alias("r_levels"),
        )))
        .crossJoin(F.broadcast(hc.select(
            F.col("s_tln").alias("c_tln"),
            F.col("levels").alias("c_levels"),
        )))
        .crossJoin(F.broadcast(mi))
    )
    nd = F.col("n_obs").cast("decimal(19,0)")
    # entropy numerator in q9 fixed point: N·lnq(N) − Σ t·lnq(t)
    hr_num = (nd * _lnq(F.col("n_obs"))).cast(d38) - F.col("r_tln")
    hc_num = (nd * _lnq(F.col("n_obs"))).cast(d38) - F.col("c_tln")
    denom = F.col("n_obs").cast("double") * scale
    return j.select(
        "n_obs",
        "r_levels",
        "c_levels",
        (hr_num.cast("double") / denom).alias("h_row"),
        (hc_num.cast("double") / denom).alias("h_col"),
        (F.col("mi_num").cast("double") / denom).alias("mi_nats"),
        F.try_divide(
            F.col("mi_num").cast("double"), hr_num.cast("double")
        ).alias("u_row_given_col"),
        F.try_divide(
            F.col("mi_num").cast("double"), hc_num.cast("double")
        ).alias("u_col_given_row"),
        F.try_divide(
            F.lit(2.0) * F.col("mi_num").cast("double"),
            (hr_num + hc_num).cast("double"),
        ).alias("u_symmetric"),
    )
