"""Model-based document scoring: hashed-feature linear classifier.

The FineWeb-Edu / DCLM curation step the heuristic tier can't cover:
a TRAINED quality classifier (fastText-style linear model over hashed
bag-of-words features) scores every document and a threshold gates the
corpus. The scoring plan is the part that must scale:

  tokens (explode) → feature bucket (md5 mod dim, codegen)
      → broadcast join against the weight table (the model)
      → per-doc SUM (map-side partial agg) → logit / gate

The weight table here is generated deterministically from the bucket
id (md5 slice → integer in [-100, 100]) so the DuckDB oracle can
reproduce every score bit-for-bit; in production you load the trained
weights parquet instead — same plan, same broadcast. Weights are kept
INTEGER (×100 fixed-point) so the per-doc sum is exact and
order-independent across engines; the double `score` is a single
division at the end.

Scale: the model is O(dim) rows — broadcast, never shuffled. The only
shuffle is the per-doc aggregate of (doc_id, weight), with map-side
combine; token explosion never leaves the mapper un-reduced.

Reference scope: the reference (top_movies.py) has no model scoring;
this is north-star [EXT] tier alongside quality_score/lm_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words

DEFAULT_DIM = 4096


def _hex_slice_long(col, start: int, length: int):
    """First `length` hex digits of md5(col) as a non-negative long —
    the engine-portable hash (DuckDB: CAST('0x' || substr(md5(x),...)
    AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


def hashed_weight_table(spark: SparkSession, dim: int = DEFAULT_DIM) -> DataFrame:
    """The "model": bucket → integer weight in [-100, 100] (×100
    fixed-point), derived from md5(bucket) so both engines can build
    it. Swap this constructor for `spark.read.parquet(model_path)` in
    production; every downstream plan is unchanged."""
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        (_hex_slice_long(F.col("id").cast("string"), 1, 8) % 201 - 100).alias(
            "weight"
        ),
    )


def hashed_bow_scores(docs: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """Per-document linear-classifier logit over hashed bag-of-words
    features. Columns: doc_id, logit_x100 (exact bigint), score
    (double, logit/100), keep (logit > 0). The sigmoid is monotone in
    the logit, so gating on `keep`/score is gating on probability."""
    weights = hashed_weight_table(docs.sparkSession, dim)
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
    bucketed = toks.select(
        "doc_id", (_hex_slice_long(F.col("tok"), 1, 8) % dim).alias("bucket")
    )
    return (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("weight").alias("logit_x100"))
        .select(
            "doc_id",
            "logit_x100",
            (F.col("logit_x100").cast("double") / 100.0).alias("score"),
            (F.col("logit_x100") > 0).alias("keep"),
        )
    )


def classifier_auc(docs: DataFrame, label_col) -> DataFrame:
    """Exact ROC-AUC of the hashed-BoW classifier against a boolean
    label — the in-engine evaluation closing the train → score →
    evaluate loop. AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻),
    computed from the DISTINCT-LOGIT count table: logits are integer
    fixed-point, so the table is bounded by the logit range (not the
    corpus), and the pairwise probability is an exact sum of
    pos(s)·(neg_below(s) + ½·neg(s)) over it.

    Scale: one corpus scan into the logit histogram; the neg-below
    table is a theta self-join of the BOUNDED histogram (a global
    window would be an Exchange SinglePartition; the join shape is
    size-independent of the corpus). Pair counts sum in DECIMAL —
    P·N overflows bigint at corpus scale. Output: n_pos, n_neg, auc."""
    scored = hashed_bow_scores(docs).join(
        docs.select("doc_id", label_col.cast("int").alias("_y")), "doc_id"
    )
    vc = (
        scored.groupBy("logit_x100")
        .agg(
            F.sum("_y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("_y")).alias("neg"),
        )
        .persist_tracked()  # read by both sides of the theta join + totals
    )
    a = vc.select(
        F.col("logit_x100").alias("s"), F.col("pos").alias("p"), F.col("neg").alias("n")
    )
    b = vc.select(F.col("logit_x100").alias("s2"), F.col("neg").alias("n2"))
    nb = (
        a.join(b, F.col("s2") < F.col("s"), "left")
        .groupBy("s", "p", "n")
        .agg(F.coalesce(F.sum("n2"), F.lit(0)).alias("neg_below"))
    )
    num = F.sum(
        (
            F.col("p").cast("decimal(18,0)")
            * (F.col("neg_below") * 2 + F.col("n")).cast("decimal(18,0)")
        ).cast("decimal(38,0)")
    )  # 2× numerator keeps the half-weight tie term integral
    totals = nb.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
        num.alias("_num2"),
    )
    return totals.select(
        "n_pos",
        "n_neg",
        (
            F.col("_num2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        ).alias("auc"),
    )


def roc_curve(docs: DataFrame, label_col) -> DataFrame:
    """Exact ROC operating points of the hashed-BoW classifier — one
    row per DISTINCT logit threshold s: confusion counts and rates of
    the rule "predict positive iff logit >= s". The curve AUC
    summarizes into one number (classifier_auc); operations teams
    read the CURVE to pick the production threshold.

    Same scale contract as classifier_auc: the corpus reduces to the
    distinct-logit count table (bounded by the integer logit range,
    not the corpus), cumulative TP/FP come from a theta self-join of
    that BOUNDED table (s2 >= s) with map-side-combined sums — never
    a global-ordered window (Exchange SinglePartition) and never a
    collect. Counts are exact integers; tpr/fpr/precision are single
    IEEE divisions of exact integers — value-hash oracleable.

    Output: threshold (logit_x100), tp, fp, fn, tn, tpr, fpr,
    precision — ordered threshold desc (ROC from (0,0) toward (1,1)).
    """
    scored = hashed_bow_scores(docs).join(
        docs.select("doc_id", label_col.cast("int").alias("_y")), "doc_id"
    )
    vc = (
        scored.groupBy("logit_x100")
        .agg(
            F.sum("_y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("_y")).alias("neg"),
        )
        .persist_tracked()  # both sides of the theta join + the totals row
    )
    a = vc.select(F.col("logit_x100").alias("s"))
    b = vc.select(
        F.col("logit_x100").alias("s2"),
        F.col("pos").alias("p2"),
        F.col("neg").alias("n2"),
    )
    cum = (
        a.join(F.broadcast(b), F.col("s2") >= F.col("s"))
        .groupBy("s")
        .agg(
            F.sum("p2").cast("long").alias("tp"),
            F.sum("n2").cast("long").alias("fp"),
        )
    )
    totals = vc.agg(
        F.sum("pos").cast("long").alias("_p"),
        F.sum("neg").cast("long").alias("_n"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.col("s").alias("threshold"),
            "tp",
            "fp",
            (F.col("_p") - F.col("tp")).alias("fn"),
            (F.col("_n") - F.col("fp")).alias("tn"),
            (F.col("tp").cast("double") / F.col("_p").cast("double")).alias("tpr"),
            (F.col("fp").cast("double") / F.col("_n").cast("double")).alias("fpr"),
            (
                F.col("tp").cast("double")
                / (F.col("tp") + F.col("fp")).cast("double")
            ).alias("precision"),
        )
        .orderBy(F.desc("threshold"))
    )
