"""Multinomial naive-Bayes model training over tokenized text.

Reference parity: no ML surface exists in the reference scraper
(top_movies.py); this extends the classifier tier (hashed-BoW linear
scorer, logistic GD) with the count-based generative baseline every
text-classification pipeline starts from — and, unlike those, its
model is EXACTLY SQL-expressible, so the full trained model is
oracle-hashed rather than gate-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nb_train(
    df: DataFrame,
    class_col: Column,
    tokens_col: Column,
    laplace: int = 1,
) -> DataFrame:
    """Train a multinomial naive-Bayes model: for every
    (class, token) cell of the FULL class × vocabulary grid, the
    Laplace-smoothed conditional

        P(w|c) = (count(w,c) + α) / (Σ_w count(w,c) + α·V)

    plus the class prior P(c) = docs_c / docs_total and the
    one-vs-rest likelihood ratio P(w|c) / P(w|¬c) that ranks each
    class's most discriminative vocabulary (the readout a feature-
    importance dashboard shows; argmax classification at serve time
    is a sum of the model's log-probs — training, not scoring, is
    the distributed job).

    Shape: the fact is read twice BY DESIGN — once exploded into
    map-side-combined (class, token) counts, once for per-class doc
    counts (priors); both are cheap column-pruned scans, and at
    100 TB two scans beat persisting a token-level intermediate. The
    |classes|·|vocab|-bounded count table is persisted and every
    downstream branch (class totals, token totals, vocabulary, the
    dense grid) reads that cache, so no third fact scan exists. The
    dense grid is built class × vocab (both bounded dimension
    tables) with a broadcast join back to counts — absent cells get
    the pure-smoothing probability α/(total_c + α·V), which scoring
    needs.

    Exactness: all counts are exact longs; every probability is one
    correctly-rounded IEEE division of exact integers (and the ratio
    one further division), written identically in the oracle — the
    whole model hashes bit-for-bit.

    Output: one row per (class, token) — class, token, n_wc, n_rest,
    total_c, vocab_size, n_docs_class, n_docs_total, p_w_class,
    p_w_rest, likelihood_ratio, prior_class — ordered by
    (class, token).
    """
    base = df.select(
        class_col.alias("cls"), tokens_col.alias("toks")
    ).filter(F.col("cls").isNotNull())
    cnt = (
        base.select("cls", F.explode("toks").alias("token"))
        .groupBy("cls", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_wc"))
        .persist_tracked()
    )
    docs = (
        base.groupBy("cls")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_class"))
        .persist_tracked()
    )
    docs_tot = docs.agg(
        F.sum("n_docs_class").cast("long").alias("n_docs_total")
    )
    tot_c = cnt.groupBy("cls").agg(
        F.sum("n_wc").cast("long").alias("total_c")
    )
    tot_w = cnt.groupBy("token").agg(
        F.sum("n_wc").cast("long").alias("n_w_all")
    )
    vocab = tot_w.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("n_w_all").cast("long").alias("total_all"),
    )
    grid = (
        tot_c.join(docs, "cls")
        .crossJoin(F.broadcast(tot_w))
        .join(F.broadcast(cnt), ["cls", "token"], "left")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(docs_tot))
    )
    al = F.lit(float(laplace))
    n_wc = F.coalesce(F.col("n_wc"), F.lit(0)).cast("long")
    n_rest = (F.col("n_w_all") - n_wc).cast("long")
    tot_rest = (F.col("total_all") - F.col("total_c")).cast("long")
    av = al * F.col("vocab_size").cast("double")
    p_c = (n_wc.cast("double") + al) / (F.col("total_c").cast("double") + av)
    p_r = (n_rest.cast("double") + al) / (tot_rest.cast("double") + av)
    prior = F.col("n_docs_class").cast("double") / F.col(
        "n_docs_total"
    ).cast("double")
    return (
        grid.select(
            F.col("cls").alias("class"),
            "token",
            n_wc.alias("n_wc"),
            n_rest.alias("n_rest"),
            "total_c",
            "vocab_size",
            "n_docs_class",
            "n_docs_total",
            p_c.alias("p_w_class"),
            p_r.alias("p_w_rest"),
            (p_c / p_r).alias("likelihood_ratio"),
            prior.alias("prior_class"),
        )
        .orderBy("class", "token")
    )


def nb_score(
    docs: DataFrame,
    doc_id_col: Column,
    tokens_col: Column,
    model: DataFrame,
) -> DataFrame:
    """Serve-time scoring under an nb_train model: argmax_c
    [ln P(c) + Σ_w count(w, doc) · ln P(w|c)] per document — the
    classification pass that completes the NB pair (nb_train is the
    distributed job; this is the distributed JOIN that applies it).

    Shape: the doc side reduces to per-doc token counts (map-side
    combined, rows ∝ tokens); ONE equi-join on token against the
    bounded |classes|·|vocab| model grid fans each doc-token row out
    ×|classes|; per-(doc, class) log-likelihoods are a hash
    aggregate; argmax is a per-doc window over |classes| rows.

    Exactness (the bigram-LM ln convention): each cell's ln P(w|c)
    and each ln P(c) is quantized to DECIMAL(18,9) ONCE on the
    bounded grid — cross-engine 1-ulp ln() differences vanish at the
    grid, and everything after (count·lp products, the per-doc sum)
    is exact decimal arithmetic, so scores hash bit-for-bit. Ties
    break toward the lexicographically smaller class. CALLER
    CONTRACT: every scored token must be in the model's vocabulary
    (true when scoring the training corpus; filter or smooth OOV
    upstream otherwise — unseen tokens are dropped by the inner
    join, silently shortening the document).

    Output per doc: doc_id, n_tokens, pred_class, best_score,
    margin (best − runner-up; NULL for single-class models)."""
    from pyspark.sql import Window

    toks = (
        docs.select(doc_id_col.alias("doc_id"), tokens_col.alias("toks"))
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = model.select(
        F.col("class").alias("cls"),
        "token",
        F.log(F.col("p_w_class")).cast("decimal(18,9)").alias("lp"),
    )
    priors = (
        model.select(
            F.col("class").alias("cls"),
            F.log(F.col("prior_class")).cast("decimal(18,9)").alias("lprior"),
        )
        .distinct()
    )
    scored = (
        toks.join(cells, "token")
        .groupBy("doc_id", "cls")
        .agg(
            # cnt as DECIMAL(10,0): a (19,0)x(18,9) product needs
            # precision 38+ and Spark silently DROPS SCALE to fit —
            # (10,0)x(18,9) = (29,9) stays exact (cnt < 10^10 per
            # doc-token is safely above any real document)
            F.sum(
                (F.col("cnt").cast("decimal(10,0)") * F.col("lp")).cast(
                    "decimal(38,9)"
                )
            ).alias("ll"),
            F.sum("cnt").cast("long").alias("n_tokens"),
        )
        .join(F.broadcast(priors), "cls")
        .select(
            "doc_id",
            "cls",
            "n_tokens",
            # (38,9)+(18,9) would need precision 39: Spark silently
            # rounds the result to scale 8. |score| < 10^19 by any
            # real document, so narrow to (28,9) and stay exact.
            (F.col("ll").cast("decimal(28,9)") + F.col("lprior"))
            .cast("decimal(28,9)")
            .alias("s"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("cls").asc()
    )
    ranked = scored.select(
        "doc_id",
        "n_tokens",
        "cls",
        "s",
        F.row_number().over(w).alias("_r"),
        F.lead("s").over(w).alias("_next"),
    ).filter(F.col("_r") == 1)
    return ranked.select(
        "doc_id",
        "n_tokens",
        F.col("cls").alias("pred_class"),
        F.col("s").cast("double").alias("best_score"),
        (F.col("s") - F.col("_next")).cast("double").alias("margin"),
    )
