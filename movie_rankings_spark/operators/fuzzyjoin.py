"""Fuzzy title similarity join (SURVEY.md §2c J3).

The reference resolves cross-source title disagreements with a
hand-maintained rename list (/root/reference/top_movies.py:76-77,91-94)
and its README wishes for "a better way of matching titles"
(README.md:9). This operator generalizes that: discover candidate
alias pairs by token-set Jaccard between normalized titles.

Same scale shape as the n-gram dedup tier: inverted-index equi-join on
tokens (linear in total tokens, never all-pairs), size-ratio prefilter
(an upper bound on Jaccard, so exact), then the Jaccard from shared
token counts. Output feeds a human-curated alias dimension — the
"centralized conversion list" the reference asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.normalize import normalize_title


def fuzzy_title_pairs(scraped: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Distinct normalized-title pairs with token-set Jaccard >=
    threshold. Columns: title_a, title_b, jaccard (title_a < title_b).

    Raw titles, no alias overrides — the point is discovering what the
    override list should contain."""
    titles = (
        scraped.select(normalize_title(F.col("title")).alias("tc"))
        .filter(F.col("tc") != "")
        .distinct()
        .select(
            "tc",
            F.array_distinct(F.split(F.col("tc"), " ")).alias("toks"),
        )
        .withColumn("n_toks", F.size("toks"))
    )
    inv = titles.select("tc", "n_toks", F.explode("toks").alias("tok"))
    a = inv.select(
        F.col("tc").alias("title_a"), F.col("n_toks").alias("n_a"), "tok"
    )
    b = inv.select(
        F.col("tc").alias("title_b"), F.col("n_toks").alias("n_b"), "tok"
    )
    inter = (
        a.join(b, "tok")
        .filter(
            (F.col("title_a") < F.col("title_b"))
            & (F.col("n_a") >= threshold * F.col("n_b"))
            & (F.col("n_b") >= threshold * F.col("n_a"))
        )
        .groupBy("title_a", "title_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    jaccard = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("title_a", "title_b", "jaccard")
    )
