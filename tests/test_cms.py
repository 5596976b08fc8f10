"""Count-min sketch invariants: never underestimates, exact when the
sketch is wide enough, error bounded by the CMS guarantee, merges."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_word_frequency_report,
)


def _toy(spark):
    rows = [(1, "a a a a b b c " + " ".join(f"t{i}" for i in range(50)))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_never_underestimates_and_exact_when_wide(spark):
    docs = _toy(spark)
    toks = docs.select(F.explode(F.split("text", " ")).alias("word"))
    truth = {r["word"]: r["n"] for r in toks.groupBy("word").agg(F.count("*").alias("n")).collect()}
    sketch = cms_build(toks, "word", depth=4, width=4096)
    probes = toks.select("word").distinct()
    est = {r["word"]: r["cms_est"] for r in cms_estimate(sketch, probes, "word", 4, 4096).collect()}
    assert all(est[w] >= n for w, n in truth.items())
    # 53 distinct tokens in 4096 buckets x 4 rows: collisions in all
    # 4 rows are overwhelmingly unlikely -> exact
    assert est == truth


def test_tight_sketch_overestimates_but_never_under(spark):
    docs = _toy(spark)
    toks = docs.select(F.explode(F.split("text", " ")).alias("word"))
    truth = {r["word"]: r["n"] for r in toks.groupBy("word").agg(F.count("*").alias("n")).collect()}
    sketch = cms_build(toks, "word", depth=2, width=8)
    probes = toks.select("word").distinct()
    est = {r["word"]: r["cms_est"] for r in cms_estimate(sketch, probes, "word", 2, 8).collect()}
    assert all(est[w] >= n for w, n in truth.items())
    assert any(est[w] > n for w, n in truth.items())  # 53 keys in 8 buckets must collide


def test_report_on_corpus(spark, sf_dir):
    from movie_rankings_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = cms_word_frequency_report(docs, depth=4, width=512, min_count=50).collect()
    assert len(rows) > 0
    assert all(r["overestimate"] >= 0 for r in rows)


def test_partial_sketches_merge_by_addition(spark):
    """Cell-wise sum of two half-corpus sketches == whole-corpus
    sketch — the mergeability that makes it a sketch."""
    docs = _toy(spark)
    toks = docs.select(F.explode(F.split("text", " ")).alias("word"))
    all_rows = [r["word"] for r in toks.collect()]
    h1 = spark.createDataFrame([(w,) for w in all_rows[:20]], "word string")
    h2 = spark.createDataFrame([(w,) for w in all_rows[20:]], "word string")
    full = {(r["row"], r["bucket"]): r["n"] for r in cms_build(toks, "word", 3, 64).collect()}
    s1 = cms_build(h1, "word", 3, 64)
    s2 = cms_build(h2, "word", 3, 64)
    merged = {
        (r["row"], r["bucket"]): r["n"]
        for r in s1.unionByName(s2).groupBy("row", "bucket").agg(F.sum("n").alias("n")).collect()
    }
    assert merged == full


def test_join_size_exact_when_width_collision_free(spark):
    """With width >> keys the sketch has no collisions, so the CMS
    inner product equals the exact join size exactly; overestimate 0."""
    from movie_rankings_spark.operators.cms import cms_join_size_report

    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 4]], "k long"
    )
    row = cms_join_size_report(left, right, "k", depth=4, width=4096).collect()[0]
    # exact: 3*1 (k=1) + 2*3 (k=2) = 9; k=3/k=4 don't join
    assert row["exact_join_size"] == 9
    assert row["cms_est"] == 9
    assert row["overestimate"] == 0


def test_join_size_selfjoin_overestimates_never_under(spark):
    """Self-join size Sum(n_k^2): CMS estimate >= exact always (cells
    only add collision mass), and the same-object fast path builds one
    sketch."""
    from movie_rankings_spark.operators.cms import cms_join_size_report

    df = spark.createDataFrame(
        [(i % 7,) for i in range(200)], "k long"
    )
    row = cms_join_size_report(df, df, "k", depth=4, width=8).collect()[0]
    exact = sum(
        n * n
        for n in (29, 29, 29, 29, 28, 28, 28)  # 200 keys over 7 buckets
    )
    assert row["exact_join_size"] == exact
    assert row["cms_est"] >= exact
    assert row["overestimate"] == row["cms_est"] - exact


def test_join_size_disjoint_inputs_is_zero(spark):
    """Disjoint key sets: exact size 0, and the estimate must also be
    0 whenever ANY hash row has no colliding buckets (the row-spine
    fix — an inner join would silently drop the zero-dot row and the
    min would overestimate)."""
    from movie_rankings_spark.operators.cms import cms_join_size_report

    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(100001,), (100002,)], "k long")
    row = cms_join_size_report(left, right, "k", depth=4, width=4096).collect()[0]
    assert row["exact_join_size"] == 0
    assert row["cms_est"] == 0
    assert row["overestimate"] == 0
