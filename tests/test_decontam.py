from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_clean_corpus_shares_no_shingle_with_benchmark(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(docs, bench, n=3)
    # re-probe the clean corpus: zero hits by definition
    assert contamination_report(clean, bench, n=3).count() == 0


def test_clean_plus_contaminated_partitions_corpus(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    n_total = docs.count()
    n_contaminated = contamination_report(docs, bench, n=3).count()
    n_clean = decontaminate(docs, bench, n=3).count()
    assert n_clean + n_contaminated == n_total
    # benchmark docs live in the corpus, so each self-hits (every doc
    # in the fixture has >= 3 words and therefore >= 1 shingle)
    assert n_contaminated >= bench.count() > 0


def test_probe_side_broadcasts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    df = contamination_report(docs, bench, n=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles to join
    assert "SortMergeJoin" not in plan


def test_redact_pii_patterns(spark):
    from movie_rankings_spark.functions.text import redact_pii

    rows = [
        ("mail me at a.b+c@sub.example.co.uk.",),
        ("call 555-123-4567 or 555.987.6543 now",),
        ("no pii here 12345",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r.red for r in df.select(redact_pii(F.col("text")).alias("red")).collect()]
    assert got[0] == "mail me at <EMAIL>."
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "no pii here 12345"


def test_bloom_gate_equals_exact_report(spark, sf_dir):
    from movie_rankings_spark.catalog import load_table
    from movie_rankings_spark.operators.decontam import (
        contamination_report,
        contamination_report_bloom,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact = {(r["doc_id"], r["n_hits"]) for r in contamination_report(docs, bench).collect()}
    bloom = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_report_bloom(docs, bench).collect()
    }
    assert bloom == exact and len(exact) > 0


def test_bloom_gate_exact_even_when_saturated(spark):
    """A deliberately tiny bloom (massive FP rate) must still return
    the exact answer — the verify join owns precision; the sketch
    only owns recall, which is structural."""
    from movie_rankings_spark.operators.decontam import (
        contamination_report,
        contamination_report_bloom,
    )

    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} common one two three") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(rows[:3], "doc_id long, text string")
    exact = {(r["doc_id"], r["n_hits"]) for r in contamination_report(docs, bench).collect()}
    tiny = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_report_bloom(docs, bench, num_bits=64, num_hashes=2).collect()
    }
    assert tiny == exact
