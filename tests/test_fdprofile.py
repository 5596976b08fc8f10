"""Cross-table inclusion-dependency discovery
(operators/fdprofile.py::inclusion_dependencies): hand-computed
dangling-value counts and the holds case."""

from __future__ import annotations

def test_inclusion_dependencies_hand_computed(spark):
    from movie_rankings_spark.operators.fdprofile import (
        inclusion_dependencies,
    )
    from pyspark.sql import functions as F  # noqa: F401

    dep = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (None,)], "k int"
    )
    ref = spark.createDataFrame([(1,), (2,), (9,)], "k int")
    out = {
        r["pair_label"]: r
        for r in inclusion_dependencies(
            [("a_in_b", dep, "k", ref, "k"), ("b_in_a", ref, "k", dep, "k")]
        ).collect()
    }
    a = out["a_in_b"]  # {1,2,3} vs {1,2,9}: 3 dangles
    assert (a["n_distinct_dep"], a["n_dangling"]) == (3, 1)
    assert not a["ind_holds"]
    assert abs(a["dangling_share"] - 1 / 3) < 1e-15
    b = out["b_in_a"]  # {1,2,9} vs {1,2,3}: 9 dangles
    assert (b["n_distinct_dep"], b["n_dangling"]) == (3, 1)


def test_inclusion_dependency_holds_case(spark):
    from movie_rankings_spark.operators.fdprofile import (
        inclusion_dependencies,
    )

    dep = spark.createDataFrame([(1,), (2,)], "k int")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    [r] = inclusion_dependencies([("ok", dep, "k", ref, "k")]).collect()
    assert r["ind_holds"] and r["n_dangling"] == 0
    assert r["dangling_share"] == 0.0
