"""Association rules: hand-computed fixture, a-priori prefilter
semantics, and symmetry invariants."""

from __future__ import annotations

import pytest

from movie_rankings_spark.operators.basket import association_rules


@pytest.fixture(scope="module")
def rules(spark):
    # baskets: 1:{A,B} 2:{A,B} 3:{A,B,C} 4:{A,C} 5:{B} 6:{A}
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "B"), (3, "C"),
        (4, "A"), (4, "C"),
        (5, "B"),
        (6, "A"), (6, "A"),  # line-level repeat must dedup
    ]
    df = spark.createDataFrame(rows, "o long, item string")
    out = association_rules(df, "o", "item", min_item_support=2, min_pair_support=2)
    return {(r["antecedent"], r["consequent"]): r for r in out.collect()}


def test_hand_computed_counts(rules):
    # n_A=5 n_B=4 n_C=2; AB together in {1,2,3}=3; AC in {3,4}=2; BC in {3}=1 (< 2, dropped)
    ab = rules[("A", "B")]
    assert (ab["n_antecedent"], ab["n_consequent"], ab["n_both"], ab["n_baskets"]) == (5, 4, 3, 6)
    assert ab["confidence"] == 3 / 5
    assert ab["lift"] == (3 * 6) / (5 * 4)
    ba = rules[("B", "A")]
    assert ba["confidence"] == 3 / 4
    assert ("B", "C") not in rules and ("C", "B") not in rules


def test_rules_are_bidirectional_with_equal_lift(rules):
    for (a, c), r in rules.items():
        mirror = rules[(c, a)]
        assert r["n_both"] == mirror["n_both"]
        assert r["lift"] == mirror["lift"]


def test_infrequent_items_never_pair(spark):
    # D appears once: below min_item_support, so no rule may contain it
    rows = [(1, "A"), (1, "D"), (2, "A"), (2, "B"), (3, "A"), (3, "B")]
    df = spark.createDataFrame(rows, "o long, item string")
    out = association_rules(df, "o", "item", min_item_support=2, min_pair_support=1)
    items = {r["antecedent"] for r in out.collect()} | {
        r["consequent"] for r in out.collect()
    }
    assert "D" not in items


def test_item_cosine_topk_hand_computed(spark):
    from movie_rankings_spark.operators.basket import item_cosine_topk

    # 4 baskets; items A,B always together; C in half of A's baskets
    rows = []
    for bk, items in [
        (1, ["A", "B", "C"]),
        (2, ["A", "B"]),
        (3, ["A", "B", "C"]),
        (4, ["C", "D"]),
        (5, ["A", "B", "D"]),
    ]:
        rows += [(bk, it) for it in items]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = item_cosine_topk(
        df, "bk", "it", k=3, min_item_support=1, min_pair_support=1,
        max_basket=10,
    ).collect()
    got = {
        (r["item"], r["neighbor"]): (r["cosine"], r["rank"]) for r in out
    }
    import math

    # n_A=4, n_B=4, n_AB=4 -> cos=1; n_C=3, n_AC=2 -> 2/sqrt(12)
    assert abs(got[("A", "B")][0] - 1.0) < 1e-15
    assert got[("A", "B")][1] == 1
    assert abs(got[("A", "C")][0] - 2 / math.sqrt(4 * 3)) < 1e-15
    # top-1 neighbor of C: A and B tie on cosine AND n_both -> A wins
    c_rows = sorted(
        [r for r in out if r["item"] == "C"], key=lambda r: r["rank"]
    )
    assert c_rows[0]["neighbor"] == "A" and c_rows[1]["neighbor"] == "B"


def test_item_cosine_max_basket_drops_power_user(spark):
    from movie_rankings_spark.operators.basket import item_cosine_topk

    rows = [(1, f"i{j}") for j in range(20)]  # one giant basket
    rows += [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = item_cosine_topk(
        df, "bk", "it", k=5, min_item_support=1, min_pair_support=1,
        max_basket=5,
    ).collect()
    # giant basket excluded: only i0-i1 pair from baskets 2,3 remains
    assert {(r["item"], r["neighbor"]) for r in out} == {
        ("i0", "i1"),
        ("i1", "i0"),
    }
    [r] = [r for r in out if r["item"] == "i0"]
    assert r["n_both"] == 2
