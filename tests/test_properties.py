"""Property-based tests (SURVEY.md §5 item 4) — hypothesis-generated
inputs, each example batched into ONE DataFrame so a property costs one
Spark job, plus a differential check against a faithful pandas
restatement of the reference pipeline (§5 item 3).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from movie_rankings_spark.functions.normalize import coerce_rank, normalize_title
from movie_rankings_spark.operators.flagship import (
    aggregate_rankings,
    filter_in_all_lists,
    normalize_scraped,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_title = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x036F),
    min_size=0,
    max_size=40,
)


@_SETTINGS
@given(st.lists(_title, min_size=1, max_size=25))
def test_normalize_title_idempotent(spark, titles):
    """norm(norm(x)) == norm(x) for arbitrary unicode input."""
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    bad = (
        df.select(
            normalize_title(F.col("title")).alias("n1"),
        )
        .select("n1", normalize_title(F.col("n1")).alias("n2"))
        .filter(F.col("n1") != F.col("n2"))
        .count()
    )
    assert bad == 0


@_SETTINGS
@given(st.lists(st.one_of(st.integers(-999, 999).map(str), _title), min_size=1, max_size=25))
def test_coerce_rank_total_and_exact_on_ints(spark, ranks):
    """coerce_rank never yields null, and is exact on canonical ints."""
    df = spark.createDataFrame([(r,) for r in ranks], "rank string")
    rows = df.select("rank", coerce_rank(F.col("rank")).alias("c")).collect()
    for r in rows:
        assert r["c"] is not None
        try:
            expected = int(r["rank"])
        except ValueError:
            continue
        if str(expected) == r["rank"].strip() or r["rank"].lstrip("-").isdigit():
            assert r["c"] == expected, r


_scraped_rows = st.lists(
    st.tuples(
        st.sampled_from(["src_a", "src_b", "src_c"]),
        st.integers(0, 50).map(str),
        st.sampled_from(["alpha", "beta", "gamma", "delta", "Alpha!", "be ta"]),
    ),
    min_size=1,
    max_size=40,
)


def _reference_pandas(rows: list[tuple[str, str, str]]) -> dict[str, tuple[int, float]]:
    """Faithful pandas restatement of print_lists
    (/root/reference/top_movies.py:128-144): coerce, normalize,
    keep groups of exactly 3 rows, aggregate sum+mean."""
    df = pd.DataFrame(rows, columns=["url", "rank", "title"])
    df["rank"] = (
        pd.to_numeric(df["rank"], errors="coerce").fillna(0).astype(int)
    )
    df["title_comp"] = (
        df["title"]
        .str.replace(r"[^a-zA-Z0-9 ]", "", regex=True)
        .str.replace(r"\s{2,}", " ", regex=True)
        .str.lower()
    )
    kept = df.groupby("title_comp").filter(lambda g: len(g) == 3)
    out = kept.groupby("title_comp")["rank"].agg(["sum", "mean"])
    return {t: (int(s), float(m)) for t, (s, m) in out.iterrows()}


@_SETTINGS
@given(_scraped_rows)
def test_flagship_differential_vs_pandas(spark, rows):
    """Spark pipeline == pandas reference restatement on arbitrary
    scraped tables (pre-top-k, so no tie-break ambiguity)."""
    df = spark.createDataFrame(rows, "url string, rank string, title string")
    norm = normalize_scraped(df, apply_aliases=False)
    agg = aggregate_rankings(filter_in_all_lists(norm, n_sources=3))
    got = {
        r["title_comp"]: (r["rank_sum"], r["rank_avg"]) for r in agg.collect()
    }
    want = _reference_pandas(rows)
    assert got == want


@_SETTINGS
@given(_scraped_rows)
def test_group_filter_invariant(spark, rows):
    """Every surviving title_comp has exactly n_sources rows."""
    df = spark.createDataFrame(rows, "url string, rank string, title string")
    norm = normalize_scraped(df, apply_aliases=False)
    counts = (
        filter_in_all_lists(norm, n_sources=3)
        .groupBy("title_comp")
        .count()
        .collect()
    )
    assert all(r["count"] == 3 for r in counts)


def test_topk_is_prefix_of_full_sort(spark):
    """flagship top-k == first k rows of the fully-sorted aggregate
    (deterministic: rank_sum + title_comp tie-break)."""
    from movie_rankings_spark.operators.flagship import flagship
    from movie_rankings_spark.sources.fixtures import scraped_fixture_df

    df = scraped_fixture_df(spark)
    top5 = [
        r["title_comp"] for r in flagship(df, n_sources=3, k=5).collect()
    ]
    full = [
        r["title_comp"]
        for r in flagship(df, n_sources=3, k=10_000)
        .orderBy("rank_sum", "title_comp")
        .collect()
    ]
    assert top5 == full[:5]


# Tight rank range + small title alphabet ⇒ rank_sum ties are the
# NORM in these examples, which is the point: the reference's pandas
# sort is unstable under ties, ours pins (rank_sum ASC, title_comp
# ASC), and this property proves the pinned total order can never
# flip the top-k for either group-predicate semantics (SURVEY.md §7
# risk register, r5 verdict item 6).
_tied_rows = st.lists(
    st.tuples(
        st.sampled_from(["src_a", "src_b", "src_c"]),
        st.integers(0, 3).map(str),
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    ),
    min_size=3,
    max_size=40,
)


@_SETTINGS
@given(_tied_rows)
@pytest.mark.parametrize("distinct_sources", [False, True])
def test_flagship_topk_tiebreak_total_order(spark, distinct_sources, rows):
    """Spark top-k == Python reference sorted by the pinned
    (rank_sum ASC, title_comp ASC) total order, through heavy
    rank_sum ties, for BOTH the row-count (reference-parity) and
    distinct-source group predicates."""
    from movie_rankings_spark.operators.flagship import flagship

    df = spark.createDataFrame(rows, "url string, rank string, title string")
    got = [
        (r["title_comp"], r["rank_sum"])
        for r in flagship(
            df,
            n_sources=3,
            k=3,
            apply_aliases=False,
            distinct_sources=distinct_sources,
        ).collect()
    ]
    pdf = pd.DataFrame(rows, columns=["url", "rank", "title"])
    pdf["rank"] = (
        pd.to_numeric(pdf["rank"], errors="coerce").fillna(0).astype(int)
    )
    pdf["title_comp"] = (
        pdf["title"]
        .str.replace(r"[^a-zA-Z0-9 ]", "", regex=True)
        .str.replace(r"\s{2,}", " ", regex=True)
        .str.lower()
    )
    if distinct_sources:
        kept = pdf.groupby("title_comp").filter(
            lambda g: g["url"].nunique() == 3
        )
    else:
        kept = pdf.groupby("title_comp").filter(lambda g: len(g) == 3)
    agg = kept.groupby("title_comp")["rank"].sum()
    want = sorted(
        ((t, int(s)) for t, s in agg.items()), key=lambda x: (x[1], x[0])
    )[:3]
    assert got == want


_events = st.lists(
    st.tuples(
        st.integers(0, 3),          # user_id (few keys -> collisions)
        st.integers(0, 50),         # ts seconds (small range -> ties)
        st.booleans(),              # is_query side?
    ),
    min_size=1,
    max_size=30,
)


@_SETTINGS
@given(_events)
def test_asof_join_matches_python_reference(spark, rows):
    """asof_join == brute-force latest-strictly-prior scan, including
    same-timestamp exclusion, for arbitrary key/ts collisions."""
    import datetime as dt

    from movie_rankings_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    lefts, rights = [], []
    for i, (uid, ts_s, is_q) in enumerate(rows):
        rec = (i, uid, base + dt.timedelta(seconds=ts_s))
        (lefts if is_q else rights).append(rec)
    if not lefts:
        lefts = [(999, 0, base)]
    # determinism contract: at most one right row per (key, ts)
    seen, dedup_rights = set(), []
    for rid, uid, ts in sorted(rights, reverse=True):
        if (uid, ts) not in seen:
            seen.add((uid, ts))
            dedup_rights.append((rid, uid, ts))
    left_df = spark.createDataFrame(lefts, "qid long, user_id long, ts timestamp")
    right_df = spark.createDataFrame(
        dedup_rights or [(-1, -99, base)], "rid long, user_id long, ts timestamp"
    )
    got = {
        r["qid"]: r["prev_rid"]
        for r in asof_join(
            left_df, right_df, ["user_id"], "ts", ["rid"], strict=True
        ).collect()
    }
    want = {}
    for qid, uid, ts in lefts:
        prior = [
            (rts, rid)
            for rid, ruid, rts in (dedup_rights or [(-1, -99, base)])
            if ruid == uid and rts < ts
        ]
        want[qid] = max(prior)[1] if prior else None
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),  # (user, ts sec)
        min_size=1,
        max_size=40,
    )
)
def test_sessionize_gap_invariants(spark, rows):
    """Within a session every consecutive gap <= threshold; the first
    event of every later session arrives > threshold after the
    previous event; session_seq starts at 1 and increments by 0/1."""
    import datetime as dt

    from movie_rankings_spark.operators.sessionize import sessionize

    GAP_MIN = 10
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, uid, base + dt.timedelta(seconds=ts_s))
        for i, (uid, ts_s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")
    out = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["session_seq"])
            for r in sessionize(df, gap_minutes=GAP_MIN).collect()
        )
    )
    by_user = {}
    for uid, ts, eid, seq in out:
        by_user.setdefault(uid, []).append((ts, eid, seq))
    for evs in by_user.values():
        assert evs[0][2] == 1
        for (t0, _, s0), (t1, _, s1) in zip(evs, evs[1:]):
            gap = (t1 - t0).total_seconds()
            if s1 == s0:
                assert gap <= GAP_MIN * 60
            else:
                assert s1 == s0 + 1 and gap > GAP_MIN * 60


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),           # user
            st.integers(0, 30),          # ts sec (ties likely)
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_counts_match_python_reference(spark, rows):
    """Funnel stage counts == brute-force strictly-ordered scan."""
    import datetime as dt

    from movie_rankings_spark.operators.funnel import funnel_counts

    STAGES = ["view", "click", "purchase"]
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, uid, base + dt.timedelta(seconds=s), et)
        for i, (uid, s, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["stage"], r["event_type"]): r["n_users"]
        for r in funnel_counts(df, STAGES).collect()
    }
    want = {(i, s): 0 for i, s in enumerate(STAGES, start=1)}
    for uid in {u for _, u, _, _ in data}:
        evs = sorted((ts, et) for _, u, ts, et in data if u == uid)
        prev_t = None
        for i, stage in enumerate(STAGES, start=1):
            hits = [t for t, et in evs if et == stage and (prev_t is None or t > prev_t)]
            if not hits:
                break
            want[(i, stage)] += 1
            prev_t = min(hits)
    assert got == want


_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
_doc_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@_SETTINGS
@given(st.lists(_doc_text, min_size=2, max_size=14))
def test_prefix_join_equals_full_inverted_index(spark, texts):
    """Prefix filtering must be EXACT on arbitrary corpora: same edge
    set and jaccard values as the full inverted-index join — the
    AllPairs no-false-negatives guarantee under the lenient bounds."""
    from movie_rankings_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, n=2, threshold=0.4).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_prefix_pairs(df, n=2, threshold=0.4).collect()
    }
    assert pref == full


@_SETTINGS
@given(st.lists(_word, min_size=1, max_size=60))
def test_cms_never_underestimates(spark, tokens):
    """CMS estimate >= true count for every key, at any width."""
    from collections import Counter

    from movie_rankings_spark.operators.cms import cms_build, cms_estimate

    df = spark.createDataFrame([(t,) for t in tokens], "word string")
    truth = Counter(tokens)
    sketch = cms_build(df, "word", depth=2, width=4)
    probes = df.distinct()
    est = {
        r["word"]: r["cms_est"]
        for r in cms_estimate(sketch, probes, "word", 2, 4).collect()
    }
    assert all(est[w] >= c for w, c in truth.items())


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.sampled_from("ABCDE")),
        min_size=1,
        max_size=30,
    )
)
def test_association_rules_match_python_reference(spark, pairs):
    """Support/confidence/lift vs a dict-based reference on random
    basket data (dedup of line repeats included)."""
    from collections import defaultdict

    from movie_rankings_spark.operators.basket import association_rules

    df = spark.createDataFrame(pairs, "o long, item string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_antecedent"], r["n_consequent"], r["n_both"],
            r["confidence"], r["lift"],
        )
        for r in association_rules(df, "o", "item", 1, 1).collect()
    }
    baskets = defaultdict(set)
    for o, i in pairs:
        baskets[o].add(i)
    support = defaultdict(int)
    both = defaultdict(int)
    for items in baskets.values():
        for i in items:
            support[i] += 1
        for a in items:
            for b in items:
                if a < b:
                    both[(a, b)] += 1
    nb = len(baskets)
    want = {}
    for (a, b), n in both.items():
        want[(a, b)] = (support[a], support[b], n, n / support[a], n * nb / (support[a] * support[b]))
        want[(b, a)] = (support[b], support[a], n, n / support[b], n * nb / (support[a] * support[b]))
    assert got == want


def test_session_paths_hand_computed(spark):
    """One user, one session, known sequence -> known trigrams; a gap
    splits the path."""
    from movie_rankings_spark.operators.sessionize import session_paths

    rows = [
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:01:00", 7, "click"),
        (3, "2024-01-01 10:02:00", 7, "purchase"),
        (4, "2024-01-01 10:03:00", 7, "view"),
        # 7-hour gap: new session -> no trigram spans it
        (5, "2024-01-01 17:30:00", 7, "view"),
        (6, "2024-01-01 17:31:00", 7, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type")
    got = {
        r["path"]: r["n_occurrences"]
        for r in session_paths(df, 360, 3, 10).collect()
    }
    assert got == {"view click purchase": 1, "click purchase view": 1}


def test_transition_matrix_rows_sum_to_one(spark, sf_dir):
    from movie_rankings_spark.catalog import load_table
    from movie_rankings_spark.operators.sessionize import (
        session_transition_matrix,
    )

    out = session_transition_matrix(load_table(spark, sf_dir, "events")).collect()
    from collections import defaultdict
    rows = defaultdict(float)
    for r in out:
        assert 0.0 < r["prob"] <= 1.0
        rows[r["cur_type"]] += r["prob"]
    assert rows and all(abs(s - 1.0) < 1e-9 for s in rows.values())


@given(
    vals=st.lists(
        st.sampled_from([0.0, 0.25, 0.5, 0.5, 0.75, 1.0]), min_size=1, max_size=40
    ),
    take=st.integers(min_value=1, max_value=45),
)
@settings(max_examples=200, deadline=None)
def test_topk_tie_safe_matches_lexsort(vals, take):
    """_topk_tie_safe must select exactly the indices a full
    (-value, vec_id) lexsort would keep — ESPECIALLY through tie
    groups straddling the cut line (the r5 advice fix: argpartition
    orders equal floats arbitrarily)."""
    import numpy as np

    from movie_rankings_spark.operators.similarity import _topk_tie_safe

    col = np.array(vals, dtype=np.float64)
    vec_ids = np.arange(len(vals), dtype=np.int64) * 7 % (len(vals) * 7 + 1)
    take = min(take, len(vals))
    got = sorted(_topk_tie_safe(col, vec_ids, take).tolist())
    order = np.lexsort((vec_ids, -col))
    want = sorted(order[:take].tolist())
    assert got == want
