"""Snapshot reconciliation: table-version diff and incremental
aggregate maintenance (SURVEY.md §2 [EXT] — the reference rebuilds its
whole result from scratch each run (`top_movies.py:150-157`); these are
the two operations that replace full rebuilds once the input no longer
fits a single pass).

Scale posture:

  * ``snapshot_diff`` — ONE full-outer shuffle join on the key. The
    classification predicate (any payload column ``IS DISTINCT
    FROM`` its counterpart) is evaluated post-join, JVM-side, no
    UDF. When only the classification (not the payloads) is needed
    downstream, project each side to (key, fingerprint) BEFORE the
    join — ``with_fingerprint`` below — so the shuffle carries two
    narrow columns instead of the full row width; the join itself is
    identical.
  * ``merge_partial_aggs`` — the algebraic identity hash aggregation
    already relies on: SUM/COUNT partials from disjoint row sets
    union-then-reaggregate to exactly the full-scan result (decimal
    sums keep it exact, not approximately-associative doubles). This
    is what turns a 100 TB nightly rebuild into
    "aggregate yesterday's delta, merge".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fingerprint(
    df: DataFrame, keys: Sequence[str], payload: Sequence[str]
) -> DataFrame:
    """(keys, fingerprint) projection for narrow-shuffle diffs: md5
    over a null-sentineled, unit-separated canonical string. String
    casts make this engine-portable for string/integer payloads;
    float/timestamp payloads should be compared column-wise instead
    (cast-to-string formats diverge across engines)."""
    canon = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in payload],
    )
    return df.select(*keys, F.md5(canon).alias("fingerprint"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Classify every key across two table versions: ``added``
    (new only), ``removed`` (old only), ``changed`` (both, any
    payload column differs), ``unchanged``. One full-outer equi-join
    on the key; null-safe column comparison, so NULL→value and
    value→NULL count as changes."""
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in payload],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in payload],
    )
    cond = [o[f"_ok_{k}"] == n[f"_nk_{k}"] for k in keys]
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ok_{keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull()
    differs = F.lit(False)
    for c in payload:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
    )


def merge_partial_aggs(
    partials: Sequence[DataFrame],
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Re-aggregate per-partition/per-period partial aggregates into
    the exact full-data result: SUM of partial SUMs, SUM of partial
    COUNTs. Inputs must cover disjoint row sets; sums must already be
    exact (decimal), so merging is order-independent."""
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).alias(count_col),
    )
