"""Changelog → SCD Type-2 history (validity-interval construction).

The companion to ``operators/changelog.py``: where the snapshot keeps
only the latest version per key, SCD2 keeps EVERY version and attaches
the half-open validity interval [valid_from, valid_to) during which it
was current — the standard warehouse shape for "what did this row look
like on date D" queries (answerable with ``valid_from <= D < valid_to``
and no window function at read time).

Scale shape: one shuffle, partitioned by key, each key's history
sorted locally inside its window — never a global sort. The window
frame is ``lead(1)``, so state per key is O(1). At 100 TB of
changelog the cost is the same single exchange the snapshot compaction
pays; unlike the snapshot there is no map-side reduction (every
version survives by definition), so the shuffle carries the history —
that is the floor for this operator, not an inefficiency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changelog: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """One row per changelog version with its validity interval.

    ``version_cols`` orders versions within a key (lexicographic
    struct order; make the last column unique per key — e.g. an event
    id — so the order is total and the intervals deterministic). The
    first version column doubles as the interval clock: ``valid_from``
    is this version's value, ``valid_to`` the next version's (null for
    the current version, which also gets ``is_current = true``).
    """
    order = [F.col(c).asc() for c in version_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    clock = version_cols[0]
    out = changelog.select(*keys, *version_cols, *payload_cols).withColumn(
        "valid_to", F.lead(F.col(clock)).over(w)
    )
    return (
        out.withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(clock, "valid_from")
    )
