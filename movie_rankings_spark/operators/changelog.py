"""Changelog → snapshot compaction (the CDC "upsert" read path).

A changelog is an append-only stream of keyed versions; the snapshot
is the latest version per key. The textbook formulation is
``row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1``,
which materializes and SORTS every key's full history. This
implements the same argmax as a ``max_by`` AGGREGATION instead:

- partial aggregation combines map-side, so each input partition
  forwards at most one candidate row per key it touches;
- one shuffle of pre-reduced (key, latest) pairs, no sort anywhere.

At 100 TB of changelog with a bounded key space the map-side combine
shrinks shuffle volume by the key update factor — the difference
between shuffling the history and shuffling the snapshot. Determinism
requires the version struct to be a total order per key; pass a
unique tie-breaker (e.g. event_id) as its last field.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    changelog: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """One row per key: the version columns and payload of the
    maximal version, plus ``n_versions`` (total changelog entries
    compacted into the row).

    ``version_cols`` orders lexicographically (struct comparison);
    its last column must be unique per key for a deterministic
    payload. ``F.max(version) == version-of-max_by`` because both use
    the same struct ordering, so the two aggregates agree.
    """
    ver = F.struct(*[F.col(c) for c in version_cols])
    agg = changelog.groupBy(*keys).agg(
        F.max(ver).alias("_ver"),
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), ver).alias("_pay"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return agg.select(
        *keys,
        *[F.col(f"_ver.{c}").alias(c) for c in version_cols],
        *[F.col(f"_pay.{c}").alias(c) for c in payload_cols],
        F.col("n_versions"),
    )
