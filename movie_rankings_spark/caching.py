"""Library-scoped persist tracking + release hook.

Operators persist reused intermediates (join sides, iterative state,
threshold tables) and cannot unpersist them before returning — the
returned lazy plan still references them. In a long-lived session
those entries accumulate into executor memory pressure, and without
this hook the only remedy was a catalog-wide
``spark.catalog.clearCache()`` that also evicts the CONSUMER's own
cached frames (the advice finding on hll_pairwise_overlap et al.).

Every persist inside this library goes through
``DataFrame.persist_tracked()`` (registered here, pandas-accessor
style — ``DataFrame.persist`` itself is untouched), which records the
handle in a module registry. After materializing a query's result,
call :func:`release_persisted` to unpersist exactly the library's
intermediates — consumer caches survive.

Releasing before a returned plan is materialized is safe (Spark
recomputes), it just forfeits the reuse the persist bought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def _persist_tracked(self: DataFrame, *args, **kwargs) -> DataFrame:
    """``df.persist(...)`` + registration in the library's release
    registry. Same signature/return as ``DataFrame.persist``."""
    out = self.persist(*args, **kwargs)
    _TRACKED.append(out)
    return out


DataFrame.persist_tracked = _persist_tracked  # type: ignore[attr-defined]


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every DataFrame this library persisted since the last
    release; returns how many were released. Only library-tracked
    frames are touched — never the consumer's own cache. Dropping the
    strong references here also lets the ContextCleaner reap any
    localCheckpoint RDDs the released plans were pinning."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    _TRACKED.clear()
    return n


def tracked_count() -> int:
    """Number of currently tracked (not yet released) persists."""
    return len(_TRACKED)
