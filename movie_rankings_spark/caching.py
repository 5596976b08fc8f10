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

Thread-safety: the registry is guarded by a lock, and it is
THREAD-SCOPED — each thread tracks (and releases) only its own
persists, so concurrent queries on one SparkSession cannot release
each other's in-flight intermediates. ``release_persisted`` from a
thread touches only that thread's entries; :class:`scoped_persists`
offers an explicit per-query registry for callers who want release
bounded to a block regardless of threading.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
# thread ident -> that thread's tracked persists (insertion order)
_TRACKED: dict[int, list[DataFrame]] = {}


def _bucket() -> list[DataFrame]:
    ident = threading.get_ident()
    with _LOCK:
        return _TRACKED.setdefault(ident, [])


def _persist_tracked(self: DataFrame, *args, **kwargs) -> DataFrame:
    """``df.persist(...)`` + registration in the calling thread's
    release registry. Same signature/return as ``DataFrame.persist``."""
    out = self.persist(*args, **kwargs)
    bucket = _bucket()
    with _LOCK:
        bucket.append(out)
    return out


DataFrame.persist_tracked = _persist_tracked  # type: ignore[attr-defined]


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every DataFrame THIS THREAD persisted since its last
    release; returns how many were released. Only library-tracked
    frames from the calling thread are touched — never the consumer's
    own cache, never another thread's in-flight intermediates.
    Dropping the strong references here also lets the ContextCleaner
    reap any localCheckpoint RDDs the released plans were pinning."""
    ident = threading.get_ident()
    with _LOCK:
        frames = _TRACKED.pop(ident, [])
    n = 0
    for df in frames:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n


def tracked_count() -> int:
    """Number of currently tracked (not yet released) persists for the
    calling thread."""
    ident = threading.get_ident()
    with _LOCK:
        return len(_TRACKED.get(ident, ()))


class scoped_persists:
    """Context manager bounding persist tracking to a block: on exit,
    releases exactly the persists the block created on this thread
    (entries tracked before entry survive untouched).

    with scoped_persists():
        df = expensive_operator(...)
        df.collect()
    # the operator's intermediates are unpersisted here
    """

    def __enter__(self) -> "scoped_persists":
        bucket = _bucket()
        with _LOCK:
            self._mark = len(bucket)
        return self

    def __exit__(self, *exc) -> None:
        ident = threading.get_ident()
        with _LOCK:
            bucket = _TRACKED.get(ident, [])
            frames = bucket[self._mark :]
            del bucket[self._mark :]
        for df in frames:
            try:
                df.unpersist(False)
            except Exception:  # noqa: BLE001
                pass
