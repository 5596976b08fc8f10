"""movie_rankings_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of ``ewmiears/Movie-rankings`` (reference at
``/root/reference``), extended with the LLM-data-pipeline operator tier
(dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale.

Layout:
    session    — SparkSession factory (AQE on, explicit shuffle sizing)
    catalog    — parquet table loading / temp-view registration
    functions/ — scalar expression library (normalization, text, vectors)
    sources/   — ingestion: scrape-source registry, HTML dialect
                 extractors (Arrow-batched), fixtures
    operators/ — relational + LLM-pipeline operators as DataFrame
                 compositions (flagship, relational, dedup, similarity,
                 text analysis, top-k)
    streaming/ — Structured Streaming tier over the events table
"""

__version__ = "0.1.0"

import os as _os
import sys as _sys


def _ensure_protobuf() -> None:
    """Make ``google.protobuf`` importable, falling back to the
    vendored pure-Python runtime (vendor/google/protobuf, 6.32.0 —
    see vendor/README.md) when no real installation exists.

    transformWithStateInPandas needs it on BOTH sides of the state
    protocol, so the vendor dir goes on this process's ``sys.path``
    AND on ``PYTHONPATH`` — set here, at package import, i.e. before
    any SparkSession launches the JVM gateway, so executor-spawned
    Python workers inherit it. A genuine installation always wins
    (we only touch paths when the import fails)."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    vendor = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "vendor",
    )
    if not _os.path.isdir(_os.path.join(vendor, "google", "protobuf")):
        return
    if vendor not in _sys.path:
        _sys.path.insert(0, vendor)
    # gencode 6.33.0 vs vendored runtime 6.32.0: same major, one
    # minor apart — suppress the strict gate via protobuf's own knob;
    # wire compatibility is proven by the registered oracle query.
    _os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    pp = _os.environ.get("PYTHONPATH", "")
    if vendor not in pp.split(_os.pathsep):
        _os.environ["PYTHONPATH"] = (
            vendor + (_os.pathsep + pp if pp else "")
        )


_ensure_protobuf()

from movie_rankings_spark.caching import (  # noqa: E402,F401 — public hook
    release_persisted,
    tracked_count,
)
