"""Multimodal columns (north_star tier): image/audio/video as opaque
`binary` payloads plus typed metadata structs.

The Spark-side plumbing is real and tested — schema, Arrow batch flow
through mapInPandas, per-kind dispatch, frame-sampling explode. The
actual codec step is STUBBED: this container ships no image/audio
libraries, so `decode_image` raises NotImplementedError unless PIL is
importable, and the feature extractor uses a deterministic
byte-histogram stand-in. Swapping in a real decoder changes only the
body of `_decode_payload` — no plan shape, schema, or partitioning
changes.

Scale notes: payloads ride the Arrow stream; keep
spark.sql.execution.arrow.maxRecordsPerBatch low enough that
batch_rows × payload_size fits executor memory (for 1 MB images the
10k default is wrong — set ~256). Feature extraction is
embarrassingly parallel: no shuffle anywhere in this module until a
caller aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # real decoder if the environment has one
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width int, height int, sample_rate int, "
    "duration_ms int, format string>"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = f"media_id long, kind string, feature array<double>"


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: payload
    is the utf-8 text; kind/meta assigned by doc_id. Exists so the
    binary-column pipeline is testable without codec libraries."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        ((F.col("doc_id") % 120 + 1) * 1000).cast("int").alias("duration_ms"),
        F.lit("synthetic").alias("format"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real image decode requires PIL/opencv, absent here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv, which this environment "
            "does not ship; use byte_histogram_features for the "
            "deterministic stand-in"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))


def _byte_histogram(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature: 16-bin byte histogram,
    L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
    return hist / hist.sum()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The
    UDF body is the only thing a real codec replaces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [_byte_histogram(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def resize_meta(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize as metadata transform: computes the target dimensions
    JVM-side (payload untouched by the stub — a real implementation
    re-encodes inside extract-style UDF)."""
    scale = F.least(
        F.lit(max_side) / F.col("meta.width"),
        F.lit(max_side) / F.col("meta.height"),
        F.lit(1.0),
    )
    return media.withColumn(
        "resized_meta",
        F.struct(
            F.ceil(F.col("meta.width") * scale).cast("int").alias("width"),
            F.ceil(F.col("meta.height") * scale).cast("int").alias("height"),
        ),
    )


def sample_frames(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    timestamp — a JVM-side sequence+explode, no Python. The payload
    column is carried so a downstream decoder can seek."""
    n_frames = F.greatest(
        F.lit(1),
        F.floor(F.col("meta.duration_ms") / F.lit(1000.0) * F.lit(fps)).cast("int"),
    )
    frame_ts = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: (i * F.lit(1000.0 / fps)).cast("int"),
        )
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id", frame_ts.alias("frame_ms"), "payload", "meta"
    )


AUDIO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, n_samples int, rms double, zcr double"
)


def audio_window_features(
    media: DataFrame, frame: int = 1024, hop: int = 512
) -> DataFrame:
    """Audio framing + per-frame features (RMS energy, zero-crossing
    rate) over the binary payload — the windowed-DSP plumbing every
    audio pipeline runs before a real feature net. The DECODE line is
    the stand-in (payload bytes reinterpreted as int8 PCM — this
    container ships no audio codec); everything around it is the real
    distributed shape: Arrow-batched mapInPandas, per-row frame
    explosion in numpy (stride-tricks windowing, no Python loop over
    samples), one output row per (media, frame).

    Scale: frames per row = ceil(len/hop) — output is linear in total
    audio duration and never collects; a real decoder swaps ONE line
    (bytes -> codec -> PCM) and keeps schema, partitioning, and batch
    shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "n_samples": [],
                "rms": [],
                "zcr": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                if pcm.size == 0:
                    continue
                n_frames = max(1, int(np.ceil(pcm.size / hop)))
                for i in range(n_frames):
                    w = pcm[i * hop : i * hop + frame]
                    if w.size == 0:
                        break
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["n_samples"].append(int(w.size))
                    out["rms"].append(float(np.sqrt(np.mean(w * w))))
                    sign_changes = int(np.sum(np.abs(np.diff(np.signbit(w)))))
                    out["zcr"].append(
                        sign_changes / w.size if w.size > 1 else 0.0
                    )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, AUDIO_FRAMES_SCHEMA)
    )
