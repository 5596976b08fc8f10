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
    """STUB: full pixel decode requires PIL/opencv, absent here. For
    the metadata tier (dimensions / channels / format) use
    parse_image_header, which is pure stdlib and real."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image PIXEL decode requires PIL/opencv, which this "
            "environment does not ship; parse_image_header covers the "
            "header-metadata tier and byte_histogram_features the "
            "deterministic feature stand-in"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))


# --- real (pure-stdlib) image HEADER codec ----------------------------------
#
# The container ships no image library, but the metadata every curation
# pipeline actually filters on — width/height/channels/container — sits
# in fixed binary headers that `struct` parses exactly: PNG IHDR
# (ISO 15948 §11.2.2), JPEG SOFn frame headers (ITU T.81 §B.2.2), GIF
# logical screen descriptor, BMP BITMAPINFOHEADER. No codec, no floats,
# integer-exact — so the decode tier is oracle-checkable.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample channels (ISO 15948 table 11.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG SOF0-15 marker bytes, minus DHT(C4)/DAC(CC)/JPG(C8) which are
#: not frame headers (ITU T.81 table B.1)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(
    payload: bytes | None,
) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) from the binary header, or
    None for unrecognized/corrupt payloads (quarantine row, never an
    exception — a 100 TB scan must not die on one bad blob)."""
    import struct
    import zlib

    if payload is None:
        return None
    b = bytes(payload)
    if b.startswith(_PNG_SIG) and len(b) >= 33 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25]
        # CRC over chunk type+data: a corrupt IHDR surfaces as
        # unparsed, not as garbage dimensions
        if zlib.crc32(b[12:29]) != struct.unpack(">I", b[29:33])[0]:
            return None
        ch = _PNG_CHANNELS.get(color_type)
        if ch is None or w == 0 or h == 0:
            return None
        return ("png", w, h, ch)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any frame header
                return None
            if 0xD0 <= marker <= 0xD7 or marker in (0x01, 0xFF):
                i += 2  # parameterless markers / fill bytes
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker in _JPEG_SOF:
                if i + 10 > len(b) or seglen < 8:
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                ncomp = b[i + 9]
                if w == 0 or h == 0 or ncomp == 0:
                    return None
                return ("jpeg", w, h, ncomp)
            i += 2 + seglen
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h, 3) if w and h else None
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h), 3) if w and h else None
    return None


def png_bytes(width: int, height: int, color_type: int = 2) -> bytes:
    """A real, spec-valid PNG byte stream (signature + IHDR + empty
    IDAT + IEND, correct CRCs). Header-complete: any PNG reader
    resolves dimensions/channels from it; pixel data is empty."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">II5B", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b""))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int, n_components: int = 3) -> bytes:
    """A real JFIF byte stream (SOI + APP0 + SOF0 + EOI) whose frame
    header carries the given dimensions/components."""
    import struct

    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00"
        + bytes([1, 1, 0])
        + struct.pack(">HH", 1, 1)
        + bytes([0, 0])
    )
    comps = b"".join(
        bytes([cid + 1, 0x11, 0]) for cid in range(n_components)
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3 * n_components, 8, height, width, n_components)
        + comps
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


IMAGE_META_SCHEMA = (
    "media_id long, format string, width int, height int, channels int"
)


def synthesize_image_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-header image table: per doc, an actual
    PNG (even ids) or JFIF/JPEG (odd ids) byte stream whose header
    encodes width = id%640+1, height = id%480+1, and channels
    4/3/1 by id%4 — so a downstream header DECODE is genuinely
    parsing binary, yet every field is oracle-predictable from the
    id. Arrow-batched construction; payloads never hit the driver."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 640 + 1, did % 480 + 1
                if did % 2 == 0:
                    ct = 6 if did % 4 == 0 else 2  # RGBA / RGB
                    payloads.append(png_bytes(w, h, ct))
                else:
                    nc = 1 if did % 4 == 1 else 3  # grayscale / YCbCr
                    payloads.append(jpeg_bytes(w, h, nc))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        build, "media_id long, payload binary"
    )


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Header decode over the binary column: one output row per
    parseable payload with format/width/height/channels from the
    ACTUAL bytes (parse_image_header); unparseable rows are dropped
    (quarantine tier). Arrow-batched, embarrassingly parallel, no
    shuffle — the schema/batch shape a real pixel decoder inherits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out: dict[str, list] = {
                "media_id": [],
                "format": [],
                "width": [],
                "height": [],
                "channels": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_image_header(payload)
                if parsed is None:
                    continue
                fmt, w, h, ch = parsed
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, IMAGE_META_SCHEMA
    )


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
