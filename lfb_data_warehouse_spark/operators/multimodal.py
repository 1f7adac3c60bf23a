"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the warehouse as ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators —
the payload bytes never pass through Python row-at-a-time.

Two decode tiers:

* **Real container decode** (:func:`parse_media` / :func:`decode_media`):
  a pure-Python parser for PNG (IHDR chunk), JPEG (SOFn marker scan),
  and WAV/RIFF (fmt/data chunk walk) that extracts true
  width/height/channels/sample-rate/frame-count from the actual bytes —
  no media libraries needed. :func:`synthesize_media` manufactures
  structurally valid payloads of all three container types so the
  decode path is exercised and oracle-checked end to end.
* **Pixel decode** remains out of reach without PIL/ffmpeg (verified
  absent in this environment); :func:`decode_real` marks where a full
  raster/sample decode would slot in, keeping the same batch shape.

At scale: binary payloads dominate bytes; keep them in their own
parquet column (columnar pruning skips them unless referenced), size
``spark.sql.files.maxPartitionBytes`` for payload width, and do
decode/feature-extract in the SAME mapInPandas pass to avoid
re-materializing payload bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload_sha256 string, "
    "fake_width long, fake_height long, fake_frames long"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + media type.
    (Real pipelines read payloads from parquet binary columns.)"""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_real(payload: bytes) -> dict:
    """Placeholder for full pixel/sample decode (PIL/av/soundfile).

    Container-level decode (dimensions, channels, sample rate, frame
    count) is REAL — see :func:`parse_media`. This hook is only for the
    raster/waveform contents themselves, which need codec libraries not
    present in this environment.
    """
    raise NotImplementedError(
        "pixel/sample decode libraries are not available in this "
        "environment; wire PIL/av here and keep extract_features' batch "
        "shape. Container metadata decode is real: use parse_media()."
    )


# ---------------------------------------------------------------------------
# Real container codecs (pure Python, no media libraries)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels


def png_bytes(width: int, height: int, color_type: int = 2) -> bytes:
    """Minimal structurally valid PNG: signature + IHDR (with real
    CRC-32) + empty IEND. 45 bytes regardless of dimensions."""
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    iend = b"IEND"
    return (
        _PNG_SIG
        + struct.pack(">I", 13) + ihdr + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", 0) + iend + struct.pack(">I", zlib.crc32(iend) & 0xFFFFFFFF)
    )


def jpeg_bytes(width: int, height: int, n_components: int = 3) -> bytes:
    """Minimal structurally valid JPEG header stream: SOI + JFIF APP0 +
    SOF0 (baseline frame header carrying the true dimensions) + EOI.
    32 + 3*n_components bytes."""
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x01\x01" + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    comps = b"".join(
        struct.pack("BBB", i + 1, 0x11, 0 if i == 0 else 1) for i in range(n_components)
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 8 + 3 * n_components)
        + b"\x08" + struct.pack(">HH", height, width)
        + struct.pack("B", n_components) + comps
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def wav_bytes(channels: int, sample_rate: int, n_samples: int, bits: int = 16) -> bytes:
    """Structurally valid PCM WAV (RIFF/WAVE + fmt + data of silence).
    44 + n_samples*channels*bits/8 bytes."""
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


_EMPTY_MEDIA = {
    "media_type": "application/octet-stream",
    "width": None, "height": None, "channels": None,
    "sample_rate": None, "n_samples": None,
}


def parse_media(b: bytes) -> dict:
    """REAL container decode: sniff the magic and parse the actual
    header bytes. PNG: IHDR width/height/color-type. JPEG: marker scan
    to the SOFn frame header (skipping entropy-agnostic segments by
    their declared lengths). WAV: RIFF chunk walk over fmt/data with
    word alignment. Unknown containers come back as octet-stream with
    NULL metadata rather than raising — at 100 TB some payloads are
    always corrupt, and a poison row must not kill the stage."""
    try:
        if b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            color_type = b[25]
            return {
                "media_type": "image/png", "width": w, "height": h,
                "channels": _PNG_CHANNELS.get(color_type),
                "sample_rate": None, "n_samples": None,
            }
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker == 0xFF:  # fill byte before a marker — not a marker
                    i += 1
                    continue
                if marker == 0x00:  # 0xFF00 byte-stuffing inside entropy data
                    i += 2
                    continue
                if marker == 0xDA:
                    # SOS: entropy-coded data follows with no length-framed
                    # segments — walking further would misread compressed
                    # bytes as markers. No SOFn before SOS → fallback.
                    break
                if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return {
                        "media_type": "image/jpeg", "width": w, "height": h,
                        "channels": b[i + 9],
                        "sample_rate": None, "n_samples": None,
                    }
                i += 2 + seglen
            return dict(_EMPTY_MEDIA)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            channels = rate = bits = data_size = None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                sz = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and sz >= 16:
                    _, channels, rate, _, _, bits = struct.unpack(
                        "<HHIIHH", b[i + 8:i + 24]
                    )
                elif cid == b"data":
                    data_size = sz
                i += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
            if channels and bits and data_size is not None:
                return {
                    "media_type": "audio/wav", "width": None, "height": None,
                    "channels": channels, "sample_rate": rate,
                    "n_samples": data_size // (channels * bits // 8),
                }
        return dict(_EMPTY_MEDIA)
    except (struct.error, IndexError):
        return dict(_EMPTY_MEDIA)


MEDIA_SCHEMA = "doc_id long, payload binary"

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "channels long, sample_rate long, n_samples long"
)


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture a deterministic mixed-media corpus: doc_id % 3 picks
    PNG / JPEG / WAV, with dimensions/channels/rate/samples all simple
    functions of doc_id (so an oracle can verify the DECODE by
    arithmetic — the decoder must parse the real bytes to reproduce
    them). Runs as Arrow-batched mapInPandas: payload construction is
    per-row Python, but it happens inside the executor batch loop, the
    exact production shape for synthetic-media generation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                kind = d % 3
                if kind == 0:
                    payloads.append(
                        png_bytes(d % 509 + 1, d % 251 + 1,
                                  color_type=2 if d % 2 == 0 else 6)
                    )
                elif kind == 1:
                    payloads.append(
                        jpeg_bytes(d % 499 + 1, d % 241 + 1,
                                   n_components=3 if d % 2 == 0 else 1)
                    )
                else:
                    payloads.append(
                        wav_bytes(d % 2 + 1, 8000 * (d % 3 + 1), d % 1000 + 1)
                    )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL container decode over (doc_id, payload):
    every output value is parsed from the payload bytes, not derived
    from metadata. Swapping :func:`parse_media` for a PIL/av call is a
    one-line change; the plan shape (mapInPandas, binary in, typed
    struct out) is already production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = pd.DataFrame([parse_media(b) for b in pdf["payload"]])
            feats.insert(0, "n_bytes", pdf["payload"].map(len).astype("int64").to_numpy())
            feats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield feats[[
                "doc_id", "media_type", "n_bytes", "width", "height",
                "channels", "sample_rate", "n_samples",
            ]]

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def _decode_stub_batch(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived from the bytes."""
    n_bytes = payload.map(len)
    sha = payload.map(lambda b: hashlib.sha256(b).hexdigest())
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int64"),
            "payload_sha256": sha,
            "fake_width": (n_bytes % 64 + 1).astype("int64"),
            "fake_height": (n_bytes // 64 % 64 + 1).astype("int64"),
            "fake_frames": (n_bytes % 7 + 1).astype("int64"),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_type).

    mapInPandas: each batch arrives as a pandas DataFrame with payload as
    bytes; the stub decode is vectorized over the batch. Swap
    ``_decode_stub_batch`` for a real decoder without touching the plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = _decode_stub_batch(pdf["payload"])
            feats.insert(0, "media_type", pdf["media_type"].to_numpy())
            feats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield feats

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, media_type string, orig_bytes long, payload binary, resized_bytes long"
)


def resize_payload(media: DataFrame, max_bytes: int) -> DataFrame:
    """Stubbed image/audio resize: 1→1 Arrow-batched transform that
    re-emits a (smaller) binary payload column. The stub truncates to
    ``max_bytes`` (a real resize decodes → scales → re-encodes in the
    same batch loop); the Spark side — binary in AND binary out through
    Arrow, payload column regenerated not mutated — is the real
    production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            orig = pdf["payload"].map(len).astype("int64")
            resized = pdf["payload"].map(lambda b: b[:max_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "orig_bytes": orig,
                    "payload": resized,
                    "resized_bytes": resized.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_index long, frame_bytes long, payload binary"


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Stubbed video frame sampling: 1→N Arrow-batched explode. Frame
    count/boundaries derive deterministically from the payload (frames =
    n_bytes % 7 + 1, fixed stride — matching the decode stub's
    fake_frames); every ``every_n``-th frame's byte-slice is emitted as
    its own row. A real sampler seeks keyframes in the container; the
    Spark plumbing — one input row yielding multiple binary rows through
    mapInPandas — is exactly the production shape."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_len, out_payload = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                frames = n % 7 + 1
                stride = max(1, math.ceil(n / frames))
                for i in range(0, frames, every_n):
                    frame = payload[i * stride : (i + 1) * stride]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_len.append(len(frame))
                    out_payload.append(frame)
            if out_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_ids, dtype="int64"),
                        "frame_index": pd.Series(out_idx, dtype="int64"),
                        "frame_bytes": pd.Series(out_len, dtype="int64"),
                        "payload": out_payload,
                    }
                )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
