"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the warehouse as ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators —
the payload bytes never pass through Python row-at-a-time.

The actual media decode is STUBBED (decode libraries are not in this
environment): :func:`decode_stub` derives deterministic fake
width/height/frame metadata from the byte stream, and
:func:`decode_real` raises ``NotImplementedError`` where a PIL/ffmpeg
call would go. Everything Spark-side — schema, Arrow batch shape,
partition-parallel execution, UDF signature — is real and tested.

At scale: binary payloads dominate bytes; keep them in their own
parquet column (columnar pruning skips them unless referenced), size
``spark.sql.files.maxPartitionBytes`` for payload width, and do
decode/feature-extract in the SAME mapInPandas pass to avoid
re-materializing payload bytes.
"""

from __future__ import annotations

import hashlib
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
    """Placeholder for the real media decode (PIL/av/soundfile)."""
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "wire PIL/av here and keep extract_features' batch shape"
    )


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
