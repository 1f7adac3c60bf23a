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
