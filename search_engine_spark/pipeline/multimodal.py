"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; decode/feature-extraction runs in Arrow-batched
``mapInPandas`` kernels.  The actual codec step is STUBBED (no
image/audio libraries in this container — ``decode_image`` raises
``NotImplementedError``); everything Spark-side — schema, batching,
partitioning, kernel signatures, deterministic fake features — is real
and tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, n_bytes int, header string, features array<double>"
)


def to_blob_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct(mime, n_bytes)).

    Stand-in payloads (utf-8 bytes of text) with the exact schema a real
    image/audio table would use.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder hook — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; extract_features uses the deterministic stub instead"
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector.

    8 little-endian uint32 words of sha256(payload) scaled to [0, 1) —
    exactly reproducible in SQL from the hex digest, so the whole kernel
    is oracle-checkable (uint32 / 2^32 is exact in float64).
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    return raw / np.float64(2**32)


def _extract_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array([len(p) for p in payloads], dtype="int32"),
                "header": [bytes(p[:4]).hex() for p in payloads],
                "features": [_fake_features(bytes(p)) for p in payloads],
            }
        )


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    (doc_id, n_bytes, header hex, features array<float>[8]).  The kernel
    shape (mapInPandas over payload batches) is exactly what a real
    decode/resize/embed stage uses; only ``_fake_features`` changes.
    """
    return blobs.select("doc_id", "payload").mapInPandas(
        _extract_kernel, schema=FEATURES_SCHEMA
    )


def feature_rows(blobs: DataFrame, ndigits: int = 6) -> DataFrame:
    """Exploded, hashable projection of :func:`extract_features`.

    (doc_id, n_bytes, header, dim, value) — one row per feature
    dimension, value rounded; sortable/hashable for exact comparison
    against the SQL twin (the array form is unhashable downstream).
    """
    from ..functions import rnd

    feats = extract_features(blobs)
    return feats.select(
        "doc_id",
        "n_bytes",
        "header",
        F.posexplode("features").alias("dim", "value"),
    ).select(
        "doc_id", "n_bytes", "header", F.col("dim").cast("int").alias("dim"),
        rnd(F.col("value"), ndigits).alias("value"),
    )


def frame_sample_plan(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode per-payload frame indices.

    Frame count is faked as n_bytes // 64 (a real decoder reports it);
    the explode/partitioning shape is the real thing.
    """
    n_frames = F.floor(F.octet_length("payload") / F.lit(64)).cast("int")
    return (
        blobs.select("doc_id", n_frames.alias("n_frames"))
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )
