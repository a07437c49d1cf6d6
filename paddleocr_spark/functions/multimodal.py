"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a typed metadata
struct, processed by Arrow-batched `mapInPandas` (the same process
boundary as the reference's numpy→C++ predictor hop, SURVEY.md §3.1).
The container has no image/audio codecs, so the *decode* itself is a
deterministic stub (documented below); the Spark-side contract — schema,
Arrow batch shape, partitioning neutrality, column pruning (payload
dropped after feature extraction) — is real and tested.

Stub semantics (pure function of the payload bytes, so the DuckDB
oracle can reproduce them):
- n_bytes   = len(payload)
- width     = 64 + n_bytes % 512      (fake decoded dimensions)
- height    = 64 + (n_bytes * 7) % 512
- channels  = 3
- format    = 'png' if n_bytes % 2 == 0 else 'jpeg'

A real deployment replaces `_fake_decode` with PIL/ffmpeg calls within
the same batch loop; everything else stands.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _fake_decode(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic decode stub (see module docstring). Replace with a
    real codec (PIL.Image.open etc.) in deployment; raise instead with
    `NotImplementedError` if silent fakes are unacceptable."""
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int32"),
            "width": (64 + n_bytes % 512).astype("int32"),
            "height": (64 + n_bytes * 7 % 512).astype("int32"),
            "channels": pd.Series(3, index=n_bytes.index, dtype="int32"),
            "format": (n_bytes % 2).map({0: "png", 1: "jpeg"}),
        }
    )


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload -> typed metadata rows via Arrow-batched mapInPandas.

    Input: (doc_id: long, payload: binary). The payload column is
    consumed here and never carried further (column-pruning discipline:
    at 100 TB the bytes must not survive past feature extraction).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[payload_col].map(len)
            out = _fake_decode(n)
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64"))
            yield out

    return df.select("doc_id", payload_col).mapInPandas(batches, MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a fake frame index array
    (0, every_n, 2*every_n, ...) bounded by n_bytes/1024 'frames'.
    Demonstrates the explode/fan-out shape real frame extraction uses."""
    n_frames = (F.octet_length("payload") / F.lit(1024)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select("doc_id", F.explode(idx).alias("frame_no"))


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_media(df: DataFrame, max_side: int = 128, payload_col: str = "payload") -> DataFrame:
    """Resize plumbing (DetResizeForTest analog, operators.py:206-333:
    rescale + record dims): emits the clamped target dims plus a
    deterministic 'thumbnail' (payload prefix — stands in for the
    re-encoded bytes a real resizer returns). Binary-in/binary-out
    mapInPandas contract; the full payload never leaves this stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[payload_col].map(len)
            w = 64 + n % 512
            h = 64 + n * 7 % 512
            scale = pd.concat([w, h], axis=1).max(axis=1).clip(lower=1)
            ratio = (max_side / scale).clip(upper=1.0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": (w * ratio).astype("int32").clip(lower=1),
                    "height": (h * ratio).astype("int32").clip(lower=1),
                    "thumb": pdf[payload_col].map(lambda b: bytes(b)[:64]),
                }
            )
            yield out

    return df.select("doc_id", payload_col).mapInPandas(batches, RESIZE_SCHEMA)


def media_embedding(df: DataFrame, dim: int = 16, payload_col: str = "payload") -> DataFrame:
    """Feature-extract plumbing: payload -> fixed-dim float vector (the
    image-encoder stub) feeding the similarity/ANN operators. The fake
    features are a pure function of the bytes (md5 of the payload,
    one byte per dimension, scaled to [0,1)) so results are
    deterministic across partitionings; a real deployment swaps in a
    model forward pass over the same Arrow batches."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = pdf[payload_col].map(
                lambda b: [
                    d / 256.0
                    for d in hashlib.md5(bytes(b)).digest()[:dim]
                ]
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": vecs}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return df.select("doc_id", payload_col).mapInPandas(batches, schema)
