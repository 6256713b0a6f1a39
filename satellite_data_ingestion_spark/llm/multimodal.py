"""Multimodal (binary payload) columns.

Image/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, Arrow batching, ``mapInPandas`` signature,
partition-preserving decode — is real and tested.  The actual codec calls
(PIL/librosa/ffmpeg) are NOT available in this environment, so the decode
kernel is pluggable: the default is a deterministic fake that derives
features from the bytes themselves; the library-backed kernels raise
``NotImplementedError`` at the import boundary (clearly marked stubs).

This mirrors the reference's binary stage: download blob → decode (satpy,
``utils/conversion.py:11-13``) → per-band features (``sources/meteosat.py:
152-185``) — re-expressed as binary column → mapInPandas decode → typed
feature columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from ..catalog import table
from ..registry import register

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("first_byte", LongType()),
    ]
)


def decode_image_real(payload: bytes) -> dict:
    """Library-backed image decode — STUB: PIL is not in this container.

    Production kernel: ``Image.open(io.BytesIO(payload))`` → (width,
    height, mode); swap it in by passing ``kernel=decode_image_real`` to
    :func:`decoded_features`.
    """
    raise NotImplementedError("image codec libraries are not available in this environment")


def decode_audio_real(payload: bytes) -> dict:
    """Library-backed audio decode — STUB (librosa/soundfile absent)."""
    raise NotImplementedError("audio codec libraries are not available in this environment")


def decode_fake(payload: bytes) -> dict:
    """Deterministic fake decode: features derived purely from the bytes.

    Stands in for a codec so the full Spark plumbing (binary column →
    Arrow batch → per-batch decode → typed columns) is exercised and
    oracle-checkable.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": n % 480,
        "first_byte": payload[0] if n else None,
    }


def decoded_features(binary_df: DataFrame, kernel=decode_fake) -> DataFrame:
    """binary (doc_id, payload) → typed feature rows via mapInPandas.

    One Python invocation per Arrow batch (not per row); the iterator
    signature streams batches so executor memory stays bounded no matter
    the partition size — the property that lets this run over 100 TB of
    blobs with fixed-size executors.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(decode, schema=DECODED_SCHEMA)


@register(
    "ext_multimodal_col",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 640 AS width,
       octet_length(encode(text)) % 480 AS height,
       ascii(text[1:1]) AS first_byte
FROM documents
""",
)
def ext_multimodal_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal column pipeline: build a binary payload
    column (utf-8 bytes stand in for image blobs), push it through the
    Arrow-batched mapInPandas decode, emit typed features.  The oracle
    recomputes the fake kernel's arithmetic in SQL — proving the batch
    plumbing preserves rows, ordering-independence, and values."""
    docs = table(spark, sf_dir, "documents")
    binary_df = docs.select(
        "doc_id", F.encode("text", "utf-8").cast(BinaryType()).alias("payload")
    )
    return decoded_features(binary_df)
