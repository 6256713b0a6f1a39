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


# -- codec registry seam ------------------------------------------------
#
# A user with real codec libraries plugs a decoder in per MIME type
# without editing this module — the same seam shape as rest_catalog's
# ``_fetch_page`` transport.  Blobs are routed by magic-byte sniff (the
# ext_mime_detect logic, Python-side) to the registered kernel; anything
# unmatched falls back to the synthetic default, so pipelines keep
# running when only some modalities have real codecs.

_FEATURE_CODECS: dict = {"application/octet-stream": decode_fake}
_FRAME_CODECS: dict = {}


def register_codec(mime: str, kernel) -> None:
    """Bind ``kernel(payload: bytes) -> dict`` (DECODED_SCHEMA feature
    fields minus doc_id) as the feature decoder for ``mime`` — e.g.
    ``register_codec("image/jpeg", decode_image_real)`` once PIL exists.
    Replaces any previous binding."""
    _FEATURE_CODECS[mime] = kernel


def register_frame_codec(mime: str, kernel) -> None:
    """Bind ``kernel(payload: bytes) -> list[dict]`` (FRAME_SCHEMA fields
    minus doc_id) as the 1→N frame extractor for ``mime`` — the ffmpeg
    seam.  Replaces any previous binding."""
    _FRAME_CODECS[mime] = kernel


def _sniff_mime(payload: bytes) -> str:
    """Magic-byte content type (Python-side twin of ext_mime_detect)."""
    head = bytes(payload[:3]).hex()
    for sig, name in _MAGIC:
        if head == sig.replace(" ", ""):
            return name
    return "application/octet-stream"


def decoded_features(binary_df: DataFrame, kernel=None) -> DataFrame:
    """binary (doc_id, payload) → typed feature rows via mapInPandas.

    One Python invocation per Arrow batch (not per row); the iterator
    signature streams batches so executor memory stays bounded no matter
    the partition size — the property that lets this run over 100 TB of
    blobs with fixed-size executors.

    With ``kernel=None`` each blob routes through the codec registry by
    magic-byte sniff.  The registry is SNAPSHOTTED into the closure at
    plan-build time: driver-side ``register_codec`` calls ship to the
    executors with the serialized kernel instead of relying on the
    workers' own module import (which would silently drop runtime
    registrations).
    """
    codecs = dict(_FEATURE_CODECS) if kernel is None else None
    fallback = (codecs or {}).get("application/octet-stream", decode_fake)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if kernel is not None:
                feats = [kernel(p) for p in pdf["payload"]]
            else:
                feats = [
                    codecs.get(_sniff_mime(p), fallback)(p)
                    for p in pdf["payload"]
                ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(decode, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)

_FRAME_SIZE = 32  # bytes per fake "frame"
_SAMPLE_EVERY = 4  # keep every 4th frame


def fake_frames(payload: bytes) -> list[dict]:
    """Deterministic fake frame extractor: frame k covers bytes
    [32k, 32k+32), downsampled 4:1 — the default frame codec."""
    n_frames = len(payload) // _FRAME_SIZE
    return [
        {
            "frame_idx": k,
            "frame_offset": k * _FRAME_SIZE,
            "frame_bytes": min(_FRAME_SIZE, len(payload) - k * _FRAME_SIZE),
        }
        for k in range(0, n_frames, _SAMPLE_EVERY)
    ]


def sampled_frames(binary_df: DataFrame) -> DataFrame:
    """Video-style frame sampling: one blob row → N sampled frame rows.

    The mapInPandas kernel is row-expanding (unlike the scalar decode):
    the plumbing (schema, batch iteration, 1→N expansion inside Arrow
    batches) is what a real ffmpeg frame extractor plugs into via
    ``register_frame_codec`` — blobs route to it by magic-byte sniff;
    unmatched MIME types fall back to the deterministic fake.  Like
    ``decoded_features``, the registry snapshot ships inside the closure
    so driver-side registrations reach the executors."""
    codecs = dict(_FRAME_CODECS)
    fallback = codecs.get("application/octet-stream", fake_frames)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                kern = (
                    codecs.get(_sniff_mime(payload), fallback)
                    if codecs
                    else fallback
                )
                for frame in kern(payload):
                    rows.append({"doc_id": doc_id, **frame})
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return binary_df.mapInPandas(extract, schema=FRAME_SCHEMA)


@register(
    "ext_multimodal_frames",
    oracle=f"""
SELECT doc_id,
       k                             AS frame_idx,
       k * {_FRAME_SIZE}             AS frame_offset,
       CAST({_FRAME_SIZE} AS BIGINT) AS frame_bytes
FROM (
    SELECT doc_id,
           unnest(range(0, octet_length(encode(text)) // {_FRAME_SIZE},
                        {_SAMPLE_EVERY})) AS k
    FROM documents
)
""",
)
def ext_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over binary payloads: blob → every-4th 32-byte
    'frame' with typed offsets.  The oracle recomputes the sampling
    arithmetic relationally, checking the 1→N expansion row-for-row.
    (Full trailing frames only, matching the kernel's integer division;
    all payloads here exceed one frame.)"""
    docs = table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "utf-8").cast(BinaryType()).alias("payload")
    )
    return sampled_frames(blobs).filter(F.col("frame_bytes") == _FRAME_SIZE)


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


_MAGIC = [
    ("ff d8 ff", "image/jpeg"),
    ("89 50 4e", "image/png"),
    ("47 49 46", "image/gif"),
    ("25 50 44", "application/pdf"),
]


@register(
    "ext_mime_detect",
    oracle="""
SELECT doc_id,
       CASE
         WHEN substring(hex(encode(text)), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
         WHEN substring(hex(encode(text)), 1, 6) = '89504E' THEN 'image/png'
         WHEN substring(hex(encode(text)), 1, 6) = '474946' THEN 'image/gif'
         WHEN substring(hex(encode(text)), 1, 6) = '255044' THEN 'application/pdf'
         ELSE 'application/octet-stream'
       END AS mime,
       substring(hex(encode(text)), 1, 6) AS magic_hex
FROM documents
""",
)
def ext_mime_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing over binary payloads: classify each blob by
    its magic-byte prefix (JPEG/PNG/GIF/PDF signatures) before routing to
    a decoder — the dispatch step of a multimodal ingest pipeline, done
    JVM-side on the first 3 bytes so misrouted blobs never reach a
    decode kernel.  (Corpus blobs are text-derived, so nearly all fall
    through to octet-stream; the routing logic is what is under test.)"""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8").cast(BinaryType())
    magic = F.upper(F.hex(F.substring(payload, 1, 3)))
    mime = F.lit("application/octet-stream")
    for sig, name in reversed(_MAGIC):
        sig_hex = sig.replace(" ", "").upper()
        mime = F.when(magic == sig_hex, name).otherwise(mime)
    return docs.select("doc_id", mime.alias("mime"), magic.alias("magic_hex"))


@register(
    "ext_multimodal_dedup",
    oracle="""
SELECT md5(substr(text, 1, 64)) AS thumb_key,
       min(doc_id) AS keep_id,
       count(*)    AS n_copies
FROM documents
GROUP BY md5(substr(text, 1, 64))
""",
)
def ext_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over binary payloads: fingerprint each blob by
    the md5 of its leading 64 bytes (the 'thumbnail prefix' — the cheap
    screen production image dedup applies before any perceptual hash)
    and census the collisions with a deterministic representative.

    One hash-groupBy on a 16-byte key — the shuffle carries fingerprints,
    never payloads; at 100 TB the prefix read alone can be pushed to the
    storage layer (range request) so whole blobs are never fetched for
    the first-pass dedup.  Corpus payloads are ASCII text bytes, so the
    oracle's character-domain md5 equals the byte-domain one."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8").cast(BinaryType())
    thumb = F.md5(F.expr("substring(payload, 1, 64)"))
    return (
        docs.select("doc_id", payload.alias("payload"))
        .select("doc_id", thumb.alias("thumb_key"))
        .groupBy("thumb_key")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
