"""Multimodal (binary payload) columns.

Image/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, Arrow batching, ``mapInPandas`` signature,
partition-preserving decode — is real and tested.  The decode kernel is
pluggable per MIME type: BMP images and WAV audio decode for REAL with
pure-``struct`` header parsers (no libraries needed —
``ext_multimodal_bmp`` / ``ext_multimodal_wav`` pin them against
relational oracles); compressed formats whose codecs (PIL/librosa/
ffmpeg) are not in this environment fall back to a deterministic fake
or raise ``NotImplementedError`` at the import boundary (clearly marked
stubs).

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


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode for BMP — pure ``struct`` header parse, no
    libraries: the BITMAPFILEHEADER magic plus the BITMAPINFOHEADER's
    little-endian (width, height) at offset 18.  Negative height encodes
    top-down row order; the dimension is its magnitude."""
    import struct as _struct

    if bytes(payload[:2]) != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    width, height = _struct.unpack_from("<ii", bytes(payload[14 + 4 : 14 + 12]))
    return {
        "n_bytes": len(payload),
        "width": int(width),
        "height": abs(int(height)),
        "first_byte": payload[0],
    }


_WAV_FRAME_SAMPLES = 32  # samples per extracted frame window


def wav_frames(payload: bytes) -> list[dict]:
    """REAL audio frame sampler for WAV — pure ``struct`` RIFF chunk
    walk, no libraries: locate the ``fmt `` chunk's blockAlign and the
    ``data`` chunk, then emit every ``_SAMPLE_EVERY``-th window of
    ``_WAV_FRAME_SAMPLES`` samples with its absolute byte offset — the
    audio twin of video frame sampling (full windows only, like the
    fake codec's integer division)."""
    import struct as _struct

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    block_align = None
    data_off = data_len = None
    off = 12
    while off + 8 <= len(buf):
        cid, clen = _struct.unpack_from("<4sI", buf, off)
        if cid == b"fmt ":
            block_align = _struct.unpack_from("<H", buf, off + 8 + 12)[0]
        elif cid == b"data":
            data_off, data_len = off + 8, int(clen)
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if block_align is None or data_off is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    frame_bytes = _WAV_FRAME_SAMPLES * block_align
    n_frames = data_len // frame_bytes
    return [
        {
            "frame_idx": k,
            "frame_offset": data_off + k * frame_bytes,
            "frame_bytes": frame_bytes,
        }
        for k in range(0, n_frames, _SAMPLE_EVERY)
    ]


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

_FEATURE_CODECS: dict = {
    "application/octet-stream": decode_fake,
    "image/bmp": decode_bmp,  # real struct-only header decode
}
_FRAME_CODECS: dict = {
    "audio/x-wav": wav_frames,  # real struct-only RIFF chunk walk
}


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
    """Magic-byte content type (Python-side twin of ext_mime_detect,
    extended with the codec-routing signatures below — variable-length
    prefixes, since BMP's usable magic is 2 bytes and RIFF's is 4)."""
    head = bytes(payload[:4]).hex()
    for sig, name in list(_MAGIC) + _SNIFF_EXTRA:
        if head.startswith(sig.replace(" ", "")):
            return name
    return "application/octet-stream"


# Codec-routing signatures beyond ext_mime_detect's fixed 3-byte table.
# RIFF containers other than WAVE (AVI, WebP) would need the 4-byte form
# tag at offset 8 to disambiguate; the registered WAV kernel validates it
# and raises on non-WAVE RIFF, so misrouted containers fail loudly.
_SNIFF_EXTRA = [
    ("42 4d", "image/bmp"),
    ("52 49 46 46", "audio/x-wav"),
]


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


@register(
    "ext_multimodal_bmp",
    oracle="""
SELECT doc_id,
       CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(66 AS BIGINT) AS first_byte
FROM (SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents)
""",
)
def ext_multimodal_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: build a valid 24-bit BMP per
    document (fixture construction in mapInPandas — dimensions derived
    from doc_id, rows padded to 4 bytes per the format), route it
    through the codec registry by magic-byte sniff to the struct-only
    BMP header decoder, and emit typed features.  The oracle recomputes
    the file geometry relationally — a mis-parsed width/height, wrong
    row padding, or a blob misrouted to the fake codec (whose width =
    n_bytes % 640) hash-mismatches."""
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                w = int(did) % 64 + 1
                h = int(did) % 48 + 1
                row = ((3 * w + 3) // 4) * 4  # 24bpp rows pad to 4 bytes
                size = 54 + row * h
                hdr = b"BM" + _struct.pack("<IHHI", size, 0, 0, 54)
                dib = _struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0
                )
                payloads.append(hdr + dib + bytes(row * h))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    return decoded_features(blobs)


@register(
    "ext_multimodal_wav",
    oracle=f"""
SELECT doc_id,
       k AS frame_idx,
       CAST(44 + k * {_WAV_FRAME_SAMPLES * 2} AS BIGINT) AS frame_offset,
       CAST({_WAV_FRAME_SAMPLES * 2} AS BIGINT) AS frame_bytes
FROM (
    SELECT doc_id,
           unnest(range(0, (doc_id % 1000 + 64) // {_WAV_FRAME_SAMPLES},
                        4)) AS k
    FROM documents
)
""",
)
def ext_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame sampling end-to-end: build a valid PCM WAV per
    document (canonical 44-byte RIFF/fmt/data header, mono 16-bit,
    doc_id-derived sample count), route by RIFF magic to the struct-only
    chunk walker, and emit every-4th 32-sample frame window with its
    absolute byte offset.  The oracle recomputes the sampling arithmetic
    (data starts at offset 44, blockAlign 2) relationally — a wrong
    chunk walk, blockAlign misparse, or off-by-one frame count
    hash-mismatches."""
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                n_samples = int(did) % 1000 + 64
                data_len = n_samples * 2  # mono, 16-bit PCM
                hdr = (
                    b"RIFF"
                    + _struct.pack("<I", 36 + data_len)
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data"
                    + _struct.pack("<I", data_len)
                )
                payloads.append(hdr + bytes(data_len))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    return sampled_frames(blobs)


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


@register(
    "ext_multimodal_resize",
    oracle="""
SELECT doc_id,
       array_to_string(list_transform(generate_series(0, 63), k ->
         CAST(3 * ((7 * (((k % 8) * w) // 8)
                    + 13 * (((k // 8) * h) // 8)
                    + doc_id) % 256) AS BIGINT)), ',') AS thumb,
       CAST(list_sum(list_transform(generate_series(0, 63), k ->
         3 * ((7 * (((k % 8) * w) // 8)
               + 13 * (((k // 8) * h) // 8)
               + doc_id) % 256))) AS BIGINT)        AS thumb_sum
FROM (SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
      FROM documents)
""",
)
def ext_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level decode + RESIZE (the mandate's image-transform
    slot, beyond header parsing): each document gets a 24-bit BMP whose
    pixel (x, y) holds ``(7x + 13y + doc_id) % 256`` in every channel —
    defined in IMAGE coordinates, while the file stores rows BOTTOM-UP
    with 4-byte padding, so a decoder that forgets the row flip or the
    stride produces different thumbnails and fails the hash.  The
    numpy kernel parses the header, strides the padded rows, flips to
    image order, and nearest-neighbor-samples an 8x8 thumbnail
    (``sx = x*w div 8``); the oracle replays the sampling arithmetic on
    the pattern definition relationally.

    Scale shape: both build and decode are ``mapInPandas`` over Arrow
    batches — partition-preserving, no shuffle, no Python row loops in
    the pixel path (numpy slicing end-to-end); thumbnails are the
    fixed-size features ANN/near-dup stages downstream consume."""
    import numpy as np
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 64 + 1
                h = did % 48 + 1
                stride = ((3 * w + 3) // 4) * 4
                size = 54 + stride * h
                hdr = b"BM" + _struct.pack("<IHHI", size, 0, 0, 54)
                dib = _struct.pack(
                    "<IiiHHIIiiII",
                    40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0,
                )
                x = np.arange(w, dtype=np.int64)
                body = bytearray()
                for r in range(h):  # file rows, bottom-up
                    y_img = h - 1 - r
                    vals = ((7 * x + 13 * y_img + did) % 256).astype(np.uint8)
                    row = np.repeat(vals, 3).tobytes()
                    body += row + bytes(stride - 3 * w)
                payloads.append(hdr + dib + bytes(body))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    def decode_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                w = _struct.unpack_from("<i", buf, 18)[0]
                h = _struct.unpack_from("<i", buf, 22)[0]
                stride = ((3 * w + 3) // 4) * 4
                rows = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                img = rows[::-1, : 3 * w : 3].astype(np.int64)  # flip, blue
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                thumb = 3 * img[np.ix_(sy, sx)]
                # Comma-joined string, not array<long>: the driver's
                # canonicalizer sorts columns with pandas and dies on
                # array cells — scalar output columns only.
                flat = ",".join(str(int(v)) for v in thumb.ravel())
                out.append((int(did), flat, int(thumb.sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "thumb", "thumb_sum"]
            )

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    return blobs.mapInPandas(
        decode_resize, schema="doc_id long, thumb string, thumb_sum long"
    )


@register(
    "ext_multimodal_audio_features",
    oracle="""
WITH s AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(doc_id % 1000 + 63 AS INT))) AS i
  FROM documents
), v AS (
  SELECT doc_id, i,
         CAST((doc_id * 31 + i * 17) % 4096 - 2048 AS BIGINT) AS amp
  FROM s
), w AS (
  SELECT doc_id, i, amp,
         lag(amp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(amp * amp) AS BIGINT) AS energy,
       CAST(max(abs(amp)) AS BIGINT) AS peak,
       CAST(sum(CASE WHEN prev IS NOT NULL
                     AND ((prev < 0 AND amp >= 0) OR (prev >= 0 AND amp < 0))
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM w
GROUP BY doc_id
""",
)
def ext_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio FEATURE EXTRACTION (beyond ``ext_multimodal_wav``'s
    frame slicing): each document gets a 16-bit mono PCM WAV whose
    sample i holds the patterned amplitude ((31·doc_id + 17·i) mod 4096)
    − 2048; the numpy kernel must parse the RIFF header, read int16
    LITTLE-ENDIAN at offset 44, and compute the energy (sum of squares),
    peak, and zero-crossing count — wrong endianness, a header
    off-by-one, or a dropped sample hash-mismatches against the oracle's
    relational replay of the generator.  Energy/crossings are the
    features VAD, silence trimming, and audio dedup key on.

    Scale shape: build and decode are partition-preserving mapInPandas
    over Arrow batches; features are exact integers (no float-sum
    hazard); per-doc output is 1 row."""
    import numpy as np
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 1000 + 64
                i = np.arange(n, dtype=np.int64)
                amp = ((did * 31 + i * 17) % 4096 - 2048).astype("<i2")
                data = amp.tobytes()
                hdr = (
                    b"RIFF"
                    + _struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data"
                    + _struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                data_len = _struct.unpack_from("<I", buf, 40)[0]
                amp = np.frombuffer(
                    buf, dtype="<i2", count=data_len // 2, offset=44
                ).astype(np.int64)
                sign = amp < 0
                zc = int(np.count_nonzero(sign[1:] != sign[:-1]))
                out.append(
                    (
                        int(did),
                        len(amp),
                        int((amp * amp).sum()),
                        int(np.abs(amp).max()),
                        zc,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_samples",
                    "energy",
                    "peak",
                    "zero_crossings",
                ],
            )

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    return blobs.mapInPandas(
        features,
        schema=(
            "doc_id long, n_samples long, energy long, peak long, "
            "zero_crossings long"
        ),
    )


@register(
    "ext_multimodal_phash",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63), k ->
           3 * ((7 * (((k % 8) * (doc_id % 64 + 1)) // 8)
                 + 13 * (((k // 8) * (doc_id % 48 + 1)) // 8)
                 + doc_id) % 256)) AS thumb
  FROM documents
), bits AS (
  SELECT doc_id,
         unnest(generate_series(0, 62)) AS k
  FROM t
), scored AS (
  SELECT b.doc_id,
         CAST((b.k // 8) * 7 + (b.k % 8) AS BIGINT) AS bit_idx,
         CASE WHEN t.thumb[CAST(b.k AS INT) + 2] > t.thumb[CAST(b.k AS INT) + 1]
              THEN 1 ELSE 0 END AS bit
  FROM bits b JOIN t ON b.doc_id = t.doc_id
  WHERE b.k % 8 < 7
), hashed AS (
  SELECT doc_id,
         CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(bit_idx AS INT))) AS BIGINT) AS dhash
  FROM scored GROUP BY doc_id
)
SELECT dhash,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_id
FROM hashed GROUP BY dhash
""",
)
def ext_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL image dedup via dHash (difference hash): decode the
    patterned BMPs, nearest-neighbor-sample the 8x8 thumbnail (the
    ``ext_multimodal_resize`` kernel), then hash the HORIZONTAL GRADIENT
    SIGN — 7 adjacent-pixel comparisons per row = a 56-bit fingerprint
    that survives re-encoding, scaling, and brightness shifts (the
    transformations that defeat the byte-level md5 of
    ``ext_multimodal_dedup``).  Images whose thumbnails share every
    gradient sign collapse to one group; the oracle replays the pixel
    pattern relationally, so a decoder, sampler, OR bit-packing bug
    hash-mismatches.

    Scale shape: decode+hash is partition-preserving mapInPandas (the
    fingerprint leaves the kernel as ONE int64 — payloads never
    shuffle); the dedup groupBy moves 8-byte keys, the ext_dedup_exact
    posture.  Hamming-near pairs (distance <= t) extend via the
    ext_dedup_simhash band trick on the same fingerprints."""
    import numpy as np
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 64 + 1
                h = did % 48 + 1
                stride = ((3 * w + 3) // 4) * 4
                size = 54 + stride * h
                hdr = b"BM" + _struct.pack("<IHHI", size, 0, 0, 54)
                dib = _struct.pack(
                    "<IiiHHIIiiII",
                    40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0,
                )
                x = np.arange(w, dtype=np.int64)
                body = bytearray()
                for r in range(h):
                    y_img = h - 1 - r
                    vals = ((7 * x + 13 * y_img + did) % 256).astype(np.uint8)
                    body += np.repeat(vals, 3).tobytes() + bytes(stride - 3 * w)
                payloads.append(hdr + dib + bytes(body))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                w = _struct.unpack_from("<i", buf, 18)[0]
                h = _struct.unpack_from("<i", buf, 22)[0]
                stride = ((3 * w + 3) // 4) * 4
                rows = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                img = rows[::-1, : 3 * w : 3].astype(np.int64)
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                thumb = 3 * img[np.ix_(sy, sx)]
                bits = (thumb[:, 1:] > thumb[:, :-1]).astype(np.int64)
                idx = np.arange(56, dtype=np.int64)
                out.append((int(did), int((bits.ravel() << idx).sum())))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    hashed = blobs.mapInPandas(dhash, schema="doc_id long, dhash long")
    return hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


_PHASH_BANDS = 4        # 56-bit fingerprint → 4 bands of 14 bits
_PHASH_MAX_HAMMING = 6  # near-duplicate gate


@register(
    "ext_multimodal_phash_near",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63), k ->
           3 * ((7 * (((k % 8) * (doc_id % 64 + 1)) // 8)
                 + 13 * (((k // 8) * (doc_id % 48 + 1)) // 8)
                 + doc_id) % 256)) AS thumb
  FROM documents
), scored AS (
  SELECT doc_id,
         unnest(generate_series(0, 62)) AS k
  FROM t
), hashed AS (
  SELECT s.doc_id,
         CAST(sum(CASE WHEN s.k % 8 < 7 AND
                  t.thumb[CAST(s.k AS INT) + 2] > t.thumb[CAST(s.k AS INT) + 1]
             THEN CAST(1 AS BIGINT) << CAST((s.k // 8) * 7 + (s.k % 8) AS INT)
             ELSE 0 END) AS BIGINT) AS dhash
  FROM scored s JOIN t ON s.doc_id = t.doc_id
  GROUP BY s.doc_id
), reps AS (
  SELECT dhash, min(doc_id) AS rep FROM hashed GROUP BY dhash
), banded AS (
  SELECT dhash, rep, unnest(generate_series(0, {_PHASH_BANDS - 1})) AS band
  FROM reps
), keyed AS (
  SELECT dhash, rep, band,
         (dhash >> CAST(band * 14 AS INT)) & 16383 AS band_key
  FROM banded
), cand AS (
  SELECT DISTINCT a.dhash AS h1, a.rep AS r1, b.dhash AS h2, b.rep AS r2
  FROM keyed a JOIN keyed b
    ON a.band = b.band AND a.band_key = b.band_key AND a.rep < b.rep
)
SELECT r1, r2,
       CAST(bit_count(CAST(xor(h1, h2) AS BIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(h1, h2) AS BIGINT)) <= {_PHASH_MAX_HAMMING}
""",
)
def ext_multimodal_phash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate perceptual matching: dHash fingerprints whose
    Hamming distance is <= {maxh} (slightly-edited images — a few
    flipped gradient signs — that exact-fingerprint grouping misses).
    Candidate generation is the LSH BAND TRICK on the fingerprint
    itself: 4 x 14-bit bands, a pair is considered only if SOME band
    matches exactly (any pair within Hamming {maxh} of a 56-bit hash
    with <= 3 flipped bits must agree on at least one band by
    pigeonhole; up to {maxh} flips is high-recall), then verified with bit_count(xor) — integer-exact.

    Scale shape: dedup to distinct fingerprints FIRST (reps), band keys
    explode 4x on the |distinct hashes| table (never the corpus), the
    band equi-join is the only pair generator (no unbucketed cross
    join), and verification is one codegen bit op per candidate — the
    ext_dedup_simhash posture applied to images."""
    import numpy as np
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 64 + 1
                h = did % 48 + 1
                stride = ((3 * w + 3) // 4) * 4
                size = 54 + stride * h
                hdr = b"BM" + _struct.pack("<IHHI", size, 0, 0, 54)
                dib = _struct.pack(
                    "<IiiHHIIiiII",
                    40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0,
                )
                x = np.arange(w, dtype=np.int64)
                body = bytearray()
                for r in range(h):
                    y_img = h - 1 - r
                    vals = ((7 * x + 13 * y_img + did) % 256).astype(np.uint8)
                    body += np.repeat(vals, 3).tobytes() + bytes(stride - 3 * w)
                payloads.append(hdr + dib + bytes(body))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                w = _struct.unpack_from("<i", buf, 18)[0]
                h = _struct.unpack_from("<i", buf, 22)[0]
                stride = ((3 * w + 3) // 4) * 4
                rows = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                img = rows[::-1, : 3 * w : 3].astype(np.int64)
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                thumb = 3 * img[np.ix_(sy, sx)]
                bits = (thumb[:, 1:] > thumb[:, :-1]).astype(np.int64)
                idx = np.arange(56, dtype=np.int64)
                out.append((int(did), int((bits.ravel() << idx).sum())))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    hashed = blobs.mapInPandas(dhash, schema="doc_id long, dhash long")
    reps = hashed.groupBy("dhash").agg(F.min("doc_id").cast("long").alias("rep"))
    band = F.explode(
        F.array(*[F.lit(b) for b in range(_PHASH_BANDS)])
    ).alias("band")
    keyed = reps.select(
        "dhash",
        "rep",
        band,
    ).withColumn(
        "band_key",
        F.expr("shiftright(dhash, cast(band * 14 as int)) & 16383"),
    )
    a = keyed.select(
        F.col("dhash").alias("h1"), F.col("rep").alias("r1"), "band", "band_key"
    )
    b = keyed.select(
        F.col("dhash").alias("h2"), F.col("rep").alias("r2"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("r1") < F.col("r2"))
        .select("h1", "r1", "h2", "r2")
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("long")
    return cand.select("r1", "r2", hamming.alias("hamming")).filter(
        F.col("hamming") <= _PHASH_MAX_HAMMING
    )


ext_multimodal_phash_near.__doc__ = ext_multimodal_phash_near.__doc__.format(
    maxh=_PHASH_MAX_HAMMING
)


_VAD_FRAME = 16  # samples per VAD frame
_VAD_ENERGY_TH = 20_000_000  # voiced iff frame energy strictly above


@register(
    "ext_multimodal_vad",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(doc_id % 1000 + 63 AS INT))) AS i
  FROM documents
), v AS (
  SELECT doc_id, i,
         CAST((doc_id * 31 + i * 17) % 4096 - 2048 AS BIGINT) AS amp
  FROM s
), f AS (
  SELECT doc_id, i // {_VAD_FRAME} AS frame,
         CAST(sum(amp * amp) AS BIGINT) AS energy,
         CAST(count(*) AS BIGINT) AS n_in_frame
  FROM v GROUP BY 1, 2
), full_frames AS (
  SELECT doc_id, frame, energy,
         energy > {_VAD_ENERGY_TH} AS voiced
  FROM f WHERE n_in_frame = {_VAD_FRAME}
), isl AS (
  SELECT doc_id, frame,
         frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS g
  FROM full_frames WHERE voiced
), runs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY doc_id, g
), seg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         CAST(max(run_len) AS BIGINT) AS longest_segment
  FROM runs GROUP BY 1
)
SELECT ff.doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN ff.voiced THEN 1 ELSE 0 END) AS BIGINT) AS n_voiced,
       CAST(coalesce(max(seg.n_segments), 0) AS BIGINT) AS n_segments,
       CAST(coalesce(max(seg.longest_segment), 0) AS BIGINT)
         AS longest_segment
FROM full_frames ff LEFT JOIN seg ON ff.doc_id = seg.doc_id
GROUP BY 1
ORDER BY 1
""",
)
def ext_multimodal_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENERGY-THRESHOLD VOICE-ACTIVITY DETECTION over the synthetic PCM
    corpus ({f}-sample frames, voiced iff frame energy > {t}): per
    document, total/voiced frame counts plus the speech-segment census
    (count + longest run of consecutive voiced frames) — the silence-
    trimming / speech-extraction front gate of an audio training-data
    pipeline (``ext_multimodal_audio_features`` summarizes the whole
    clip; VAD finds WHERE the signal lives).

    The numpy kernel re-parses the RIFF container (the
    ``ext_multimodal_wav`` discipline — endianness or offset mistakes
    hash-mismatch), frames the int16 stream, and runs the gaps-and-
    islands segment count vectorized per clip; the oracle replays the
    same generator relationally.  Exact integers end to end; trailing
    partial frames are dropped by both sides."""
    import numpy as np
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 1000 + 64
                i = np.arange(n, dtype=np.int64)
                amp = ((did * 31 + i * 17) % 4096 - 2048).astype("<i2")
                data = amp.tobytes()
                hdr = (
                    b"RIFF"
                    + _struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data"
                    + _struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                data_len = _struct.unpack_from("<I", buf, 40)[0]
                amp = np.frombuffer(
                    buf, dtype="<i2", count=data_len // 2, offset=44
                ).astype(np.int64)
                k = len(amp) // _VAD_FRAME
                energies = (
                    (amp[: k * _VAD_FRAME] ** 2)
                    .reshape(k, _VAD_FRAME)
                    .sum(axis=1)
                )
                voiced = energies > _VAD_ENERGY_TH
                starts = voiced & ~np.concatenate(([False], voiced[:-1]))
                n_seg = int(starts.sum())
                longest = 0
                if n_seg:
                    idx = np.arange(k)
                    run_id = np.cumsum(starts) * voiced  # 0 for unvoiced
                    longest = int(np.bincount(run_id[voiced]).max())
                out.append((int(did), k, int(voiced.sum()), n_seg, longest))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_voiced",
                    "n_segments",
                    "longest_segment",
                ],
            )

    blobs = docs.mapInPandas(build, schema="doc_id long, payload binary")
    return blobs.mapInPandas(
        vad,
        schema=(
            "doc_id long, n_frames long, n_voiced long, n_segments long, "
            "longest_segment long"
        ),
    ).orderBy("doc_id")


ext_multimodal_vad.__doc__ = ext_multimodal_vad.__doc__.format(
    f=_VAD_FRAME, t=_VAD_ENERGY_TH
)


_IMG_HIST_BINS = 8  # luminance bins (256 / 32)


@register(
    "ext_image_histogram",
    oracle=f"""
WITH px AS (
  SELECT doc_id,
         CAST(((doc_id + i) % 256) // 32 AS BIGINT) AS bin
  FROM (SELECT doc_id,
               unnest(generate_series(0, (doc_id % 64 + 1) * (doc_id % 48 + 1) - 1))
                 AS i
        FROM documents)
)
SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_px
FROM px GROUP BY 1, 2 ORDER BY doc_id, bin
""",
)
def ext_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-IMAGE LUMINANCE HISTOGRAM ({b} bins) from REAL pixel decode:
    each document gets a 24-bit BMP whose pixel (row r, col x) carries
    the deterministic gray value (doc_id + r·w + x) % 256 in all three
    channels (rows 4-byte padded per the format), the numpy kernel
    re-parses the header (data offset, dimensions, stride), strips the
    row padding, and bins the blue channel — the exposure/contrast
    fingerprint image-dedup and quality gates run before any model
    sees a pixel (``ext_multimodal_phash`` hashes structure; the
    histogram is the cheap global-statistics sibling).

    The oracle recomputes the pixel multiset RELATIONALLY from the
    generator arithmetic — a stride misparse, padding leak into the
    bins, or channel misalignment hash-mismatches immediately (padding
    bytes are zeros: leaking them inflates bin 0 deterministically).

    Scale shape: fixture build + decode are ONE mapInPandas pass
    (Arrow-batched, payloads never shuffle); the histogram leaves the
    kernel as (doc_id, bin, count) rows — 8 rows per image max — and
    the groupBy is a formality (kernel already emits one row per
    bin)."""
    import struct as _struct

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def build_and_hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_doc, out_bin, out_n = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 64 + 1
                h = did % 48 + 1
                stride = ((3 * w + 3) // 4) * 4
                size = 54 + stride * h
                hdr = b"BM" + _struct.pack("<IHHI", size, 0, 0, 54)
                dib = _struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
                )
                body = np.zeros((h, stride), dtype=np.uint8)
                idx = np.arange(h * w, dtype=np.int64).reshape(h, w)
                v = ((did + idx) % 256).astype(np.uint8)
                for c in range(3):  # BGR triplets, all channels = v
                    body[:, c : 3 * w : 3] = v
                payload = hdr + dib + body.tobytes()

                # --- real decode path: re-parse the header we just wrote ---
                buf = np.frombuffer(payload, dtype=np.uint8)
                off = int.from_bytes(payload[10:14], "little")
                pw = int.from_bytes(payload[18:22], "little", signed=True)
                ph = int.from_bytes(payload[22:26], "little", signed=True)
                pstride = ((3 * pw + 3) // 4) * 4
                rows = buf[off : off + pstride * ph].reshape(ph, pstride)
                blue = rows[:, 0 : 3 * pw : 3]  # padding stripped by the slice
                counts = np.bincount(
                    (blue.astype(np.int64) // 32).ravel(), minlength=_IMG_HIST_BINS
                )
                for b_i in np.nonzero(counts)[0]:
                    out_doc.append(did)
                    out_bin.append(int(b_i))
                    out_n.append(int(counts[b_i]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "bin": out_bin, "n_px": out_n}
            )

    hist = docs.mapInPandas(build_and_hist, schema="doc_id long, bin long, n_px long")
    return (
        hist.groupBy("doc_id", "bin")
        .agg(F.sum("n_px").cast("long").alias("n_px"))
        .orderBy("doc_id", "bin")
    )


ext_image_histogram.__doc__ = ext_image_histogram.__doc__.format(b=_IMG_HIST_BINS)
