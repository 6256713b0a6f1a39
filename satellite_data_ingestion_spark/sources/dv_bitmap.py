"""Deletion-vector bitmap codec: Z85 + Roaring, per the public specs.

Implements the byte formats the Delta protocol's DELETION VECTORS
feature is built on (delta.io PROTOCOL.md, "Deletion Vectors" +
"Deletion Vector Descriptor Schema"), so a merge-on-read DELETE can
mark rows dead WITHOUT rewriting data files — the capability gap the
reference's rewrite-everything slot repair loop (`sources/meteosat.py:
187-197`) never closes:

- **Z85** (ZeroMQ spec 32/Z85, public): binary-to-text encoding used by
  the descriptor's ``pathOrInlineDv`` field for inline
  (``storageType: "i"``) vectors.  4 input bytes -> 5 output chars,
  big-endian base-85 over Z85's 85-char alphabet.  DV payloads are
  int32-aligned by construction, so the spec's multiple-of-4 input
  requirement always holds.
- **32-bit Roaring bitmap** (RoaringFormatSpec, public): sorted row
  indexes grouped by their high 16 bits; each group stored as an ARRAY
  container (sorted uint16 list, cardinality <= 4096) or a BITMAP
  container (2^16-bit bitset) — run containers are never written, so
  the cookie is always ``SERIAL_COOKIE_NO_RUNCONTAINER`` (12346) and
  the offset header is always present, exactly as the format spec
  prescribes for that cookie.
- **64-bit RoaringBitmapArray, "portable" form**: ``int64 LE`` count of
  consecutive 32-bit bitmaps (index = high 32 bits of the row id),
  each serialized in the standard 32-bit format above.  A deletion
  vector's serialized payload is the 4-byte magic ``1681511377``
  (int32 LE) followed by this portable array.

Everything here is driver-side metadata work: a DV's size follows the
count of DELETED rows in one file (<= rows-per-file), never table
volume, which is what makes merge-on-read DELETE an O(changed-rows)
operation on a 100 TB table.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable

# ZeroMQ 32/Z85 alphabet (public spec), in code-point order 0..84.
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

# RoaringFormatSpec cookies.
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
# Delta's RoaringBitmapArray serialization magic (PROTOCOL.md).
DV_MAGIC = 1681511377

_ARRAY_CONTAINER_MAX = 4096  # cardinality above this -> bitmap container
_BITMAP_CONTAINER_BYTES = 1 << 13  # 2^16 bits


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (length must be a multiple of 4)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Decode a Z85 string (length must be a multiple of 5)."""
    if len(text) % 5:
        raise ValueError(f"Z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {text[i:i + 5]!r} overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


def _split_containers(values: list[int]) -> list[tuple[int, list[int]]]:
    """Sorted uint32 values -> [(high16 key, sorted low16 list)]."""
    groups: dict[int, list[int]] = {}
    for v in values:
        groups.setdefault(v >> 16, []).append(v & 0xFFFF)
    return sorted(groups.items())


def roaring32_serialize(values: Iterable[int]) -> bytes:
    """Standard 32-bit Roaring serialization of ``values`` (uint32 set).

    Writes array containers (sorted uint16 payload) below 4097 entries
    and bitmap containers (8 KiB bitset) above; never run containers,
    so the cookie is SERIAL_COOKIE_NO_RUNCONTAINER and the offset
    header (one uint32 per container, byte offset of its payload from
    the start of the stream) is mandatory per the format spec."""
    vals = sorted(set(values))
    if vals and not 0 <= vals[0] <= vals[-1] <= 0xFFFFFFFF:
        raise ValueError("roaring32 values must be uint32")
    containers = _split_containers(vals)
    n = len(containers)
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", key, len(lows) - 1) for key, lows in containers
    )
    # Offsets point at container payload starts, measured from byte 0 of
    # the stream; the payload area begins after cookie(8) + descriptive
    # header(4n) + offset header(4n).
    payloads = []
    for _, lows in containers:
        if len(lows) > _ARRAY_CONTAINER_MAX:
            bits = bytearray(_BITMAP_CONTAINER_BYTES)
            for low in lows:
                bits[low >> 3] |= 1 << (low & 7)
            payloads.append(bytes(bits))
        else:
            payloads.append(struct.pack(f"<{len(lows)}H", *lows))
    offset = 8 + 4 * n + 4 * n
    offsets = []
    for p in payloads:
        offsets.append(offset)
        offset += len(p)
    offs = struct.pack(f"<{n}I", *offsets) if n else b""
    return header + desc + offs + b"".join(payloads)


def roaring32_deserialize(data: bytes, base: int = 0) -> tuple[list[int], int]:
    """Decode one standard 32-bit Roaring bitmap starting at ``base``;
    returns (sorted values, bytes consumed).  Rejects the run-container
    cookie loudly — this codec never writes runs, and silently
    mis-parsing a foreign stream would corrupt a deletion vector."""
    (cookie,) = struct.unpack_from("<I", data, base)
    if cookie & 0xFFFF == _SERIAL_COOKIE_RUN:
        raise ValueError("run containers unsupported by this DV codec")
    if cookie != _SERIAL_COOKIE_NO_RUN:
        raise ValueError(f"unrecognized roaring cookie {cookie}")
    (n,) = struct.unpack_from("<I", data, base + 4)
    desc = struct.unpack_from(f"<{2 * n}H", data, base + 8)
    keys = desc[0::2]
    cards = [c + 1 for c in desc[1::2]]
    pos = base + 8 + 4 * n + 4 * n  # skip the offset header on read
    values: list[int] = []
    for key, card in zip(keys, cards):
        hi = key << 16
        if card > _ARRAY_CONTAINER_MAX:
            bits = data[pos : pos + _BITMAP_CONTAINER_BYTES]
            pos += _BITMAP_CONTAINER_BYTES
            for byte_i, byte in enumerate(bits):
                while byte:
                    low_bit = byte & -byte
                    values.append(hi | (byte_i << 3) | low_bit.bit_length() - 1)
                    byte ^= low_bit
        else:
            lows = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(hi | low for low in lows)
    return values, pos - base


def dv_serialize(positions: Iterable[int]) -> bytes:
    """Serialize row positions as a Delta deletion-vector payload:
    magic int32 LE + portable RoaringBitmapArray (int64 LE bitmap
    count, then consecutive 32-bit bitmaps; array index = high 32 bits
    of the 64-bit row index)."""
    vals = sorted(set(positions))
    if vals and vals[0] < 0:
        raise ValueError("row positions must be non-negative")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n_bitmaps = (max(buckets) + 1) if buckets else 0
    body = b"".join(
        roaring32_serialize(buckets.get(i, ())) for i in range(n_bitmaps)
    )
    return struct.pack("<Iq", DV_MAGIC, n_bitmaps) + body


def dv_deserialize(data: bytes) -> list[int]:
    """Decode a deletion-vector payload back to sorted row positions."""
    (magic, n_bitmaps) = struct.unpack_from("<Iq", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    pos = 12
    out: list[int] = []
    for i in range(n_bitmaps):
        vals, used = roaring32_deserialize(data, pos)
        pos += used
        out.extend((i << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"deletion vector has {len(data) - pos} trailing bytes"
        )
    return out


def dv_descriptor(positions: Iterable[int]) -> dict:
    """Inline deletion-vector descriptor (PROTOCOL.md "Deletion Vector
    Descriptor Schema"): ``storageType "i"``, Z85 payload in
    ``pathOrInlineDv``, decoded byte size, cardinality."""
    vals = sorted(set(positions))
    payload = dv_serialize(vals)
    # Z85 takes 4-byte groups; the payload is zero-padded to alignment
    # and ``sizeInBytes`` records the TRUE (unpadded) length, which the
    # decoder uses to strip the padding back off.
    pad = -len(payload) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(payload + b"\x00" * pad),
        "sizeInBytes": len(payload),
        "cardinality": len(vals),
    }


def dv_positions(descriptor: dict) -> list[int]:
    """Decode an inline descriptor back to sorted row positions."""
    if descriptor.get("storageType") != "i":
        raise NotImplementedError(
            f"only inline (storageType 'i') deletion vectors are "
            f"implemented; got {descriptor.get('storageType')!r}"
        )
    payload = z85_decode(descriptor["pathOrInlineDv"])
    size = descriptor.get("sizeInBytes", len(payload))
    if not len(payload) - 3 <= size <= len(payload):
        raise ValueError(
            f"descriptor sizeInBytes {size} inconsistent with decoded "
            f"payload size {len(payload)} (padding is at most 3 bytes)"
        )
    payload = payload[:size]
    vals = dv_deserialize(payload)
    card = descriptor.get("cardinality")
    if card is not None and card != len(vals):
        raise ValueError(
            f"descriptor cardinality {card} != decoded {len(vals)}"
        )
    return vals


def dv_union(a: dict | None, b: dict | None) -> dict:
    """Union two descriptors (either may be None) — the merge a second
    DELETE on an already-DV-carrying file performs."""
    pos: set[int] = set()
    if a is not None:
        pos.update(dv_positions(a))
    if b is not None:
        pos.update(dv_positions(b))
    return dv_descriptor(pos)
