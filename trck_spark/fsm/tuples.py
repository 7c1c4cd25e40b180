"""String-tuple encoding for set/multiset/HLL yield keys.

Byte-compatible with the reference encoding (reference: src/utils.c:59-166,
src/utils.h:1-50): a tuple is items joined by ``,``, each item prefixed with a
one-byte type tag (``S`` for utf-8 strings, ``B`` for raw bytes such as the
16-byte cookie), with bytes that would collide with the framing escaped:

    0x00 -> 0xff 0xfe
    ','  -> 0xff 0xfd
    0xff -> 0xff 0xff

The reference accumulates tuples into a fixed 256-byte buffer and silently
truncates; we replicate the exact truncation behavior (including the quirky
"skip the whole item iff len == cap-5" rule) because encoded tuples are the
identity of set members — truncation changes results.
"""

from __future__ import annotations

TYPE_STRING = 0x53  # 'S'
TYPE_BYTES = 0x42  # 'B'

_BUF_SIZE = 256


def encode_tuple(items: list[tuple[bytes, int]]) -> bytes:
    """Encode [(raw_value_bytes, type), ...] into the reference tuple format.

    Each raw value is first clamped to 256 bytes (the reference stages every
    item through a 256-byte buffer before appending — src/fsm2c.py:286-292).
    """
    buf = bytearray()
    for val, typ in items:
        val = val[:_BUF_SIZE]
        if len(buf) == _BUF_SIZE - 5:
            # reference: string_tuple_append returns without appending
            continue
        if buf:
            buf.append(0x2C)  # ','
        buf.append(typ)
        for b in val:
            if b == 0x2C:
                buf.append(0xFF)
                buf.append(0xFD)
            elif b == 0x00:
                buf.append(0xFF)
                buf.append(0xFE)
            elif b == 0xFF:
                buf.append(0xFF)
                buf.append(0xFF)
            else:
                buf.append(b)
            if len(buf) >= _BUF_SIZE - 2:
                break
    return bytes(buf)


def decode_tuple(encoded: bytes) -> list[tuple[bytes, int]]:
    """Inverse of encode_tuple (reference: string_tuple_extract_head)."""
    items: list[tuple[bytes, int]] = []
    i = 0
    n = len(encoded)
    while i < n:
        typ = encoded[i]
        i += 1
        out = bytearray()
        while i < n and encoded[i] != 0x2C:
            b = encoded[i]
            if b == 0xFF:
                i += 1
                e = encoded[i] if i < n else 0
                if e == 0xFF:
                    out.append(0xFF)
                elif e == 0xFE:
                    out.append(0x00)
                elif e == 0xFD:
                    out.append(0x2C)
                i += 1
            else:
                out.append(b)
                i += 1
        if i < n and encoded[i] == 0x2C:
            i += 1
        items.append((bytes(out), typ))
    return items


def _utf8_valid_prefix(raw: bytes) -> bytes:
    """Longest valid utf-8 prefix (reference truncates JSON strings at the
    first invalid byte — src/results_json.c:62-75, src/utf8_check.c)."""
    try:
        raw.decode("utf-8")
        return raw
    except UnicodeDecodeError as e:
        return raw[: e.start]


def tuple_to_display(encoded: bytes) -> str:
    """Render an encoded tuple the way the reference prints set members:
    items comma-joined; STRING items as utf-8 text (truncated at the first
    invalid byte), BYTES items lowercase-hex (reference:
    src/results_json.c:104-134)."""
    parts = []
    for val, typ in decode_tuple(encoded):
        if typ == TYPE_BYTES:
            parts.append(val.hex())
        else:
            parts.append(_utf8_valid_prefix(val).decode("utf-8"))
    return ",".join(parts)
