"""Result sinks: trck-shaped JSON and msgpack serialization.

msgpack layout mirrors the reference (src/results_msgpack.c): each result
variable maps to ``{"type": "int", "value": n}`` for counters and
``{"type": "set"|"multiset", "data": {head: [tail_id(, count)...]},
"lexicon": {tail: id}}`` for sets/multisets — tuples are split into their
first item (the head, raw bytes for cookie yields) and an interned tail.
HLLs are omitted from msgpack, as in the reference (results_msgpack.c:230).

The encoder is a minimal pure-python msgpack packer (the library isn't in
this container); it covers the subset the sink emits.
"""

from __future__ import annotations

import json
import struct

from trck_spark.fsm.hll import EMPTY_HLL_HEX, Hll
from trck_spark.fsm.interpreter import Results
from trck_spark.fsm.tuples import decode_tuple, encode_tuple
from trck_spark.ir import Program
from trck_spark.output import format_output


# ------------------------------------------------ minimal msgpack packer


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif isinstance(obj, bool):
        out.append(0xC3 if obj else 0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        else:
            out.append(0xD3)
            out += struct.pack(">q", obj)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, (str, bytes)):
        b = obj.encode("utf-8", "surrogateescape") if isinstance(obj, str) else obj
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for x in obj:
            _pack(x, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack {type(obj)}")


def msgpack_dumps(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


# ------------------------------------------------------- msgpack shaping


def _set_to_msgpack(d: dict[bytes, int], multiset: bool) -> dict:
    """Encoded-tuple dict -> {type, data, lexicon} (reference head/tail
    interning, Judy byte order)."""
    data: dict = {}
    lexicon: dict = {}
    for key in sorted(d):
        items = decode_tuple(key)
        head_raw, head_type = items[0] if items else (b"", 0x53)
        head = head_raw.decode("utf-8", "surrogateescape")
        tail_enc = encode_tuple(items[1:]) if len(items) > 1 else b""
        if tail_enc:
            # reference stores the escaped tail minus its leading type byte
            tail_key = tail_enc[1:].decode("utf-8", "surrogateescape")
        else:
            tail_key = None  # packed as msgpack nil, like the reference
        if tail_key not in lexicon:
            lexicon[tail_key] = len(lexicon) + 1
        tid = lexicon[tail_key]
        bucket = data.setdefault(head, [])
        bucket.append(tid)
        if multiset:
            bucket.append(d[key])
    return {
        "type": "multiset" if multiset else "set",
        "data": data,
        "lexicon": lexicon,
    }


def results_to_msgpack_obj(program: Program, res: Results | None) -> dict:
    r = res or Results()
    out: dict = {}
    for var in program.yield_counters:
        out[var] = {"type": "int", "value": r.counters.get(var, 0)}
    for var in program.yield_sets:
        out[var] = _set_to_msgpack(r.sets.get(var, {}), multiset=False)
    for var in program.yield_multisets:
        out[var] = _set_to_msgpack(r.sets.get(var, {}), multiset=True)
    # HLLs intentionally omitted (reference parity)
    return out


# ------------------------------------------------------ protobuf sink

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _tuple_msg(key: bytes, count: int | None) -> bytes:
    """SetTuple {repeated string values = 1} / MultisetTuple {+count = 2}."""
    body = b""
    for val, typ in decode_tuple(key):
        body += _ld(1, val)
    if count is not None:
        body += _tag(2, 0) + _varint(count)
    return body


def results_to_proto(
    program: Program,
    res: Results | None,
    field_numbers: dict[str, int],
    param_bindings: dict[str, str] | None = None,
) -> bytes:
    """One trck.Result message (reference: proto-example/Readme.md).

    field_numbers maps proto field names (``counter_x``, ``set_x``,
    ``multiset_x``, ``hll_x``, ``scalar_x``) to their numbers in the
    user's Result message — the analog of trck parsing the user .proto.
    Hll bins carry the RLE register bytes of the wire format.
    """
    r = res or Results()
    out = b""
    for name, val in (param_bindings or {}).items():
        fn = field_numbers.get("scalar_" + name.lstrip("%"))
        if fn:
            out += _ld(fn, str(val).encode())
    for var in program.yield_counters:
        fn = field_numbers.get("counter_" + var[1:])
        if fn:
            out += _tag(fn, 0) + _varint(r.counters.get(var, 0))
    for var in program.yield_sets:
        fn = field_numbers.get("set_" + var[1:])
        if fn:
            for key in sorted(r.sets.get(var, {})):
                out += _ld(fn, _tuple_msg(key, None))
    for var in program.yield_multisets:
        fn = field_numbers.get("multiset_" + var[1:])
        if fn:
            d = r.sets.get(var, {})
            for key in sorted(d):
                out += _ld(fn, _tuple_msg(key, d[key]))
    for var in program.yield_hlls:
        fn = field_numbers.get("hll_" + var[1:])
        if fn:
            regs = r.hlls.get(var)
            if not regs:
                body = _tag(1, 0) + _varint(14) + _tag(2, 0) + _varint(1)
            else:
                sketch = Hll()
                for idx, rank in regs.items():
                    sketch.set_register(idx, rank)
                bins = bytes.fromhex(sketch.to_hex()[4:])
                body = (
                    _tag(1, 0) + _varint(14) + _tag(2, 0) + _varint(0)
                    + _ld(3, bins)
                )
            out += _ld(fn, body)
    return out


def write_proto_results(
    program: Program,
    per_tuple: dict[int, Results],
    raw_tuples: list | None,
    field_numbers: dict[str, int],
) -> bytes:
    """Length-framed stream of Result messages: each message preceded by
    an 8-byte little-endian length (reference: proto-example/test.py)."""
    frames = []
    if raw_tuples is None or program.merge_results or not program.groupby:
        merged = Results()
        for r in per_tuple.values():
            merged.merge(r)
        frames.append(results_to_proto(program, merged, field_numbers))
    else:
        for i, tup in enumerate(raw_tuples):
            bindings = {
                var: (",".join(v) if isinstance(v, (list, tuple)) else v)
                for var, v in zip(program.groupby_vars, tup)
            }
            frames.append(
                results_to_proto(
                    program, per_tuple.get(i), field_numbers, bindings
                )
            )
    out = b""
    for f in frames:
        out += struct.pack("<Q", len(f)) + f
    return out


def write_results(
    program: Program,
    per_tuple: dict[int, Results],
    raw_tuples: list | None,
    fmt: str = "json",
) -> bytes:
    """Serialize aggregated results in the requested output format."""
    if fmt == "json":
        return (
            json.dumps(format_output(program, per_tuple, raw_tuples)) + "\n"
        ).encode()
    if fmt == "msgpack":
        if raw_tuples is None or program.merge_results or not program.groupby:
            merged = Results()
            for r in per_tuple.values():
                merged.merge(r)
            return msgpack_dumps(results_to_msgpack_obj(program, merged))
        rows = []
        for i, tup in enumerate(raw_tuples):
            obj = results_to_msgpack_obj(program, per_tuple.get(i))
            for var, val in zip(program.groupby_vars, tup):
                obj[var] = (
                    list(val) if isinstance(val, (list, tuple)) else val
                )
            rows.append(obj)
        return msgpack_dumps(rows)
    raise ValueError(f"unknown output format: {fmt}")
