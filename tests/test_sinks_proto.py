"""Protobuf sink: wire-format bytes must parse as valid proto3 and carry
the reference's Result-message structure (length-framed, SetTuple /
MultisetTuple / Hll submessages)."""

from __future__ import annotations

import struct

from trck_spark.dsl import compile_tr
from trck_spark.fsm.interpreter import Results
from trck_spark.fsm.tuples import TYPE_STRING, encode_tuple
from trck_spark.ir import Program
from trck_spark.sinks import write_proto_results


def _read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _parse_msg(buf):
    """-> {field_number: [values]} (varints and length-delimited)."""
    out: dict = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            n, i = _read_varint(buf, i)
            v = buf[i : i + n]
            i += n
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def test_proto_sink_roundtrip():
    prog = Program(
        compile_tr(
            """
foreach %a in @arr
    start ->
        receive
            type = "x", aid = %a -> yield $y, yield domain to #x, yield domain to &w, yield cookie to ^v
            * -> repeat
"""
        )
    )
    r = Results()
    r.counters["$y"] = 7
    k = encode_tuple([(b"a.com", TYPE_STRING)])
    r.sets["#x"] = {k: 1}
    r.sets["&w"] = {k: 3}
    r.hlls["^v"] = {100: 2}

    fields = {
        "scalar_a": 1, "multiset_w": 3, "hll_v": 4, "set_x": 5,
        "counter_y": 6,
    }
    blob = write_proto_results(prog, {0: r, 1: None}, [("c1",), ("c2",)], fields)

    # two frames, 8-byte LE length each
    n1 = struct.unpack("<Q", blob[:8])[0]
    msg1 = _parse_msg(blob[8 : 8 + n1])
    rest = blob[8 + n1 :]
    n2 = struct.unpack("<Q", rest[:8])[0]
    msg2 = _parse_msg(rest[8 : 8 + n2])
    assert rest[8 + n2 :] == b""

    assert msg1[1] == [b"c1"]          # scalar_a
    assert msg1[6] == [7]              # counter_y
    set_tuple = _parse_msg(msg1[5][0])
    assert set_tuple[1] == [b"a.com"]  # SetTuple.values
    mset_tuple = _parse_msg(msg1[3][0])
    assert mset_tuple[1] == [b"a.com"] and mset_tuple[2] == [3]
    hll = _parse_msg(msg1[4][0])
    assert hll[1] == [14] and hll[2] == [0] and len(hll[3][0]) > 0

    # densified zero row: counter 0, empty hll
    assert msg2[1] == [b"c2"]
    assert msg2[6] == [0]
    hll2 = _parse_msg(msg2[4][0])
    assert hll2[2] == [1]  # empty flag
