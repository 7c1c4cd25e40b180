"""End-to-end CLI, I/O utilities and result sinks."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from trck_spark.sinks import msgpack_dumps, write_results


def test_msgpack_encoder_basics():
    # spot-check against the msgpack spec's canonical encodings
    assert msgpack_dumps(None) == b"\xc0"
    assert msgpack_dumps(5) == b"\x05"
    assert msgpack_dumps(-1) == b"\xff"
    assert msgpack_dumps("abc") == b"\xa3abc"
    assert msgpack_dumps([1, 2]) == b"\x92\x01\x02"
    assert msgpack_dumps({"a": 1}) == b"\x81\xa1a\x01"
    big = msgpack_dumps(2**40)
    assert big[0] == 0xD3 and len(big) == 9


def test_write_results_shapes():
    from trck_spark.fsm.interpreter import Results
    from trck_spark.fsm.tuples import TYPE_STRING, encode_tuple
    from trck_spark.dsl import compile_tr
    from trck_spark.ir import Program

    prog = Program(
        compile_tr(
            """
start ->
    receive
        type = "x" -> yield $n, yield domain to #s, yield domain to &m
        * -> repeat
"""
        )
    )
    r = Results()
    r.counters["$n"] = 3
    k1 = encode_tuple([(b"a.com", TYPE_STRING)])
    k2 = encode_tuple([(b"b.com", TYPE_STRING)])
    r.sets["#s"] = {k1: 1, k2: 2}
    r.sets["&m"] = {k1: 4}
    js = json.loads(write_results(prog, {0: r}, None, "json"))
    assert js["$n"] == 3
    assert sorted(js["#s"]) == ["a.com", "b.com"]
    assert js["&m"] == {"a.com": 4}
    blob = write_results(prog, {0: r}, None, "msgpack")
    assert isinstance(blob, bytes) and len(blob) > 10


def test_io_roundtrip(spark):
    from trck_spark.io import df_to_trails_json, extract_trail, trails_json_to_df

    trails = [
        {
            "abcd": [
                {"timestamp": 1, "type": "cli", "d": "x"},
                {"timestamp": 2, "type": "imp"},
            ],
            "efgh": [{"timestamp": 5, "type": "pxl"}],
        }
    ]
    df = trails_json_to_df(spark, trails)
    assert df.count() == 3
    back = df_to_trails_json(df)
    abcd_hex = "abcd".encode().ljust(16, b"\0").hex()
    assert len(back[abcd_hex]) == 2
    assert back[abcd_hex][0]["type"] == "cli"
    tr = extract_trail(df, "abcd")
    assert [e["timestamp"] for e in tr] == [1, 2]


def test_cli_end_to_end(spark, tmp_path):
    """Run the CLI against a parquet events file and check trck JSON out."""
    from trck_spark.io import trails_json_to_df

    trails = [
        {
            "abcd": [
                {"timestamp": 100, "type": "cli", "advertisable_eid": "a1"},
                {"timestamp": 200, "type": "cli", "advertisable_eid": "a2"},
                {"timestamp": 300, "type": "imp", "advertisable_eid": "a1"},
            ]
        }
    ]
    pq = str(tmp_path / "events.parquet")
    trails_json_to_df(spark, trails).write.parquet(pq)

    prog = tmp_path / "prog.tr"
    prog.write_text(
        """
foreach %aeid
    start ->
        receive
            type = "cli", advertisable_eid = %aeid -> yield $match
            * -> repeat
"""
    )
    out = tmp_path / "out.json"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            sys.executable, "-m", "trck_spark", str(prog), pq,
            "--seq-col", "seq", "--output", str(out),
        ],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    rows = json.loads(out.read_text())
    by_aeid = {r["%aeid"]: r["$match"] for r in rows}
    assert by_aeid == {"": 0, "a1": 1, "a2": 1}


def test_cli_emit_matcher_compile_only(tmp_path):
    """`--emit-matcher` with no event paths is the reference's
    `trck -c prog.tr -o matcher` compile entry point: writes the
    generated per-trail matcher source and exits without Spark."""
    import subprocess
    import sys as _sys

    prog = tmp_path / "f.tr"
    prog.write_text(
        'start ->\n    receive\n        event_type = "click" -> '
        "yield $n\n        * -> repeat\n"
    )
    out = tmp_path / "matcher.py"
    res = subprocess.run(
        [_sys.executable, "-m", "trck_spark", str(prog),
         "--emit-matcher", str(out)],
        capture_output=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr.decode()[-1000:]
    src = out.read_text()
    assert "def match_trail(events, state, results, env, ev):" in src
    # the emitted source must be valid python
    compile(src, str(out), "exec")
    # no events and no --emit-matcher -> usage error
    res2 = subprocess.run(
        [_sys.executable, "-m", "trck_spark", str(prog)],
        capture_output=True, cwd="/root/repo",
    )
    assert res2.returncode != 0


def test_cli_json_event_input(spark, tmp_path):
    """A .json event path (trails-JSON, the json2tdb input shape) is
    accepted directly and mixes with parquet DBs in path order."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import subprocess
    import sys as _sys

    c = "ab" * 16
    (tmp_path / "db0.json").write_text(json.dumps(
        {c: [{"timestamp": 100, "event_type": "view"},
             {"timestamp": 200, "event_type": "click"}]}
    ))
    pq.write_table(
        pa.table({"uuid": [c], "timestamp": [300], "seq": [0],
                  "event_type": ["click"]}),
        tmp_path / "db1.parquet",
    )
    (tmp_path / "p.tr").write_text(
        'start ->\n    receive\n        event_type = "click" -> '
        "yield $n\n        * -> repeat\n"
    )
    out = tmp_path / "out.json"
    res = subprocess.run(
        [_sys.executable, "-m", "trck_spark", str(tmp_path / "p.tr"),
         str(tmp_path / "db0.json"), str(tmp_path / "db1.parquet"),
         "--seq-col", "seq", "--output", str(out)],
        capture_output=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr.decode()[-1500:]
    assert json.loads(out.read_text()) == {"$n": 2}


def test_cli_segmented_store_plus_plain_input_db_disjoint(spark, tmp_path):
    """ADVICE r07 (high): a segmented store at position 0 used to give
    its segments __db_index 0,1,2... while a plain input at position 1
    got bare index 1 — colliding with segment 1 and merging two sources
    into one timestamp-interleaved dedup scope.  With disjoint 100k
    ranges the identical click in segment 1 and in the plain input are
    DIFFERENT DBs, so both count (a collision dedup-merges them to 1)."""
    from trck_spark.store import append_trail_store

    schema = "uuid string, timestamp long, seq long, event_type string"
    store_path = str(tmp_path / "segstore")
    base = spark.createDataFrame([("u1", 100, 0, "view")], schema)
    seg = spark.createDataFrame([("u1", 200, 0, "click")], schema)
    append_trail_store(base, store_path, seq_col="seq")
    append_trail_store(seg, store_path)

    plain_pq = str(tmp_path / "plain.parquet")
    spark.createDataFrame(
        [("u1", 200, 0, "click")], schema
    ).write.parquet(plain_pq)

    prog = tmp_path / "prog.tr"
    prog.write_text(
        """
start ->
    receive
        event_type = "click" -> yield $clicks, repeat
        * -> repeat
"""
    )
    out = tmp_path / "out.json"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            sys.executable, "-m", "trck_spark", str(prog), store_path,
            plain_pq, "--seq-col", "seq", "--output", str(out),
        ],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    assert json.loads(out.read_text()) == {"$clicks": 2}


def test_cli_compacted_store_plus_plain_input_keeps_db_scopes(
    spark, tmp_path
):
    """ADVICE r08 (medium): a COMPACTED store carries its original
    segment index in the manifest db_col (__db0), not __segment.  The
    multi-input loader used to collapse it to one flat __db_index,
    merging the per-original-DB dedup scopes: a boundary-straddling
    duplicate (same uuid/ts/fields in two original segments) became
    consecutive in one scope and was dedup-dropped — CLI results over a
    compacted store differed from the same data pre-compaction,
    contradicting compact_trail_store's byte-identical claim."""
    import subprocess

    from trck_spark.store import append_trail_store, compact_trail_store

    schema = "uuid string, timestamp long, seq long, event_type string"
    store_path = str(tmp_path / "cstore_src")
    # identical click in both segments: per-DB scoping keeps both
    append_trail_store(
        spark.createDataFrame([("u1", 200, 0, "click")], schema),
        store_path, seq_col="seq",
    )
    append_trail_store(
        spark.createDataFrame([("u1", 200, 0, "click")], schema),
        store_path,
    )
    comp_path = str(tmp_path / "cstore")
    compact_trail_store(spark, store_path, comp_path)

    plain_pq = str(tmp_path / "cplain.parquet")
    spark.createDataFrame(
        [("u1", 300, 0, "click")], schema
    ).write.parquet(plain_pq)

    prog = tmp_path / "cprog.tr"
    prog.write_text(
        """
start ->
    receive
        event_type = "click" -> yield $clicks, repeat
        * -> repeat
"""
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    def _run_cli(store):
        out = tmp_path / f"out_{os.path.basename(store)}.json"
        res = subprocess.run(
            [
                sys.executable, "-m", "trck_spark", str(prog), store,
                plain_pq, "--seq-col", "seq", "--output", str(out),
            ],
            cwd="/root/repo", env=env, capture_output=True, timeout=300,
        )
        assert res.returncode == 0, res.stderr.decode()[-2000:]
        return json.loads(out.read_text())

    # pre-compaction (segmented) and post-compaction answers must agree
    assert _run_cli(comp_path) == {"$clicks": 3}
    assert _run_cli(store_path) == {"$clicks": 3}
