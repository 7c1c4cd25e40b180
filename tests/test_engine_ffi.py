"""FFI yields through the distributed engine (the .tr.c analog is a
Python function registry shipped to executors in the UDF closure)."""

from __future__ import annotations

from trck_spark.engine import TrckSparkEngine
from trck_spark.io import trails_json_to_df

PROG = """
start ->
    receive
        type = "cli" -> yield tag(domain) to #tagged, repeat
        * -> repeat
"""


def test_ffi_through_spark(spark):
    trails = [
        {
            "abcd": [
                {"timestamp": 1, "type": "cli", "domain": "x.com"},
                {"timestamp": 2, "type": "imp", "domain": "y.com"},
            ],
            "efgh": [{"timestamp": 3, "type": "cli", "domain": "z.com"}],
        }
    ]
    df = trails_json_to_df(spark, trails)
    engine = TrckSparkEngine(spark)
    rs = engine.run(
        df,
        PROG,
        uuid_col="uuid",
        ts_col="timestamp",
        seq_col="seq",
        db_col="db",
        fn_registry={"tag": lambda d: b"tag_" + d},
    )
    out = rs.collect_json()
    assert sorted(out["#tagged"]) == ["tag_x.com", "tag_z.com"]


PROG_HOOKED = """
start ->
    receive
        type = "cli" -> yield greet(domain) to #tagged, repeat
        * -> repeat
"""


def _hooked_registry():
    """initialize/greet share a closure cell, so worker-side initialize
    observably feeds the yield-time UDF after pickling."""
    state: dict = {}

    def initialize():
        state["prefix"] = b"init_"

    def finalize():
        state["finalized"] = True

    def greet(domain):
        return state.get("prefix", b"MISSING_") + domain

    return {
        "initialize": initialize, "finalize": finalize, "greet": greet
    }, state


def test_hooks_local_runner():
    """run_local mirrors reference main(): initialize before the query,
    finalize after (match_traildb.c:1248-1256)."""
    from trck_spark.runner import run_program

    reg, state = _hooked_registry()
    trails = [{"abcd": [{"timestamp": 1, "type": "cli", "domain": "x"}]}]
    out = run_program(PROG_HOOKED, trails, fn_registry=reg)
    assert out["#tagged"] == ["init_x"]
    assert state.get("finalized") is True


def test_hooks_through_spark(spark):
    """initialize must run in every worker process before the first
    trail (the UDF output proves it); finalize runs driver-side when
    the result set materializes."""
    trails = [
        {
            "abcd": [{"timestamp": 1, "type": "cli", "domain": "x.com"}],
            "efgh": [{"timestamp": 2, "type": "cli", "domain": "z.com"}],
        }
    ]
    df = trails_json_to_df(spark, trails)
    reg, state = _hooked_registry()
    rs = TrckSparkEngine(spark).run(
        df, PROG_HOOKED, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq", fn_registry=reg,
    )
    out = rs.collect_json()
    assert sorted(out["#tagged"]) == ["init_x.com", "init_z.com"]
    assert state.get("finalized") is True  # driver-side finalize ran


def test_worker_query_cache_keyed_on_registry_identity():
    """Two queries with IDENTICAL spec_json but DIFFERENT fn_registry
    dicts must not share a cached compiled query — a long-lived executor
    serving a stream plus a batch run (or two streams) would otherwise
    call the wrong external functions (ADVICE r06: engine.py:284)."""
    import json

    from trck_spark.engine import _worker_query
    from trck_spark.runner import run_program

    prog = """
start ->
    receive
        event_type = "cli" -> yield tag(domain) to #tagged, repeat
        * -> repeat
"""
    spec = json.dumps({"ir": prog, "params": None, "tuples": None})
    reg_a = {"tag": lambda d: b"A_" + d}
    reg_b = {"tag": lambda d: b"B_" + d}
    trails = [{"u1": [
        {"timestamp": 1, "event_type": "cli", "domain": "x"},
    ]}]
    qa, _ = _worker_query(spec, reg_a)
    qb, _ = _worker_query(spec, reg_b)
    assert qa is not qb
    out_a = run_program(prog, trails, fn_registry=reg_a)
    out_b = run_program(prog, trails, fn_registry=reg_b)
    assert out_a["#tagged"] == ["A_x"]
    assert out_b["#tagged"] == ["B_x"]
    # same registry object still hits the cache
    qa2, _ = _worker_query(spec, reg_a)
    assert qa2 is qa
