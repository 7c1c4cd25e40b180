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
