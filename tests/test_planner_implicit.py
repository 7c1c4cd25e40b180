"""Value-keyed implicit-foreach compilation (planner.compile_counter_implicit)
must agree with the FSM/tuple-grid path and never round-trip the lexicon
through the driver."""

from __future__ import annotations

import os

import pytest

from trck_spark.engine import TrckFrameResultSet, TrckSparkEngine
from trck_spark.io import trails_json_to_df
from trck_spark.queries import PROG_COUNT_BY_TYPE, load_events

# negated NON-yielding clause (IR-level `op: not`, as in the reference's
# test_groupby.json): consumes every event whose item != i1, so only
# item=i1 events fall through to the yielding equi-join clause —
# exercises first-match ordering through the compiled CASE chain
IR_NEGATED = {
    "rules": [
        {
            "clauses": [
                {"attrs": {"item": ["i1"]}, "op": "not", "action": "repeat"},
                {
                    "attrs": {"event_type": ["%t"]},
                    "action": "repeat",
                    "yield": [{"dst": "$n"}],
                },
                {"attrs": {}, "action": "repeat"},
            ]
        }
    ],
    "groupby": {"vars": ["%t"]},
}

PROG_TWO_COUNTERS = """
foreach %t
    start ->
        receive
            event_type = %t, item = "i1" -> yield $a, yield $b
            event_type = %t -> yield $a
            * -> repeat
"""


def _run(spark, df, prog, **kw):
    return TrckSparkEngine(spark).run(
        df, prog, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq" if "seq" in df.columns else "event_id", **kw,
    )


def _both(spark, df, prog, **kw):
    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = _run(spark, df, prog, **kw)
    assert isinstance(fast, TrckFrameResultSet), "fast path not taken"
    fast_json = fast.collect_json()
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow_json = _run(spark, df, prog, **kw).collect_json()
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    return fast_json, slow_json


def _norm(rows):
    return sorted(rows, key=lambda r: sorted(r.items()).__repr__())


def test_count_by_type_on_events(spark):
    ev = load_events(spark, "/root/testdata/sf0.001")
    fast, slow = _both(spark, ev, PROG_COUNT_BY_TYPE)
    assert _norm(fast) == _norm(slow)


def test_micro_missing_field_and_empty(spark):
    # u2's second event has no event_type -> reads as "" and must count
    # toward the implicit "" tuple, exactly like the FSM path
    trails = [
        {
            "u1": [
                {"timestamp": 100, "event_type": "click"},
                {"timestamp": 200, "event_type": "view"},
                {"timestamp": 300, "event_type": "click"},
            ],
            "u2": [
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 200},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    fast, slow = _both(spark, df, PROG_COUNT_BY_TYPE)
    assert _norm(fast) == _norm(slow)
    by_t = {r["%t"]: r["$n"] for r in fast}
    assert by_t == {"": 1, "click": 2, "view": 2}


def test_micro_negated_clause(spark):
    trails = [
        {
            "u1": [
                {"timestamp": 100, "event_type": "click", "item": "i1"},
                {"timestamp": 200, "event_type": "view", "item": "i2"},
                {"timestamp": 300, "event_type": "click", "item": "i2"},
                {"timestamp": 400, "event_type": "view", "item": "i1"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    fast, slow = _both(spark, df, IR_NEGATED)
    assert _norm(fast) == _norm(slow)
    by_t = {r["%t"]: r["$n"] for r in fast}
    assert by_t == {"": 0, "click": 1, "view": 1}


def test_micro_two_counters_and_conjunction(spark):
    trails = [
        {
            "u1": [
                {"timestamp": 100, "event_type": "click", "item": "i1"},
                {"timestamp": 200, "event_type": "click", "item": "i2"},
                {"timestamp": 300, "event_type": "view", "item": "i1"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    fast, slow = _both(spark, df, PROG_TWO_COUNTERS)
    assert _norm(fast) == _norm(slow)
    by_t = {r["%t"]: (r["$a"], r["$b"]) for r in fast}
    assert by_t["click"] == (2, 1)
    assert by_t["view"] == (1, 1)  # ts=300 view has item=i1 -> both yields


def test_counters_df_schema(spark):
    ev = load_events(spark, "/root/testdata/sf0.001")
    df = _run(spark, ev, PROG_COUNT_BY_TYPE).counters_df()
    assert df.columns == ["t", "n"]
    assert dict(df.dtypes)["n"] == "bigint"


def test_no_collect_in_fast_path_plan(spark):
    """The lexicon must appear in the physical plan as a subquery/join,
    not as a LocalTableScan of driver-collected literals."""
    ev = load_events(spark, "/root/testdata/sf0.001")
    frame = _run(spark, ev, PROG_COUNT_BY_TYPE).counters_df()
    plan = frame._jdf.queryExecution().executedPlan().toString()
    # the grid is (distinct scan) union (one-row "" literal): exactly one
    # single-row local scan is expected, nothing lexicon-sized
    assert plan.count("LocalTableScan") <= 2


def test_lexicon_cap_fsm_path(spark):
    trails = [
        {
            "u1": [
                {"timestamp": 100, "event_type": "a"},
                {"timestamp": 200, "event_type": "b"},
                {"timestamp": 300, "event_type": "c"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    os.environ["TRCK_SPARK_MAX_LEXICON"] = "2"
    try:
        with pytest.raises(ValueError, match="exceeds 2 distinct"):
            _run(spark, df, PROG_COUNT_BY_TYPE)
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
        os.environ.pop("TRCK_SPARK_MAX_LEXICON", None)
