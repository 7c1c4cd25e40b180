"""The compiled funnel fast path must agree with the FSM path on real
data and on adversarial micro-fixtures."""

from __future__ import annotations

import os

from trck_spark.engine import TrckSparkEngine
from trck_spark.io import trails_json_to_df
from trck_spark.planner import is_simple_funnel_program
from trck_spark.queries import PROG_FUNNEL, load_events
from trck_spark.runner import TrckQuery


def test_funnel_shape_recognized():
    q = TrckQuery(PROG_FUNNEL)
    assert is_simple_funnel_program(q.program)
    # bounce re-arms inside the wait block -> NOT this shape
    from trck_spark.queries import PROG_BOUNCE, PROG_SESSIONS

    assert not is_simple_funnel_program(TrckQuery(PROG_BOUNCE).program)
    assert not is_simple_funnel_program(TrckQuery(PROG_SESSIONS).program)


def _run(spark, df, **kw):
    rs = TrckSparkEngine(spark).run(
        df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq" if "seq" in df.columns else "event_id", **kw
    )
    return rs.collect_json()


def test_funnel_compiled_vs_fsm_on_events(spark):
    ev = load_events(spark, "/root/testdata/sf0.01")
    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = _run(spark, ev)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = _run(spark, ev)
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    assert fast == slow


def test_parameterized_funnel_compiled_vs_fsm(spark):
    """foreach-grid funnel: the compiled grid-join path must match the
    FSM path per tuple, including the densified zero rows."""
    from trck_spark.queries import PROG_FUNNEL_BY_TYPE

    ev = load_events(spark, "/root/testdata/sf0.001")

    def run():
        rs = TrckSparkEngine(spark).run(
            ev, PROG_FUNNEL_BY_TYPE, uuid_col="uuid", ts_col="timestamp",
            seq_col="event_id",
        )
        return sorted(
            (r["%t"], r["$conv"]) for r in rs.collect_json()
        )

    q = TrckQuery(PROG_FUNNEL_BY_TYPE)
    assert is_simple_funnel_program(q.program)
    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = run()
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = run()
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    assert fast == slow
    assert any(n > 0 for _t, n in fast)


def test_funnel_compiled_vs_fsm_micro(spark):
    """Edge cases: click at exactly the deadline (excluded), click just
    inside (included), view with no click, click before view."""
    trails = [
        {
            "u1": [  # converts: click 3599s after view
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 3699, "event_type": "click"},
            ],
            "u2": [  # exactly at deadline: NOT within (strict >)
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 3700, "event_type": "click"},
            ],
            "u3": [  # no click
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 200, "event_type": "purchase"},
            ],
            "u4": [  # click precedes the first view
                {"timestamp": 50, "event_type": "click"},
                {"timestamp": 100, "event_type": "view"},
            ],
            "u5": [  # intervening events then in-window click
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 200, "event_type": "error"},
                {"timestamp": 300, "event_type": "click"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = _run(spark, df)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = _run(spark, df)
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    assert fast == slow == {"$conv": 2}  # u1 and u5


COOKIE = "cd" * 16
COOKIE2 = "ef" * 16


def test_funnel_window_entries_are_independent(spark):
    """Each window-file line is an independent evaluation unit: a view in
    entry [0,150) must NOT pair with a click in entry [150,400) of the
    same uuid (round-2 ADVICE high repro); an entry covering both events
    converts."""
    trails = [
        {
            COOKIE: [
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 200, "event_type": "click"},
            ],
            COOKIE2: [
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 200, "event_type": "click"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    entries = [
        (COOKIE, 0, 150, None),   # sees only the view
        (COOKIE, 150, 400, None),  # sees only the click
        (COOKIE2, 0, 400, None),   # sees both -> converts
    ]

    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = _run(spark, df, window_entries=entries)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = _run(spark, df, window_entries=entries)
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    assert fast == slow == {"$conv": 1}


def test_funnel_multidb_falls_back_to_fsm(spark):
    """db-major assembly can put a smaller-ts click after a timeout-firing
    event; the min-agg rewrite is unsound there, so db_col must route to
    the FSM path (results equal by construction — assert the semantics)."""
    dbs = [
        {
            COOKIE: [
                {"timestamp": 0, "event_type": "view"},
                {"timestamp": 3700, "event_type": "error"},  # fires after 1h
            ]
        },
        {COOKIE: [{"timestamp": 300, "event_type": "click"}]},
    ]
    df = trails_json_to_df(spark, dbs)
    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = _run(spark, df, db_col="db")
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = _run(spark, df, db_col="db")
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    assert fast == slow == {"$conv": 0}
