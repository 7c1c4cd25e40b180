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


def _both_db(spark, df):
    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = _run(spark, df, db_col="db")
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = _run(spark, df, db_col="db")
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    return fast, slow


def test_funnel_multidb_quit_before_smaller_ts_click(spark):
    """db-major assembly puts a smaller-ts click after a timeout-firing
    event; the stream-position compiled form must fire the quit (the
    naive min-agg would count the conversion)."""
    dbs = [
        {
            COOKIE: [
                {"timestamp": 0, "event_type": "view"},
                {"timestamp": 3700, "event_type": "error"},  # fires after 1h
            ]
        },
        {COOKIE: [{"timestamp": 300, "event_type": "click"}]},
    ]
    fast, slow = _both_db(spark, trails_json_to_df(spark, dbs))
    assert fast == slow == {"$conv": 0}


def test_funnel_multidb_converts_across_dbs(spark):
    """view in db0, click in db1 inside the window, no intermediate
    timeout event -> conversion carries across the db boundary."""
    dbs = [
        {COOKIE: [{"timestamp": 1000, "event_type": "view"}]},
        {COOKIE: [{"timestamp": 2000, "event_type": "click"}]},
    ]
    fast, slow = _both_db(spark, trails_json_to_df(spark, dbs))
    assert fast == slow == {"$conv": 1}


def test_funnel_multidb_click_before_view_in_stream(spark):
    """the click lives in an EARLIER db than the view, so in stream
    order it precedes the A event and must not convert, even though
    its timestamp is inside the window."""
    dbs = [
        {COOKIE: [{"timestamp": 500, "event_type": "click"}]},
        {COOKIE: [{"timestamp": 100, "event_type": "view"}]},
    ]
    fast, slow = _both_db(spark, trails_json_to_df(spark, dbs))
    assert fast == slow == {"$conv": 0}


def test_funnel_multidb_click_at_deadline_quits(spark):
    """the first click after the view arrives exactly at the deadline:
    the after-edge fires before the clause match (expires > ts must
    hold to stay in the block)."""
    dbs = [
        {COOKIE: [{"timestamp": 0, "event_type": "view"}]},
        {COOKIE: [{"timestamp": 3600, "event_type": "click"}]},
    ]
    fast, slow = _both_db(spark, trails_json_to_df(spark, dbs))
    assert fast == slow == {"$conv": 0}


def test_funnel_multidb_random_differential(spark):
    """Random trails with random db splits: the stream-position compiled
    form must agree with the FSM path on every trail (seeded, so
    deterministic across runs)."""
    import random

    rng = random.Random(20260813)
    types = ["view", "click", "error", "buy"]
    db0: dict = {}
    db1: dict = {}
    for i in range(60):
        u = f"rnd{i:03d}"
        n = rng.randint(1, 10)
        ts = 0
        evs = []
        for _ in range(n):
            ts += rng.choice([1, 100, 1700, 1900, 3500, 3700, 4000])
            evs.append({"timestamp": ts, "event_type": rng.choice(types)})
        cut = rng.randint(0, len(evs))
        # db0 takes a prefix, db1 the rest — db-major assembly then
        # interleaves non-monotonic timestamps whenever cut > 0
        db0[u] = evs[:cut]
        db1[u] = rng.sample(evs[cut:], len(evs) - cut)
    df = trails_json_to_df(spark, [db0, db1])
    fast, slow = _both_db(spark, df)
    assert fast == slow
