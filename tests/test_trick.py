"""Model-based testing: trick-style generated trail corpora (see
trck_spark/testing/trick.py; reference trick/trick.py) driven
differentially through the interpreter, the generated matcher, and the
distributed engine, with closed-form expected results."""

from __future__ import annotations

import os

from trck_spark.queries import PROG_FUNNEL
from trck_spark.runner import run_program
from trck_spark.testing.trick import HOUR, between, ev, generate

FUNNEL_SPEC = [
    ev({"event_type": "view"}),
    between(0, 2 * HOUR, steps=6),
    ev({"event_type": "click"}),
]

PROG_COUNT_PARAM = """
foreach %a
    start ->
        receive
            event_type = "click", aeid = %a -> yield $n
            * -> repeat
"""

PARAM_SPEC = [
    ev({"event_type": "click", "aeid": "%a"}, must_change=["aeid"]),
    between(60, 600, steps=3),
    ev({"event_type": "click", "aeid": "%a"}, must_change=["aeid"]),
]


def _expected_conv(case) -> int:
    # funnel converts iff both steps positive and the click lands
    # strictly inside the 1h window
    return 1 if case.mask == 0 and case.gaps[0] < HOUR else 0


def _run_both_local(program, trails, params=None):
    outs = []
    for disable in ("1", ""):
        os.environ["TRCK_SPARK_NO_CODEGEN"] = disable
        outs.append(run_program(program, [trails], params=params))
    os.environ.pop("TRCK_SPARK_NO_CODEGEN", None)
    return outs


def test_trick_funnel_corpus_local():
    """Every generated case: interpreter == generated matcher == the
    closed-form expectation."""
    cases = generate(FUNNEL_SPEC)
    assert len(cases) == 24  # 4 masks x 6 gap-grid points
    for case in cases:
        interp, gen = _run_both_local(PROG_FUNNEL, {"u": case.trail})
        want = {"$conv": _expected_conv(case)}
        assert interp == gen == want, (case.mask, case.gaps, interp)


def test_trick_funnel_corpus_spark(spark):
    """The whole corpus through the distributed engine in one run (one
    uuid per case) must sum to the closed-form total."""
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.io import trails_json_to_df

    cases = generate(FUNNEL_SPEC)
    trails = {f"case{idx:03d}": c.trail for idx, c in enumerate(cases)}
    df = trails_json_to_df(spark, [trails])
    rs = TrckSparkEngine(spark).run(
        df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
    )
    want = sum(_expected_conv(c) for c in cases)
    assert rs.collect_json() == {"$conv": want}
    # force the FSM path too (the funnel compiles by default)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        rs2 = TrckSparkEngine(spark).run(
            df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp",
            seq_col="seq",
        )
        assert rs2.collect_json() == {"$conv": want}
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)


def test_trick_param_corpus_local():
    """Param-bound spec: the binding's own row carries the positive-event
    count; near-miss events (mutated aeid) land in other rows, never the
    binding's."""
    cases = generate(PARAM_SPEC)
    for case in cases:
        interp, gen = _run_both_local(
            PROG_COUNT_PARAM, {"u": case.trail}
        )
        assert interp == gen
        by_a = {r["%a"]: r["$n"] for r in interp}
        want = 2 - bin(case.mask).count("1")
        assert by_a.get(case.params["%a"], 0) == want, (
            case.mask, case.gaps, interp,
        )


def test_trick_adversarial_differential():
    """Adversarial corpus (near-misses mutate to OTHER bound values, so
    they can match other steps — no closed form): interpreter and the
    generated matcher must still agree on every case, for both the
    funnel and the bounce shapes."""
    from trck_spark.queries import PROG_BOUNCE

    specs = {
        PROG_FUNNEL: FUNNEL_SPEC,
        PROG_BOUNCE: [
            ev({"event_type": "view"}),
            between(0, HOUR, steps=5),
            ev({"event_type": "click"}),
            between(0, HOUR, steps=2),
            ev({"event_type": "view"}),
        ],
    }
    for prog, spec in specs.items():
        for case in generate(spec, adversarial=True, fillers=3):
            interp, gen = _run_both_local(prog, {"u": case.trail})
            assert interp == gen, (case.mask, case.gaps, interp, gen)


def test_trick_corpus_multi_db(spark):
    """Each generated trail split across two DBs (alternating events):
    the distributed engine's db-major assembly must agree with the local
    runner's multi-db evaluation on the whole corpus."""
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.io import trails_json_to_df

    cases = generate(FUNNEL_SPEC, adversarial=True)
    db0: dict = {}
    db1: dict = {}
    for idx, c in enumerate(cases):
        u = f"case{idx:03d}"
        db0[u] = c.trail[0::2]
        db1[u] = c.trail[1::2]
    want = run_program(PROG_FUNNEL, [db0, db1])
    df = trails_json_to_df(spark, [db0, db1])
    rs = TrckSparkEngine(spark).run(
        df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq", db_col="db",
    )
    assert rs.collect_json() == want


def test_trick_corpus_window_entries(spark):
    """Per-uuid window side input over the corpus: events outside each
    trail's window must vanish identically in the local runner and the
    engine (list AND DataFrame forms)."""
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.io import trails_json_to_df
    from trck_spark.runner import TrckQuery, cookie_to_bytes

    cases = generate(FUNNEL_SPEC)
    trails = {f"case{idx:03d}": c.trail for idx, c in enumerate(cases)}
    # window = first half of each trail's time span
    entries = []
    for u, evs in trails.items():
        ts = [e["timestamp"] for e in evs]
        lo, hi = min(ts), max(ts)
        entries.append(
            (cookie_to_bytes(u).hex(), lo, lo + max((hi - lo) // 2, 1),
             None)
        )
    q = TrckQuery(PROG_FUNNEL, window_set=entries)
    want = q.run_local([trails])
    df = trails_json_to_df(spark, [trails])
    eng = TrckSparkEngine(spark)
    got = eng.run(
        df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq", window_entries=entries,
    ).collect_json()
    assert got == want
    w_df = spark.createDataFrame(
        [(u, s, e) for u, s, e, _r in entries],
        "uuid string, s long, e long",
    )
    got_df = eng.run(
        df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq", window_entries=w_df,
    ).collect_json()
    assert got_df == want


def test_trick_corpus_grid_shapes_fast_vs_fsm(spark):
    """Adversarial corpus through the parameterized compiled shapes:
    the grid fast paths (islands / lead / exists-semi-join) must agree
    with the FSM path on every generated trail mix."""
    import trck_spark.queries as Q
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.io import trails_json_to_df

    spec = [
        ev({"event_type": "view"}),
        between(0, 3000, steps=3),
        ev({"event_type": "click"}),
        between(0, 700000, steps=3),
        ev({"event_type": "purchase"}),
    ]
    cases = generate(spec, adversarial=True, fillers=2)
    trails = {f"case{idx:03d}": c.trail for idx, c in enumerate(cases)}
    df = trails_json_to_df(spark, [trails])
    for progname in (
        "PROG_SESSIONS_BY_TYPE", "PROG_BOUNCE_BY_TYPE",
        "PROG_ATTRIBUTION_BY_TYPE",
    ):
        prog = getattr(Q, progname)

        def run():
            return TrckSparkEngine(spark).run(
                df, prog, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq",
            ).collect_json()

        fast = run()
        os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
        try:
            slow = run()
        finally:
            os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
        assert fast == slow, progname


def test_trick_nested_window_differential():
    """Nested `window {} after` machinery under a generated corpus:
    interpreter vs generated matcher on every (gap-grid x mask) trail,
    with the 1d outer window straddled by the gap grid."""
    from trck_spark.queries import PROG_NESTED_WINDOW
    from trck_spark.testing.trick import DAY

    spec = [
        ev({"event_type": "purchase"}),
        between(0, 2 * DAY, steps=5),
        ev({"event_type": "click"}),
        between(0, 2 * DAY, steps=3),
        ev({"event_type": "click"}),
    ]
    for case in generate(spec, adversarial=True, fillers=3):
        interp, gen = _run_both_local(
            PROG_NESTED_WINDOW, {"u": case.trail}
        )
        assert interp == gen, (case.mask, case.gaps, interp, gen)


def test_trick_corpus_grid_shapes_multidb(spark):
    """The parameterized sessions/bounce compiled shapes stay enabled
    with db_col set (stream-order-exact constructions): split every
    generated trail across two DBs (alternating events, so db-major
    assembly scrambles timestamps hard) and diff fast vs FSM.
    Attribution's grid path is gated to single-db, so with db_col it
    routes to FSM on both sides — included as a routing check."""
    import trck_spark.queries as Q
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.io import trails_json_to_df

    spec = [
        ev({"event_type": "view"}),
        between(0, 3000, steps=3),
        ev({"event_type": "click"}),
        between(0, 700000, steps=3),
        ev({"event_type": "purchase"}),
    ]
    cases = generate(spec, adversarial=True, fillers=2)
    db0 = {f"case{i:03d}": c.trail[0::2] for i, c in enumerate(cases)}
    db1 = {f"case{i:03d}": c.trail[1::2] for i, c in enumerate(cases)}
    df = trails_json_to_df(spark, [db0, db1])
    for progname in (
        "PROG_SESSIONS_BY_TYPE", "PROG_BOUNCE_BY_TYPE",
        "PROG_ATTRIBUTION_BY_TYPE",
    ):
        prog = getattr(Q, progname)

        def run():
            return TrckSparkEngine(spark).run(
                df, prog, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq", db_col="db",
            ).collect_json()

        fast = run()
        os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
        try:
            slow = run()
        finally:
            os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
        assert fast == slow, progname
