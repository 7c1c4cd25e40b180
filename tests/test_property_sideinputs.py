"""Property-based differential for side inputs: random window files and
exclude lists, combined with random programs and db-split trails, must
produce identical results through the Spark engine and the local
runner.  The window file is the semantically trickiest side input —
multi-entry per uuid (independent evaluations), [start, end) event
filtering, replacement-id rebinding including MANY-TO-ONE replacement
ids shared across uuids (the exact shape of a streaming bug fixed in
a201123) — so it gets fuzzed rather than only fixture-tested.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.fixtures_util import compare_results
from tests.test_engine_spark import _trails_to_df
from tests.test_property_engine import multi_db_trails
from tests.test_property_fsm import FFI_REGISTRY, random_programs
from trck_spark.runner import cookie_to_bytes, run_program

# multi_db_trails draws cookies f"{i:04x}" for i < 3; "ffff" never
# occurs in the data, so its entries must be ignored by both paths
_HEX_POOL = [cookie_to_bytes(c).hex() for c in ["0000", "0001", "0002", "ffff"]]
_REPL_POOL = ["ab" * 16, "cd" * 16]  # shared across uuids: many-to-one


@st.composite
def side_inputs(draw):
    """(window_entries | None, exclude_set, cnf_filter | None) in the
    parse_window_csv / parse_exclude / IR "filter" shapes."""
    exclude = {
        h
        for h in _HEX_POOL
        if draw(st.booleans()) and draw(st.booleans())
    }
    cnf = None
    if draw(st.booleans()):
        # CNF pre-scan filter: it drops events BEFORE the consecutive-
        # duplicate skip, so its ordering vs dedup is part of what's
        # differentially fuzzed; "q" never occurs in the data
        clauses = []
        for _ in range(draw(st.integers(min_value=1, max_value=2))):
            terms = []
            for _ in range(draw(st.integers(min_value=1, max_value=2))):
                field = draw(st.sampled_from(["t", "u"]))
                value = draw(
                    st.sampled_from(
                        ["a", "b", "q", ""] if field == "t"
                        else ["x", "y", "q", ""]
                    )
                )
                term = {"field": field, "value": value}
                if draw(st.booleans()):
                    term["op"] = "notequal"
                terms.append(term)
            clauses.append(terms)
        cnf = {"clauses": clauses}
    if not draw(st.booleans()):
        return None, exclude, cnf
    entries = []
    for h in _HEX_POOL:
        for _ in range(draw(st.integers(min_value=0, max_value=2))):
            start = draw(st.integers(min_value=0, max_value=400))
            end = start + draw(st.integers(min_value=0, max_value=400))
            repl = draw(st.sampled_from([None, None] + _REPL_POOL))
            entries.append((h, start, end, repl))
    if not entries:
        entries = [(_HEX_POOL[0], 0, 200, None)]
    return entries, exclude, cnf


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    trails_dbs=multi_db_trails(),
    prog=random_programs(),
    sides=side_inputs(),
)
def test_spark_engine_equals_local_with_side_inputs(
    spark, trails_dbs, prog, sides
):
    from trck_spark.engine import TrckSparkEngine

    text, params = prog
    windows, exclude, cnf = sides
    # window draws live in [0, 800]; trails may draw a 64-bit ts base
    # (test_property_fsm.TS_BASES, 1024-aligned), which would make every
    # window miss every event — shift the windows by the recovered base
    # (tmin - tmin % 1024 == the base exactly, deltas sum < 1024 per
    # first event) so the [start, end) semantics stay exercised at any
    # base; both paths receive the SAME shifted windows
    if windows is not None:
        tmin = min(
            (
                e["timestamp"]
                for db in trails_dbs
                for evs in db.values()
                for e in evs
            ),
            default=0,
        )
        off = tmin - tmin % 1024 if tmin > 10**6 else 0
        windows = [(h, s + off, e + off, r) for h, s, e, r in windows]
    expected = run_program(
        text, trails_dbs, params=params,
        window_set=windows, exclude=exclude, event_filter=cnf,
        fn_registry=FFI_REGISTRY,
    )
    df = _trails_to_df(spark, trails_dbs)
    rs = TrckSparkEngine(spark).run(
        df,
        text,
        params=params,
        event_filter=cnf,
        window_entries=windows,
        exclude=sorted(exclude) if exclude else None,
        uuid_col="uuid",
        ts_col="timestamp",
        seq_col="seq",
        db_col="db",
        fn_registry=FFI_REGISTRY,
        dedup_cols="all",
    )
    actual = rs.collect_json()
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [
            f"program:\n{text}",
            f"trails: {trails_dbs!r}",
            f"windows: {windows!r}",
            f"exclude: {sorted(exclude)!r}",
            f"filter: {cnf!r}",
            *problems,
        ]
    )
