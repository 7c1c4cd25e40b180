"""Property-based differential for the streaming path: random programs
and random trails through ``streaming_partials`` — one micro-batch per
source db, end-of-trail markers for finalization — must produce the
same merged results as the pure-Python local runner.  With
test_property_fsm.py (interpreter == codegen) and
test_property_engine.py (== Spark batch plan), this makes all four
execution paths program-space-fuzzed, not just fixture-tested; the
db-split trails exercise the cross-micro-batch carried state that the
``*_split`` golden fixtures cover with fixed programs.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.fixtures_util import compare_results
from tests.test_property_engine import multi_db_trails
from tests.test_property_fsm import (
    FFI_REGISTRY,
    _run_text,
    random_programs,
)
from tests.test_streaming import _rows_to_output, _stream_fixture

_dir_seq = itertools.count()

_COOKIES = ["0000", "0001", "0002"]
_REPLS = ["R0", "R1"]


def _flatten(trails_dbs):
    """Merge the db split back into one db (concatenation preserves the
    per-uuid event order): the streaming side-input harness splits files
    by timestamp midpoint, not by source db."""
    merged: dict = {}
    for db in trails_dbs:
        for c, evs in db.items():
            merged.setdefault(c, []).extend(evs)
    return [merged]


@st.composite
def stream_side_inputs(draw):
    """(window_entries | None, exclude) with raw cookie strings for the
    DataFrame side and the equivalent hex forms for the local runner."""
    exclude = {
        c for c in _COOKIES if draw(st.booleans()) and draw(st.booleans())
    }
    if not draw(st.booleans()):
        return None, exclude
    entries = []
    for c in _COOKIES:
        for _ in range(draw(st.integers(min_value=0, max_value=2))):
            start = draw(st.integers(min_value=0, max_value=400))
            end = start + draw(st.integers(min_value=0, max_value=400))
            repl = draw(st.sampled_from([None, None] + _REPLS))
            entries.append((c, start, end, repl))
    if not entries:
        entries = [(_COOKIES[0], 0, 200, None)]
    return entries, exclude


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(trails_dbs=multi_db_trails(), prog=random_programs())
def test_streaming_equals_local_on_random_programs(
    spark, tmp_path, trails_dbs, prog
):
    text, params = prog
    expected = _run_text(text, params, trails_dbs, no_codegen=False)
    # hypothesis reuses the function-scoped tmp_path across examples;
    # _stream_fixture mkdirs its source dir, so give each example its own
    rows = _stream_fixture(
        spark, tmp_path / f"ex{next(_dir_seq)}", trails_dbs, text, params,
        fn_registry=FFI_REGISTRY, dedup_cols="all",
    )
    actual = _rows_to_output(text, params, rows, FFI_REGISTRY)
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"program:\n{text}", f"trails: {trails_dbs!r}", *problems]
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    trails_dbs=multi_db_trails(),
    prog=random_programs(),
    sides=stream_side_inputs(),
)
def test_streaming_side_inputs_equal_local_on_random_programs(
    spark, tmp_path, trails_dbs, prog, sides
):
    """window_df / exclude_df stream-static joins (the a201123 fix area:
    per-(original uuid, entry) state keys, replacement-id rebinding,
    marker passthrough) fuzzed against the local runner's window_set /
    exclude semantics."""
    from trck_spark.io import trails_json_to_df
    from trck_spark.runner import cookie_to_bytes, run_program
    from tests.test_streaming import _run_stream_sideinput

    text, params = prog
    windows, exclude = sides
    trails = _flatten(trails_dbs)
    # shift window draws by the trails' 64-bit ts base (see
    # test_property_sideinputs) so [start, end) filtering stays live
    # under the 2^33/2^61 base draws
    if windows is not None:
        tmin = min(
            (
                e["timestamp"]
                for evs in trails[0].values()
                for e in evs
            ),
            default=0,
        )
        off = tmin - tmin % 1024 if tmin > 10**6 else 0
        windows = [(c, s + off, e + off, r) for c, s, e, r in windows]
    window_set = (
        [
            (
                cookie_to_bytes(c).hex(),
                s,
                e,
                cookie_to_bytes(r).hex() if r else None,
            )
            for c, s, e, r in windows
        ]
        if windows is not None
        else None
    )
    expected = run_program(
        text, trails, params=params,
        window_set=window_set,
        exclude={cookie_to_bytes(c).hex() for c in exclude},
        fn_registry=FFI_REGISTRY,
    )
    all_fields = sorted(
        {k for evs in trails[0].values() for e in evs for k in e}
        - {"timestamp"}
    )
    ev = trails_json_to_df(spark, trails).select(
        "uuid", "timestamp", "seq", *all_fields
    )
    w_df = (
        spark.createDataFrame(
            windows, "uuid string, s long, e long, rid string"
        )
        if windows is not None
        else None
    )
    ex_df = (
        spark.createDataFrame([(c,) for c in sorted(exclude)], "uuid string")
        if exclude
        else None
    )
    rows = _run_stream_sideinput(
        spark,
        tmp_path / f"sx{next(_dir_seq)}",
        ev,
        text,
        exclude_df=ex_df,
        window_df=w_df,
        params=params,
        fn_registry=FFI_REGISTRY,
        dedup_cols="all",
    )
    actual = _rows_to_output(text, params, rows, FFI_REGISTRY)
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [
            f"program:\n{text}",
            f"trails: {trails!r}",
            f"windows: {windows!r}",
            f"exclude: {sorted(exclude)!r}",
            *problems,
        ]
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(trails_dbs=multi_db_trails(), prog=random_programs())
def test_streaming_dedup_carry_equals_single_db_local(
    spark, tmp_path, trails_dbs, prog
):
    """dedup_carry=True makes micro-batch boundaries invisible to the
    consecutive-duplicate skip: streaming the dbs as separate triggers
    must equal the local runner on the SAME events as ONE db — including
    when multi_db_trails cut a trail mid-stream right at a duplicate
    (the ADVICE r06 boundary-straddling divergence, now a switchable
    semantic pinned here over random programs)."""
    text, params = prog
    expected = _run_text(
        text, params, _flatten(trails_dbs), no_codegen=False
    )
    rows = _stream_fixture(
        spark, tmp_path / f"dc{next(_dir_seq)}", trails_dbs, text, params,
        fn_registry=FFI_REGISTRY, dedup_cols="all", dedup_carry=True,
    )
    actual = _rows_to_output(text, params, rows, FFI_REGISTRY)
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"program:\n{text}", f"trails: {trails_dbs!r}", *problems]
    )
