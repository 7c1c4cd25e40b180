"""Property-based differential testing: on randomized trails, the
generated matcher and the interpreter must agree exactly, for programs
covering every control-flow feature (timeout edges, nested windows,
re-arming transitions, quit, foreach grids, set/HLL yields).

This is the trick/-style model testing of the reference (SURVEY.md §5.3)
adapted to our two-execution-paths setup: the interpreter (validated by
the golden corpus) is the model; the generated code is the implementation
under test.
"""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

PROGRAMS = {
    "counter": """
start ->
    receive
        t = "a" -> yield $n
        * -> repeat
""",
    "funnel": """
start ->
    receive
        t = "a" -> w
        * -> repeat
w ->
    receive
        t = "b" -> yield $conv, quit
        * -> repeat
    after 100s -> quit
""",
    "sessions": """
start ->
    receive
        * -> yield $s, insession
insession ->
    receive
        * -> insession
    after 60s -> start
""",
    "bounce": """
start ->
    receive
        t = "a" -> w
        * -> repeat
w ->
    receive
        t = "a" -> w
        * -> start
    after 30s -> yield $b, start
""",
    "nested": """
start ->
    receive
        t = "a" -> outer
        * -> repeat
outer ->
    window
        inner ->
            receive
                t = "b" -> yield $m, yield start_timestamp[outer] to #w, inner2
                * -> repeat
            after 40s -> inner2
        inner2 ->
            receive
                t = "c" -> yield $m2, yield cookie to ^h, repeat
                * -> repeat
    after 120s -> start
""",
    "foreach": """
foreach %v in @arr
    start ->
        receive
            t = %v -> yield $k, yield ts to &m, repeat
            t = "z", u in #s -> yield $k2
            * -> repeat
""",
}

PARAMS = {
    "foreach": {"@arr": [["a"], ["b"], ["q"]], "#s": ["x", "y"]},
}

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # ts delta
        st.sampled_from(["a", "b", "c", "z", ""]),  # t
        st.sampled_from(["x", "y", ""]),            # u
    ),
    min_size=0,
    max_size=40,
)


def _trails(deltas):
    ts = 0
    events = []
    for delta, t, u in deltas:
        ts += delta
        e = {"timestamp": ts, "ts": str(ts)}
        if t:
            e["t"] = t
        if u:
            e["u"] = u
        events.append(e)
    return [{"abcd": events}]


def _run(prog_name, trails, no_codegen):
    from trck_spark.runner import run_program

    if no_codegen:
        os.environ["TRCK_SPARK_NO_CODEGEN"] = "1"
    else:
        os.environ.pop("TRCK_SPARK_NO_CODEGEN", None)
    try:
        return run_program(
            PROGRAMS[prog_name], trails, params=PARAMS.get(prog_name)
        )
    finally:
        os.environ.pop("TRCK_SPARK_NO_CODEGEN", None)


@settings(max_examples=150, deadline=None)
@given(deltas=events_strategy, prog=st.sampled_from(sorted(PROGRAMS)))
def test_codegen_equals_interpreter_on_random_trails(deltas, prog):
    trails = _trails(deltas)
    assert _run(prog, trails, True) == _run(prog, trails, False)
