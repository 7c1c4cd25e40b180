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

# Hostile VALUES (VERDICT r06 item 5) — the encoding hazards the
# reference golden-tests (SURVEY §2.9): a comma collides with the
# tuple framing byte, NUL with its escape, multi-byte utf-8 crosses
# the 255-byte truncation boundary mid-codepoint, and a 300-byte
# string forces the truncation itself (reference: src/utils.c:59-166).
# They appear only as event VALUES (predicates keep clean literals);
# `*`-clause yields of t/u route them through the tuple encoding on
# every leg, and "x\x00" is additionally a #s0 member so set-membership
# compares them too.
_HOSTILE_T = ["a,b", "a\x00b", "ÿ€", "L" * 300]
_HOSTILE_U = ["x\x00", "€"]

# 64-bit timestamp bases (reference: test/tr/test_64bit_ts.tr:14-16) —
# weighted so most draws keep small timestamps (side-input windows are
# drawn in [0, 800) and should usually overlap the events)
TS_BASES = [0, 0, 0, 0, 2**33, 2**61]
ts_base_strategy = st.sampled_from(TS_BASES)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # ts delta
        st.sampled_from(["a", "b", "c", "z", ""] + _HOSTILE_T),  # t
        st.sampled_from(["x", "y", ""] + _HOSTILE_U),            # u
    ),
    min_size=0,
    max_size=40,
)


def _trails(deltas, base=0):
    ts = base
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


# --- random PROGRAMS, not just random trails ------------------------
#
# The reference's trick tool (reference trick/trick.py) model-tests the
# matcher by generating inputs against fixed programs; the six PROGRAMS
# above do the same here.  This section closes the other half of the
# space: the program TEXT itself is drawn — random state graphs, clause
# conjunctions, yield combinations, timeout edges, foreach wrapping —
# constrained to the documented grammar so every draw must parse and
# evaluate identically on both execution paths.  Window blocks are
# drawn too (never at `start`, which execution enters implicitly —
# the reference's programs always arm a window via a transition):
# inner transitions stay within the window (or repeat/quit/re-arm),
# the window's `after` edge returns to the outer graph, and inner
# yields may use `start_timestamp[window]`.

_COUNTERS = ["$c0", "$c1"]
_YIELD_ITEMS = [
    "t", "u", "ts", "cookie",
    # FFI terms (reference §2.8): plain, two-arg, and nested calls —
    # every leg passes FFI_REGISTRY so these evaluate on all paths.
    # f3/f4 return HOSTILE bytes (raw 0xff/0x00/comma/invalid-utf8 and
    # >255-byte items): the reference's values are bytes, so the
    # escape/truncation hazards unreachable through valid-utf-8 string
    # columns are reachable here on every leg (VERDICT r06 item 5)
    "f1(t)", "f2(u, cookie)", "f1(f2(t, ts))",
    "f3(u)", "f4(t)",
]


def _ffi_f1(b: bytes) -> bytes:
    return b[::-1]


def _ffi_f2(a: bytes, b: bytes) -> bytes:
    return a + b"_" + b


def _ffi_f3(b: bytes) -> bytes:
    # raw 0xff (escape lead byte), NUL, framing comma, and an
    # invalid-utf8 tail — all must round-trip the tuple encoding
    return b"\xff\x00," + b + b"\xfe\xff"


def _ffi_f4(b: bytes) -> bytes:
    # > 255 bytes: forces the 256-byte item clamp and the buffer
    # truncation rules (including the len == cap-5 skip quirk)
    return (b + b"Lq") * 96


FFI_REGISTRY = {
    "f1": _ffi_f1, "f2": _ffi_f2, "f3": _ffi_f3, "f4": _ffi_f4,
}


def _draw_actions(draw, targets, extra_items=(), allow_bare=False):
    """allow_bare: the transition may be omitted — legal on `after`
    edges (implicit restart-from-here) and on rule-0 clauses (implicit
    repeat); requires at least one yield so the action list is not
    empty."""
    items = _YIELD_ITEMS + list(extra_items)
    parts = []
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        kind = draw(st.sampled_from(["counter", "set", "mset", "hll"]))
        if kind == "counter":
            parts.append(f"yield {draw(st.sampled_from(_COUNTERS))}")
        elif kind == "set":
            picked = draw(
                st.lists(
                    st.sampled_from(items),
                    min_size=1, max_size=2, unique=True,
                )
            )
            parts.append(f"yield {', '.join(picked)} to #s0")
        elif kind == "mset":
            parts.append(
                f"yield {draw(st.sampled_from(items))} to &m0"
            )
        else:
            parts.append(
                f"yield {draw(st.sampled_from(items))} to ^h0"
            )
    if not (allow_bare and parts and draw(st.booleans())):
        parts.append(draw(st.sampled_from(targets + ["repeat", "quit"])))
    return ", ".join(parts)


def _draw_receive_body(draw, lines, ind, targets, use_foreach,
                       extra_items=(), bare_clauses=False):
    """Emit an exhaustive receive block (clauses + `*` fallback) and an
    optional timeout edge, transitioning only into ``targets``.
    bare_clauses: clauses may omit the transition (rule 0 only)."""
    lines.append(f"{ind}receive")
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        t_kinds = ["t_lit"] + (["t_var"] if use_foreach else [])
        preds = []
        which = draw(
            st.sampled_from(
                # conjunction members, no repeated field; "s" adds a
                # timestamp relop term (§2.2)
                ["t", "u", "tu", "s", "ts", "us"]
            )
        )
        if "t" in which:
            k = draw(st.sampled_from(t_kinds))
            # hostile LITERALS too (not just hostile values): the
            # grammar allows commas and NULs inside quoted strings, and
            # "a,b"/"a\x00b" are drawn event values, so these predicates
            # really match on every leg
            preds.append(
                "t = %v" if k == "t_var"
                else 't = "{}"'.format(
                    draw(
                        st.sampled_from(
                            ["a", "b", "c", "z", "a,b", "a\x00b"]
                        )
                    )
                )
            )
        if "u" in which:
            k = draw(st.sampled_from(["u_lit", "u_set"]))
            preds.append(
                "u in #s0" if k == "u_set"
                else 'u = "{}"'.format(
                    draw(st.sampled_from(["x", "y", "x\x00"]))
                )
            )
        if "s" in which:
            op = draw(st.sampled_from([">", "<", ">=", "<="]))
            if draw(st.booleans()):
                preds.append(f"timestamp {op} %since")
            else:
                n = draw(st.integers(min_value=0, max_value=300))
                preds.append(f"timestamp {op} {n}")
        acts = _draw_actions(draw, targets, extra_items, bare_clauses)
        lines.append(f"{ind}    {', '.join(preds)} -> {acts}")
    lines.append(
        f"{ind}    * -> "
        f"{_draw_actions(draw, targets, extra_items, bare_clauses)}"
    )
    if draw(st.booleans()):
        secs = draw(st.sampled_from([10, 30, 60, 100]))
        lines.append(
            f"{ind}after {secs}s -> "
            f"{_draw_actions(draw, targets, extra_items, allow_bare=True)}"
        )


@st.composite
def random_programs(draw):
    """(program_text, params) — valid by construction: every receive is
    exhaustive (`*` fallback), every transition targets an existing
    state, conjunctions never repeat a field, foreach programs may use
    `t = %v` and always get @arr/#s0 params.  Non-start states may be
    window blocks whose inner receives transition only within the
    window (or repeat/quit/re-arm) and whose required `after` edge
    returns to the outer state graph."""
    use_foreach = draw(st.booleans())
    states = ["start"] + [
        f"s{i}" for i in range(draw(st.integers(min_value=0, max_value=2)))
    ]
    is_window = {
        s: s != "start" and draw(st.booleans()) and draw(st.booleans())
        for s in states
    }
    ind = "    " if use_foreach else ""
    lines = []
    if use_foreach:
        merged = " merged results" if draw(st.booleans()) else ""
        lines.append(f"foreach %v in @arr{merged}")
    for s in states:
        lines.append(f"{ind}{s} ->")
        if is_window[s]:
            inner = [f"{s}w{j}" for j in
                     range(1 + draw(st.integers(min_value=0, max_value=1)))]
            extra = (f"start_timestamp[{s}]",)
            lines.append(f"{ind}    window")
            for w in inner:
                lines.append(f"{ind}        {w} ->")
                _draw_receive_body(
                    draw, lines, ind + " " * 12, inner + [s],
                    use_foreach, extra,
                )
            secs = draw(st.sampled_from([60, 120]))
            lines.append(
                f"{ind}    after {secs}s -> "
                f"{_draw_actions(draw, states, allow_bare=True)}"
            )
        else:
            _draw_receive_body(draw, lines, ind + "    ", states,
                               use_foreach,
                               bare_clauses=(s == "start"))
    # "x\x00" in #s0: set membership must compare hostile values
    # identically on the interpreter and the Spark IN-set form
    params = (
        {"@arr": [["a"], ["b"], ["q"]], "#s0": ["x", "y", "x\x00"]}
        if use_foreach
        else {"#s0": ["x", "y", "x\x00"]}
    )
    params["%since"] = str(draw(st.integers(min_value=0, max_value=300)))
    return "\n".join(lines) + "\n", params


def _run_text(text, params, trails, no_codegen):
    from trck_spark.runner import run_program

    if no_codegen:
        os.environ["TRCK_SPARK_NO_CODEGEN"] = "1"
    else:
        os.environ.pop("TRCK_SPARK_NO_CODEGEN", None)
    try:
        return run_program(
            text, trails, params=params, fn_registry=FFI_REGISTRY
        )
    finally:
        os.environ.pop("TRCK_SPARK_NO_CODEGEN", None)


@settings(max_examples=200, deadline=None)
@given(deltas=events_strategy, prog=random_programs(),
       base=ts_base_strategy)
def test_codegen_equals_interpreter_on_random_programs(
    deltas, prog, base
):
    text, params = prog
    trails = _trails(deltas, base)
    assert _run_text(text, params, trails, True) == _run_text(
        text, params, trails, False
    )


@settings(max_examples=200, deadline=None)
@given(deltas=events_strategy, prog=random_programs(),
       base=ts_base_strategy)
def test_grid_pruning_is_result_invariant(deltas, prog, base):
    """The occurring/non-occurring projection-key cache and the
    param-independence early-break (runner.trail_results; reference
    match_traildb.c:596-744) are correctness-relevant optimizations:
    every drawn program must produce IDENTICAL results with pruning
    forcibly disabled (VERDICT r06 item 6).  Non-foreach draws are
    trivially invariant and serve as the control."""
    text, params = prog
    trails = _trails(deltas, base)
    pruned = _run_text(text, params, trails, False)
    os.environ["TRCK_SPARK_NO_GRID_PRUNE"] = "1"
    try:
        unpruned = _run_text(text, params, trails, False)
    finally:
        os.environ.pop("TRCK_SPARK_NO_GRID_PRUNE", None)
    assert pruned == unpruned, (
        f"pruning changed results\nprogram:\n{text}\ntrails: {trails!r}"
        f"\npruned:   {pruned!r}\nunpruned: {unpruned!r}"
    )
