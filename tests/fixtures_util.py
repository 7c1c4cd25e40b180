"""Load and compare the reference's golden test fixtures.

Fixture format (reference: test/run_test.sh): a ``.tr`` program with an
embedded ``-- unit tests --`` JSON trailer (lines prefixed with ``--``), or
a ``.json`` file holding the flat IR plus ``tests``.  Each test case has
``trails`` (a list of {cookie: [events]} dicts, one per source file),
optional per-case ``filter``, and ``expected`` (object or list).  Params
come from the trailer's top-level ``params``; window/exclude side inputs
from ``<file>.window.csv`` / ``<file>.exclude.csv`` sidecars.

Comparison mirrors test/ddiff.py (rows keyed by %/# bindings, sets
order-insensitive) but is *stricter*: single-object results are actually
asserted (ddiff forgot to), and ^hll hex values are compared exactly.
"""

from __future__ import annotations

import json
import os
import re

REF_TEST_DIR = "/root/reference/test"

# Python ports of the fixture FFI functions (test_ffi.tr.c,
# test_extra_parameters.tr.c) — string in/out, like the reference C ABI.
FIXTURE_FN_REGISTRY = {
    "foo1": lambda a0: "test",
    "foo": lambda a0, a1, a2, a3, a4, a5: "test",
    "inner_fn": lambda a0: b"inner_" + a0,
    "outer_fn": lambda a0, a1: b"outer_" + a1,
    "tu_concat": lambda a0, a1: a0 + a1,
}

_MARKER = re.compile(r"-- ?unit tests ?--")


def load_tr_fixture(path: str) -> tuple[str, dict]:
    """-> (program_text, trailer_json)."""
    text = open(path).read()
    lines = text.split("\n")
    trailer_lines = []
    seen = False
    for line in lines:
        if seen:
            trailer_lines.append(re.sub(r"^--*", "", line))
        elif _MARKER.search(line):
            seen = True
    trailer = json.loads("\n".join(trailer_lines)) if seen else {}
    return text, trailer


def load_json_fixture(path: str) -> tuple[dict, dict]:
    """-> (ir, trailer) — same object plays both roles."""
    data = json.load(open(path))
    return data, data


def sidecar(path: str, suffix: str) -> str | None:
    p = path + suffix
    return open(p).read() if os.path.exists(p) else None


def rows_match(expected: dict, actual: dict, check_hll: bool = True) -> list[str]:
    """Compare one expected result object against an actual one.
    Returns a list of mismatch descriptions (empty = match)."""
    problems = []
    for k, v in expected.items():
        if k == "desc":
            continue
        if not check_hll and k.startswith("^"):
            continue
        if k not in actual:
            problems.append(f"missing key {k}")
            continue
        a = actual[k]
        if isinstance(v, list):
            if set(map(str, v)) != set(map(str, a)):
                problems.append(f"{k}: expected {sorted(map(str, v))} got {sorted(map(str, a))}")
        elif isinstance(v, dict):
            if {str(x): y for x, y in v.items()} != {str(x): y for x, y in a.items()}:
                problems.append(f"{k}: expected {v} got {a}")
        else:
            if str(v) != str(a) and v != a:
                problems.append(f"{k}: expected {v!r} got {a!r}")
    return problems


def compare_results(expected, actual, check_hll: bool = True) -> list[str]:
    """ddiff-style comparison; returns mismatch descriptions."""
    problems = []
    if isinstance(expected, list):
        if not isinstance(actual, list):
            return [f"expected list result, got {type(actual).__name__}"]
        for exp_row in expected:
            exp_key = {
                k: v for k, v in exp_row.items() if k and k[0] in "%#"
            }
            match = None
            for a in actual:
                ok = True
                for k, v in exp_key.items():
                    av = a.get(k)
                    if isinstance(v, list):
                        if set(map(str, v)) != set(map(str, av or [])):
                            ok = False
                            break
                    elif str(av) != str(v):
                        ok = False
                        break
                if ok:
                    match = a
                    break
            if match is None:
                problems.append(f"row not found for bindings {exp_key}")
                continue
            problems.extend(
                f"[{exp_key}] {p}"
                for p in rows_match(exp_row, match, check_hll)
            )
    else:
        if not isinstance(actual, dict):
            return [f"expected object result, got {type(actual).__name__}"]
        problems.extend(rows_match(expected, actual, check_hll))
    return problems
