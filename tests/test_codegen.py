"""Differential validation: the generated per-program matcher must produce
identical results to the interpreter on every reference golden fixture.
(The main fixture suite already runs whichever path is default; this one
forces BOTH and compares them case by case.)
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from tests.fixtures_util import (
    FIXTURE_FN_REGISTRY,
    REF_TEST_DIR,
    load_json_fixture,
    load_tr_fixture,
    sidecar,
)
from trck_spark.runner import TrckQuery
from trck_spark.sideinputs import parse_exclude, parse_window_csv

ALL_FIXTURES = sorted(
    glob.glob(os.path.join(REF_TEST_DIR, "tr", "*.tr"))
) + sorted(glob.glob(os.path.join(REF_TEST_DIR, "json", "test*.json")))


def _run_both(program_or_ir, trailer, path):
    import trck_spark.fsm.interpreter as interp

    outs = []
    for disable in ("1", ""):
        os.environ["TRCK_SPARK_NO_CODEGEN"] = disable
        results = []
        for case in trailer.get("tests", []):
            window_text = sidecar(path, ".window.csv")
            exclude_text = sidecar(path, ".exclude.csv")
            params = case.get("params", trailer.get("params"))
            q = TrckQuery(
                program_or_ir,
                params=params,
                event_filter=case.get("filter"),
                window_set=parse_window_csv(window_text)
                if window_text
                else None,
                exclude=parse_exclude(exclude_text)
                if exclude_text
                else None,
                fn_registry=FIXTURE_FN_REGISTRY,
            )
            if disable:
                assert interp.get_matcher(q.compiled) is interp.run_machine
            else:
                m = interp.get_matcher(q.compiled)
                assert m is not interp.run_machine, (
                    "codegen fell back to the interpreter"
                )
            results.append(q.run_local(case["trails"]))
        outs.append(results)
    os.environ.pop("TRCK_SPARK_NO_CODEGEN", None)
    return outs


@pytest.mark.parametrize(
    "path", ALL_FIXTURES, ids=[os.path.basename(p) for p in ALL_FIXTURES]
)
def test_codegen_matches_interpreter(path):
    if os.path.basename(path) == "test_large_foreach.tr":
        pytest.skip("support files missing upstream")
    if path.endswith(".tr"):
        program, trailer = load_tr_fixture(path)
    else:
        program, trailer = load_json_fixture(path)
    if not trailer.get("tests"):
        pytest.skip("no embedded tests")
    interp_out, codegen_out = _run_both(program, trailer, path)
    assert json.dumps(interp_out, sort_keys=True) == json.dumps(
        codegen_out, sort_keys=True
    )
