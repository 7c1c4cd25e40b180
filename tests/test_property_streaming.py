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

from tests.fixtures_util import compare_results
from tests.test_property_engine import multi_db_trails
from tests.test_property_fsm import _run_text, random_programs
from tests.test_streaming import _rows_to_output, _stream_fixture

_dir_seq = itertools.count()


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
        spark, tmp_path / f"ex{next(_dir_seq)}", trails_dbs, text, params
    )
    actual = _rows_to_output(text, params, rows)
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"program:\n{text}", f"trails: {trails_dbs!r}", *problems]
    )
