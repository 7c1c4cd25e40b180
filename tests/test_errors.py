"""Runtime error surfacing: non-exhaustive clause matches are hard errors
with the rule name, like the reference matcher (fsm2c.py:640)."""

from __future__ import annotations

import pytest

from trck_spark.fsm.interpreter import FsmRuntimeError
from trck_spark.runner import run_program

NON_EXHAUSTIVE = """
mainrule ->
    receive
        type = "never" -> yield $x
"""


def test_non_exhaustive_is_hard_error():
    with pytest.raises(FsmRuntimeError, match="mainrule"):
        run_program(
            NON_EXHAUSTIVE,
            [{"abcd": [{"timestamp": 1, "type": "other"}]}],
        )


def test_outer_to_inner_transition_rejected():
    from trck_spark.dsl import compile_tr
    from trck_spark.ir import IRError, Program

    bad = """
foo ->
    receive
        type = "x" -> block1
        * -> repeat
parent ->
    window
        block1 ->
            receive
                * -> repeat
    after 30d -> foo
"""
    with pytest.raises(IRError, match="unrelated window blocks"):
        Program(compile_tr(bad))


def test_unknown_label_rejected():
    from trck_spark.dsl import ParseError, compile_tr

    with pytest.raises(ParseError, match="Label not found"):
        compile_tr(
            """
start ->
    receive
        type = "x" -> nowhere
        * -> repeat
"""
        )
