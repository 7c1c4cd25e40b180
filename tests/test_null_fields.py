"""Null field values read as "" everywhere (reference semantics for
absent values — src/ctx.c stores missing fields as the empty string),
while the ``__f_`` projection stays a bare nullable cast so literal
predicates push down to the parquet scan.

Every path must agree: compiled counter, compiled relational shapes,
implicit-foreach grid, and the FSM mapInPandas feed.
"""

from __future__ import annotations

import os

from trck_spark.engine import TrckSparkEngine

PROG_LIT = """
start ->
    receive
        event_type = "click" -> yield $clicks
        * -> repeat
"""

PROG_EMPTY_LIT = """
start ->
    receive
        event_type = "" -> yield $blank
        * -> repeat
"""

PROG_IMPLICIT = """
foreach %t
    start ->
        receive
            event_type = %t -> yield $n
            * -> repeat
"""

PROG_SESSIONS_NULLFIELD = """
start ->
    receive
        * -> yield $sessions, insession
insession ->
    receive
        * -> insession
    after 30m -> start
"""


def _null_df(spark):
    # one uuid; event_type is NULL on two rows, "click" on two, "" never
    # stored explicitly — null IS the empty string to the engine
    rows = [
        ("ab" * 16, 100, 0, "click"),
        ("ab" * 16, 200, 1, None),
        ("ab" * 16, 300, 2, "click"),
        ("ab" * 16, 400, 3, None),
        ("cd" * 16, 100, 0, None),
    ]
    return spark.createDataFrame(
        rows, "uuid string, timestamp long, seq long, event_type string"
    )


def _both(spark, df, prog, **kw):
    def run():
        rs = TrckSparkEngine(spark).run(
            df, prog, uuid_col="uuid", ts_col="timestamp", seq_col="seq",
            **kw,
        )
        return rs.collect_json()

    os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    fast = run()
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        slow = run()
    finally:
        os.environ.pop("TRCK_SPARK_NO_FASTPATH", None)
    return fast, slow


def test_literal_pred_ignores_nulls(spark):
    fast, slow = _both(spark, _null_df(spark), PROG_LIT)
    assert fast == slow == {"$clicks": 2}


def test_empty_literal_matches_null(spark):
    # "" must match BOTH a stored "" and a null (absent) value
    fast, slow = _both(spark, _null_df(spark), PROG_EMPTY_LIT)
    assert fast == slow == {"$blank": 3}


def test_implicit_foreach_null_is_empty_tuple(spark):
    # nulls land in the "" tuple of the implicit grid on every path
    fast, slow = _both(spark, _null_df(spark), PROG_IMPLICIT)
    assert fast == slow
    by_tuple = {r["%t"]: r["$n"] for r in fast}
    assert by_tuple["click"] == 2
    assert by_tuple[""] == 3


def test_sessions_dedup_with_null_fields(spark):
    # consecutive-duplicate identity treats null == "" (same ts, same
    # null field value -> collapses on both paths)
    rows = [
        ("ab" * 16, 100, 0, None),
        ("ab" * 16, 100, 1, None),  # dup of the previous -> skipped
        ("ab" * 16, 5000, 2, "x"),
    ]
    df = spark.createDataFrame(
        rows, "uuid string, timestamp long, seq long, event_type string"
    )
    fast, slow = _both(spark, df, PROG_SESSIONS_NULLFIELD)
    assert fast == slow == {"$sessions": 2}


PROG_FUNNEL = """
start ->
    receive
        event_type = "view" -> wait
        * -> repeat
wait ->
    receive
        event_type = "click" -> yield $conv, quit
        * -> repeat
    after 1h -> quit
"""


def test_funnel_literal_filters_push_to_parquet(spark, tmp_path):
    """The whole point of the nullable __f_ cast: the funnel's
    disjoint-literal stage filters must reach the parquet scan as
    pushed filters, not die at a coalesce() projection."""
    src = str(tmp_path / "ev.parquet")
    _null_df(spark).write.parquet(src)
    df = spark.read.parquet(src)
    rs = TrckSparkEngine(spark).run(
        df, PROG_FUNNEL, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq",
    )
    plan = rs.counters_df()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    flat = plan.replace(" ", "")
    assert "EqualTo(event_type,view)" in flat, plan
    assert "EqualTo(event_type,click)" in flat, plan


IR_NEGATED_YIELD = {
    "rules": [
        {
            "clauses": [
                {
                    "attrs": {"event_type": ["click"]},
                    "op": "not",
                    "action": "repeat",
                    "yield": [{"dst": "$notclick"}],
                },
                {"attrs": {}, "action": "repeat"},
            ]
        }
    ]
}


def test_negated_literal_over_nulls(spark):
    """NOT(field = "lit") on a null (absent) field must MATCH — absent
    reads as "" and "" != "lit" (reference semantics).  Pins the
    compiled path's null-safe literal equality: a bare `col == lit`
    yields SQL NULL for null fields, and ~NULL silently drops the row
    where the FSM yields."""
    fast, slow = _both(spark, _null_df(spark), IR_NEGATED_YIELD)
    assert fast == slow == {"$notclick": 3}


def test_store_code_predicates_match_flat(spark, tmp_path):
    """TrailStore dictionary-code predicates: literal equality compiles
    against the int __c_ column (planner.pred_codes_ctx) and must
    produce exactly the flat-path results — including null/"" conflation
    (code 0) and negation."""
    from trck_spark.store import write_trail_store

    df = _null_df(spark)
    store = write_trail_store(df, str(tmp_path / "codestore"))

    for prog in (PROG_LIT, PROG_EMPTY_LIT, IR_NEGATED_YIELD):
        flat_rs = TrckSparkEngine(spark).run(
            df, prog, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
        )
        store_rs = TrckSparkEngine(spark).run(
            store, prog, uuid_col="uuid", ts_col="timestamp",
            seq_col="seq",
        )
        assert flat_rs.collect_json() == store_rs.collect_json()

    # the plan's scan must read the int code column, not the string.
    # TRCK_SPARK_NO_ROLLUP pins the SCAN form: PROG_LIT is rollup-safe
    # and the loop above already value-checked the default (rollup)
    # answer against flat — on a null-containing store, code 0
    # conflation included
    import os

    os.environ["TRCK_SPARK_NO_ROLLUP"] = "1"
    try:
        plan = (
            TrckSparkEngine(spark)
            .run(store, PROG_LIT, uuid_col="uuid", ts_col="timestamp",
                 seq_col="seq")
            .counters_df()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        del os.environ["TRCK_SPARK_NO_ROLLUP"]
    assert "__c_event_type" in plan
    import re

    scan_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert scan_schemas and all(
        "event_type:string" not in s for s in scan_schemas
    ), scan_schemas
