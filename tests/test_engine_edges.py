"""Engine edge cases: empty inputs, empty grids, absent fields."""

from __future__ import annotations

from trck_spark.engine import TrckSparkEngine
from trck_spark.io import trails_json_to_df

COUNT = """
start ->
    receive
        type = "cli" -> yield $n
        * -> repeat
"""


def test_empty_events(spark):
    df = trails_json_to_df(
        spark, [{"abcd": [{"timestamp": 1, "type": "x"}]}]
    ).filter("timestamp > 100")
    rs = TrckSparkEngine(spark).run(
        df, COUNT, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
    )
    assert rs.collect_json() == {"$n": 0}
    assert rs.counters_df().collect()[0]["n"] == 0


def test_empty_foreach_grid(spark):
    df = trails_json_to_df(
        spark, [{"abcd": [{"timestamp": 1, "type": "cli", "a": "x"}]}]
    )
    prog = """
foreach %v in @arr
    start ->
        receive
            a = %v -> yield $n
            * -> repeat
"""
    rs = TrckSparkEngine(spark).run(
        df, prog, params={"@arr": []}, uuid_col="uuid",
        ts_col="timestamp", seq_col="seq",
    )
    assert rs.collect_json() == []


def test_absent_field_reads_empty(spark):
    df = trails_json_to_df(
        spark, [{"abcd": [{"timestamp": 1, "type": "cli"}]}]
    )
    prog = """
start ->
    receive
        no_such_column = "" -> yield $missing
        * -> repeat
"""
    rs = TrckSparkEngine(spark).run(
        df, prog, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
    )
    assert rs.collect_json() == {"$missing": 1}
