"""FFI yields through the distributed engine (the .tr.c analog is a
Python function registry shipped to executors in the UDF closure)."""

from __future__ import annotations

from trck_spark.engine import TrckSparkEngine
from trck_spark.io import trails_json_to_df

PROG = """
start ->
    receive
        type = "cli" -> yield tag(domain) to #tagged, repeat
        * -> repeat
"""


def test_ffi_through_spark(spark):
    trails = [
        {
            "abcd": [
                {"timestamp": 1, "type": "cli", "domain": "x.com"},
                {"timestamp": 2, "type": "imp", "domain": "y.com"},
            ],
            "efgh": [{"timestamp": 3, "type": "cli", "domain": "z.com"}],
        }
    ]
    df = trails_json_to_df(spark, trails)
    engine = TrckSparkEngine(spark)
    rs = engine.run(
        df,
        PROG,
        uuid_col="uuid",
        ts_col="timestamp",
        seq_col="seq",
        db_col="db",
        fn_registry={"tag": lambda d: b"tag_" + d},
    )
    out = rs.collect_json()
    assert sorted(out["#tagged"]) == ["tag_x.com", "tag_z.com"]
