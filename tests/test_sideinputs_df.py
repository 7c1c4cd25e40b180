"""DataFrame-typed side inputs (distributed window/exclude joins) must
produce byte-identical results to the driver-list form."""

from __future__ import annotations

from pyspark.sql import functions as F

from trck_spark.engine import TrckSparkEngine
from trck_spark.queries import PROG_COUNT_CLICKS, load_events

PROG_VIEWS = """
start ->
    receive
        event_type = "view" -> yield $views_in_window
        * -> repeat
"""


def _hex(u: str) -> str:
    return u.encode().ljust(16, b"\0").hex()


def test_exclude_df_matches_list(spark):
    ev = load_events(spark, "/root/testdata/sf0.001")
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="event_id")
    bad_df = (
        ev.filter(F.col("event_type") == "error").select("uuid").distinct()
    )
    bad_list = [_hex(r["uuid"]) for r in bad_df.collect()]
    assert bad_list, "fixture assumes some users errored"
    a = eng.run(ev, PROG_COUNT_CLICKS, exclude=bad_list, **kw).collect_json()
    b = eng.run(ev, PROG_COUNT_CLICKS, exclude=bad_df, **kw).collect_json()
    assert a == b


def test_window_df_matches_list(spark):
    ev = load_events(spark, "/root/testdata/sf0.001")
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="event_id")
    bounds = ev.groupBy("uuid").agg(
        F.min("timestamp").alias("lo"),
        F.floor(
            (F.min("timestamp") + F.max("timestamp")) / 2
        ).cast("long").alias("mid"),
    )
    entries = [
        (_hex(r["uuid"]), int(r["lo"]), int(r["mid"]), None)
        for r in bounds.collect()
    ]
    a = eng.run(ev, PROG_VIEWS, window_entries=entries, **kw).collect_json()
    b = eng.run(ev, PROG_VIEWS, window_entries=bounds, **kw).collect_json()
    assert a == b


def test_window_df_multi_entry_per_uuid(spark):
    """The same uuid on several window rows = independent evaluations,
    for the DataFrame form too (list-not-map semantics)."""
    from trck_spark.io import trails_json_to_df

    trails = [
        {
            "u1": [
                {"timestamp": 100, "event_type": "view"},
                {"timestamp": 200, "event_type": "view"},
                {"timestamp": 300, "event_type": "view"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="seq")
    entries = [
        (_hex("u1"), 100, 250, None),
        (_hex("u1"), 250, 400, None),
    ]
    w_df = spark.createDataFrame(
        [("u1", 100, 250), ("u1", 250, 400)], "uuid string, s long, e long"
    )
    a = eng.run(df, PROG_VIEWS, window_entries=entries, **kw).collect_json()
    b = eng.run(df, PROG_VIEWS, window_entries=w_df, **kw).collect_json()
    assert a == b == {"$views_in_window": 3}
