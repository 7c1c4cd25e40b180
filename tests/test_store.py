"""TrailStore: trail-clustered bucketed storage must round-trip data,
give Catalyst a trustworthy layout (no Exchange for uuid-keyed plans),
and feed the engine with assume_clustered semantics intact."""

from __future__ import annotations

import pytest

from trck_spark.engine import TrckSparkEngine
from trck_spark.queries import PROG_SESSIONS, load_events
from trck_spark.store import (
    is_trail_store,
    open_trail_store,
    read_manifest,
    write_trail_store,
)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "events_store")
    ev = load_events(spark, "/root/testdata/sf0.001").select(
        "uuid", "timestamp", "event_id", "event_type", "value"
    )
    df = write_trail_store(
        ev, path, uuid_col="uuid", ts_col="timestamp", seq_col="event_id",
        n_buckets=8,
    )
    return path, ev, df


def test_roundtrip_rows(spark, store):
    path, ev, df = store
    assert is_trail_store(path)
    assert df.count() == ev.count()
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, df.select(*ev.columns).collect()))
    assert a == b


def test_manifest(store):
    path, _, _ = store
    m = read_manifest(path)
    assert m["uuid_col"] == "uuid"
    assert m["n_buckets"] == 8


def test_groupby_uuid_elides_exchange(spark, store):
    path, ev, df = store
    from pyspark.sql import functions as F

    plan = (
        df.groupBy("uuid").agg(F.count("*"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    flat_plan = (
        ev.groupBy("uuid").agg(F.count("*"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in flat_plan  # sanity: bucketing is what removed it


def test_reopen_reregisters(spark, store):
    path, _, df = store
    from trck_spark.store import _table_name

    spark.sql(f"DROP TABLE IF EXISTS {_table_name(path)}")
    df2 = open_trail_store(spark, path)
    assert df2.count() == df.count()
    from pyspark.sql import functions as F

    plan = (
        df2.groupBy("uuid").agg(F.count("*"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_engine_over_store_matches_flat(spark, store):
    path, ev, df = store
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="event_id")
    flat = eng.run(ev, PROG_SESSIONS, **kw).collect_json()
    clustered = eng.run(
        df, PROG_SESSIONS, assume_clustered=True, **kw
    ).collect_json()
    assert flat == clustered


def test_manifest_ts_unique_and_dedup_skip(spark, store):
    """sf0.001 events have unique per-trail timestamps, so the store
    proves dedup is a no-op: sessions on the store must plan with ONE
    Window (the gap lag), no dedup window, no Exchange, no Sort — and
    clustering is assumed automatically (no assume_clustered needed)."""
    path, ev, df = store
    m = read_manifest(path)
    assert m["ts_unique"] is True
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="event_id")
    rs = eng.run(df, PROG_SESSIONS, **kw)
    plan = rs.agg_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan
    assert "Exchange" not in plan.split("HashAggregate")[0]
    assert rs.collect_json() == eng.run(ev, PROG_SESSIONS, **kw).collect_json()


def test_dup_timestamps_keep_dedup(spark, tmp_path):
    """A store containing same-(uuid, ts) rows must NOT set ts_unique,
    and results must still dedup exactly like the flat path."""
    from trck_spark.io import trails_json_to_df

    trails = [
        {
            "u1": [
                {"timestamp": 100, "event_type": "a"},
                {"timestamp": 100, "event_type": "a"},  # true duplicate
                {"timestamp": 5000, "event_type": "a"},
            ],
        }
    ]
    df = trails_json_to_df(spark, trails)
    path = str(tmp_path / "dup_store")
    sdf = write_trail_store(
        df, path, uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        n_buckets=2,
    )
    assert read_manifest(path)["ts_unique"] is False
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="seq")
    assert (
        eng.run(sdf, PROG_SESSIONS, **kw).collect_json()
        == eng.run(df, PROG_SESSIONS, **kw).collect_json()
        == {"$sessions": 2}
    )


def test_funnel_min_agg_on_store(spark, store):
    """Store input takes the filtered min-agg funnel form (the running-
    min window special case lost 6x at 160M events — see compile_funnel
    note): the plan must contain NO Window operator, and the result must
    equal the flat form's."""
    from trck_spark.queries import PROG_FUNNEL

    path, ev, df = store
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="event_id")
    rs_store = eng.run(df, PROG_FUNNEL, **kw)
    plan = rs_store.agg_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert rs_store.collect_json() == eng.run(
        ev, PROG_FUNNEL, **kw
    ).collect_json()
