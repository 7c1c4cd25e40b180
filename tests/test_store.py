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


# ---------------------------------------------------------------- dicts
#
# Per-field dictionary encoding (store.py `dicts`): the Spark analog of
# TrailDB's lexicons (reference src/db.c:62-113).  Codes must round-trip
# through the manifest, cover ""/null as code 0, skip high-cardinality
# fields, and upgrade the implicit-foreach counter plan to the
# code-keyed form (scan reads ONLY the int column) with unchanged
# results vs the flat path.

B1_DICT_PROG = """
foreach %a
    start ->
        receive
            aeid = %a -> yield $r
            * -> repeat
"""

MIXED_DICT_PROG = """
foreach %a
    start ->
        receive
            etype = "click", aeid = %a -> yield $clicks
            aeid = %a -> yield $any
            * -> repeat
"""


@pytest.fixture(scope="module")
def dict_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "dict_store")
    rows = []
    for i in range(60):
        for j in range(12):
            rows.append(
                (
                    f"u{i}",
                    1000 + j * 10,
                    j,
                    # one null and one "" to pin the code-0 binding
                    None
                    if (i == 5 and j == 3)
                    else ("" if (i == 6 and j == 4) else str((i + j) % 7)),
                    "click" if j % 3 == 0 else "view",
                    f"hi-card-{i}-{j}",  # unique per row: must NOT dict
                )
            )
    df = spark.createDataFrame(
        rows,
        "uuid string, timestamp long, seq long, aeid string, "
        "etype string, blob string",
    )
    store = write_trail_store(
        df, path, uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        n_buckets=4, dict_max=64,
    )
    return path, df, store


def test_dict_manifest_and_codes(spark, dict_store):
    path, df, store = dict_store
    m = read_manifest(path)
    assert set(m["dicts"]) == {"aeid", "etype"}
    assert m["dicts"]["aeid"] == sorted(str(v) for v in range(7))
    assert "blob" not in m["dicts"]  # over dict_max -> stays plain
    # code columns present, 0 <-> ""/null, i+1 <-> lexicon order
    from pyspark.sql import functions as F

    lex = m["dicts"]["aeid"]
    bad = store.filter(
        ~(
            F.coalesce(F.col("aeid"), F.lit(""))
            == F.when(F.col("__c_aeid") == 0, F.lit("")).otherwise(
                F.element_at(F.lit(lex), F.col("__c_aeid"))
            )
        )
    ).count()
    assert bad == 0


def test_dict_reopen_preserves_codes(spark, dict_store):
    path, _, store = dict_store
    from trck_spark.store import _table_name

    spark.sql(f"DROP TABLE IF EXISTS {_table_name(path)}")
    df2 = open_trail_store(spark, path)
    assert "__c_aeid" in df2.columns
    assert df2._trailstore_manifest["dicts"]["etype"] == ["click", "view"]


def test_dict_code_plan_prunes_string_column(spark, dict_store):
    """The code-keyed B1 plan must read ONLY the int code column —
    string hash-agg replaced by dictionary-id agg, the scan never
    touching the (wider) string bytes.  TRCK_SPARK_NO_ROLLUP pins the
    SCAN form: with the manifest rollup eligible, the engine would
    otherwise answer without any scan at all (tests/test_rollup.py
    covers that tier)."""
    import os

    path, df, store = dict_store
    eng = TrckSparkEngine(spark)
    os.environ["TRCK_SPARK_NO_ROLLUP"] = "1"
    try:
        frame = eng.run(
            store, B1_DICT_PROG, uuid_col="uuid", ts_col="timestamp",
            seq_col="seq",
        ).counters_df()
    finally:
        del os.environ["TRCK_SPARK_NO_ROLLUP"]
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "__c_aeid" in plan
    scan_schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert scan_schema and all(
        "__c_aeid" in ln and "aeid:string" not in ln for ln in scan_schema
    ), plan


def test_dict_b1_matches_flat(spark, dict_store):
    path, df, store = dict_store
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="seq")
    flat = sorted(
        map(tuple, eng.run(df, B1_DICT_PROG, **kw).counters_df().collect())
    )
    code = sorted(
        map(tuple, eng.run(store, B1_DICT_PROG, **kw).counters_df().collect())
    )
    assert flat == code
    # the ""-code-0 group exists and absorbed the null + "" events
    empty = [r for r in code if r[0] == ""]
    assert empty == [("", 2)]


def test_dict_mixed_clauses_match_flat(spark, dict_store):
    """Literal conditions on OTHER dict fields keep their string
    predicates; results identical to the flat path."""
    path, df, store = dict_store
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="seq")
    flat = sorted(
        map(tuple, eng.run(df, MIXED_DICT_PROG, **kw).counters_df().collect())
    )
    code = sorted(
        map(
            tuple,
            eng.run(store, MIXED_DICT_PROG, **kw).counters_df().collect(),
        )
    )
    assert flat == code


def test_dict_filter_falls_back_to_grid(spark, dict_store):
    """A CNF --filter forces the grid form (post-filter lexicon must
    still densify dropped values) — the code path must disengage and
    results must match the flat path under the same filter."""
    path, df, store = dict_store
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="seq")
    filt = {
        "clauses": [[{"field": "etype", "value": "click", "op": "equal"}]]
    }
    flat = sorted(
        map(
            tuple,
            eng.run(df, B1_DICT_PROG, event_filter=filt, **kw)
            .counters_df()
            .collect(),
        )
    )
    code = sorted(
        map(
            tuple,
            eng.run(store, B1_DICT_PROG, event_filter=filt, **kw)
            .counters_df()
            .collect(),
        )
    )
    assert flat == code


def test_dict_fields_opt_out(spark, tmp_path):
    df = spark.range(20).selectExpr(
        "concat('u', id % 4) AS uuid",
        "1000 + id AS timestamp",
        "id AS seq",
        "cast(id % 3 AS string) AS aeid",
    )
    path = str(tmp_path / "nodict_store")
    write_trail_store(
        df, path, uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        n_buckets=2, dict_fields=None,
    )
    m = read_manifest(path)
    assert m["dicts"] == {}


def test_append_trail_store_segments(spark, tmp_path):
    """append_trail_store: segments are the reference's one-tdb-per-
    period workflow — a trail continues across segments with carried
    FSM state, the consecutive-duplicate skip stays scoped per segment
    (a dup straddling the segment boundary SURVIVES, per-file reference
    semantics), and the whole store equals the local runner on the same
    dbs."""
    from trck_spark.runner import run_program
    from trck_spark.store import append_trail_store, read_manifest

    schema = "uuid string, timestamp long, seq long, event_type string"
    base = spark.createDataFrame(
        [("u1", 100, 0, "view"), ("u1", 200, 1, "click")], schema
    )
    seg1 = spark.createDataFrame(
        # first event duplicates base's last (ts AND fields): per-segment
        # dedup keeps it; u2 appears only in the segment
        [("u1", 200, 0, "click"), ("u1", 300, 1, "click"),
         ("u2", 150, 0, "click")], schema
    )
    path = str(tmp_path / "segstore")
    append_trail_store(base, path, seq_col="seq")   # fresh -> plain write
    store = append_trail_store(seg1, path)
    assert read_manifest(path)["segments"] == ["segment_0000"]
    assert "__segment" in store.columns

    prog = """
start ->
    receive
        event_type = "click" -> yield $clicks, repeat
        * -> repeat
"""
    got = TrckSparkEngine(spark).run(
        store, prog, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq", db_col="__segment",
    ).collect_json()
    expected = run_program(prog, [
        {"u1": [{"timestamp": 100, "event_type": "view"},
                {"timestamp": 200, "event_type": "click"}]},
        {"u1": [{"timestamp": 200, "event_type": "click"},
                {"timestamp": 300, "event_type": "click"}],
         "u2": [{"timestamp": 150, "event_type": "click"}]},
    ])
    # boundary dup survives (cross-file semantics): base 1 + segment
    # u1's 2 (the dup AND click@300) + u2's 1; cross-segment dedup
    # would have merged the dup and given 3
    assert got == expected == {"$clicks": 4}

    # a second append keeps order; a funnel arms in the base and
    # converts in segment 2 (cross-segment carried state)
    seg2 = spark.createDataFrame([("u3", 500, 0, "view")], schema)
    store = append_trail_store(seg2, path)
    assert read_manifest(path)["segments"] == [
        "segment_0000", "segment_0001"
    ]
    funnel = """
start ->
    receive
        event_type = "view" -> wait
        * -> repeat
wait ->
    receive
        event_type = "click" -> yield $conv, quit
        * -> repeat
"""
    got2 = TrckSparkEngine(spark).run(
        store, funnel, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq", db_col="__segment",
    ).collect_json()
    # u1: view@100 (base) -> click@200 (segment 1) converts across the
    # segment boundary; u3's view never converts
    assert got2 == {"$conv": 1}


def test_compact_trail_store(spark, tmp_path):
    """compact_trail_store rewrites base+segments into one fresh store:
    query results byte-identical (the __db0 index preserves segment-
    major order and per-segment dedup scoping — the boundary dup still
    survives) and the zero-scan rollup tier is RESTORED."""
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.store import (
        append_trail_store,
        compact_trail_store,
        open_trail_store,
    )

    schema = "uuid string, timestamp long, seq long, event_type string"
    path = str(tmp_path / "segsrc")
    append_trail_store(
        spark.createDataFrame(
            [("u1", 100, 0, "view"), ("u1", 200, 1, "click")], schema
        ),
        path, seq_col="seq",
    )
    append_trail_store(
        spark.createDataFrame(
            # first event duplicates base's last across the boundary
            [("u1", 200, 0, "click"), ("u1", 300, 1, "click"),
             ("u2", 150, 0, "click")], schema,
        ),
        path,
    )
    append_trail_store(
        spark.createDataFrame([("u3", 500, 0, "view")], schema), path
    )

    dest = str(tmp_path / "compacted")
    comp = compact_trail_store(spark, path, dest)
    m = read_manifest(dest)
    assert m["db_col"] == "__db0"
    assert m["ts_unique"] is True  # per (uuid, db): the dup is cross-db
    assert "segments" not in m

    prog = (
        'start ->\n    receive\n        event_type = "click" -> '
        "yield $clicks, repeat\n        * -> repeat\n"
    )
    eng = TrckSparkEngine(spark)
    kw = dict(uuid_col="uuid", ts_col="timestamp", seq_col="seq")
    seg = open_trail_store(spark, path)
    got_seg = eng.run(seg, prog, **kw).collect_json()
    got_comp = eng.run(comp, prog, **kw).collect_json()
    # boundary dup survives both forms: 4 clicks, not 3
    assert got_seg == got_comp == {"$clicks": 4}

    # zero-scan rollup tier restored on the compacted store
    counter = (
        "foreach %v\n    start ->\n        receive\n"
        "            event_type = %v -> yield $n, repeat\n"
        "            * -> repeat\n"
    )
    rs = eng.run(comp, counter, **kw)
    out = {r["%v"]: r["$n"] for r in rs.collect_json()}
    assert out == {"": 0, "click": 4, "view": 2}
    assert rs.counters_df().inputFiles() == []  # no scan at all

    # CLI --compact drives the same path
    import json as _json
    import subprocess
    import sys as _sys

    dest2 = str(tmp_path / "compacted_cli")
    res = subprocess.run(
        [_sys.executable, "-m", "trck_spark.store", path, dest2,
         "--compact"],
        cwd="/root/repo", capture_output=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    m2 = _json.loads(res.stdout.decode().strip().splitlines()[-1])
    assert m2["db_col"] == "__db0" and m2["ts_unique"] is True


def test_append_to_compacted_store_keeps_db_order(spark, tmp_path):
    """Compact -> keep appending -> (re)compact: the compacted base's
    internal DB index must stay the FIRST DBs (composite __segment =
    base db0 values, then base_max + segment index), so order-sensitive
    programs and per-DB dedup replay exactly; re-compaction folds the
    composite back into one __db0."""
    from trck_spark.engine import TrckSparkEngine
    from trck_spark.runner import run_program
    from trck_spark.store import (
        append_trail_store,
        compact_trail_store,
        open_trail_store,
    )

    schema = "uuid string, timestamp long, seq long, event_type string"
    src = str(tmp_path / "src")
    # two original segments with OVERLAPPING time ranges (db order is
    # NOT ts order, so collapsing dbs would reorder events)
    db0 = [("u1", 100, 0, "view"), ("u1", 300, 1, "click")]
    db1 = [("u1", 200, 0, "click")]
    db2 = [("u1", 150, 0, "click")]  # appended after compaction
    append_trail_store(spark.createDataFrame(db0, schema), src,
                       seq_col="seq")
    append_trail_store(spark.createDataFrame(db1, schema), src)
    comp = str(tmp_path / "comp")
    compact_trail_store(spark, src, comp)
    store = append_trail_store(spark.createDataFrame(db2, schema), comp)
    # composite db order: base db0=0, base db0=1, then appended segment
    segs = sorted(
        r["__segment"] for r in store.select("__segment").distinct().collect()
    )
    assert segs == [0, 1, 2]

    # first-click-then-quit is order-sensitive across dbs
    prog = (
        "start ->\n    receive\n"
        '        event_type = "click" -> yield $first, quit\n'
        "        * -> repeat\n"
    )
    def _dbs_to_trails(*dbs):
        return [
            {u: [{"timestamp": t, "event_type": e} for (uu, t, s, e) in db
                 if uu == u] for u in {r[0] for r in db}}
            for db in dbs
        ]
    expected = run_program(prog, _dbs_to_trails(db0, db1, db2))
    eng = TrckSparkEngine(spark)
    got = eng.run(
        store, prog, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
    ).collect_json()
    assert got == expected == {"$first": 1}

    # re-compact the appended store; same results, single store again
    comp2 = str(tmp_path / "comp2")
    comp2_df = compact_trail_store(spark, comp, comp2)
    assert "segments" not in read_manifest(comp2)
    got2 = eng.run(
        comp2_df, prog, uuid_col="uuid", ts_col="timestamp",
        seq_col="seq",
    ).collect_json()
    assert got2 == expected

    # counter results also agree with the flat multi-db view
    counter = (
        "foreach %v\n    start ->\n        receive\n"
        "            event_type = %v -> yield $n, repeat\n"
        "            * -> repeat\n"
    )
    a = eng.run(store, counter, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq").collect_json()
    b = eng.run(comp2_df, counter, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq").collect_json()
    assert a == b
    assert {r["%v"]: r["$n"] for r in b} == {
        "": 0, "click": 3, "view": 1
    }


def test_compaction_advisory(spark, tmp_path, monkeypatch):
    """VERDICT r08 item 6: a long segment chain or a remap-budget trip
    emits a structured CompactionAdvisory from open_trail_store —
    advisory only (results stay correct), with the motivating facts as
    attributes."""
    import warnings

    import trck_spark.store as store_mod
    from trck_spark.store import (
        CompactionAdvisory,
        append_trail_store,
        open_trail_store,
    )

    schema = "uuid string, timestamp long, seq long, t string"
    path = str(tmp_path / "advise")
    for i in range(3):
        append_trail_store(
            spark.createDataFrame(
                [(f"u{i}", 100 + i, 0, "a")], schema
            ),
            path, seq_col="seq",
        )
    # 3 parts <= default threshold: NO advisory
    with warnings.catch_warnings():
        warnings.simplefilter("error", CompactionAdvisory)
        open_trail_store(spark, path)
    # env-lowered threshold trips it, with structured attributes
    monkeypatch.setenv("TRCK_SPARK_COMPACT_ADVISE_SEGMENTS", "2")
    with pytest.warns(CompactionAdvisory) as rec:
        open_trail_store(spark, path)
    w = rec[0].message
    assert w.path == path and w.n_segments == 3
    assert w.dropped_fields == []
    assert "--compact" in str(w)
    monkeypatch.delenv("TRCK_SPARK_COMPACT_ADVISE_SEGMENTS")

    # remap-budget trip advises too, naming the dropped fields
    monkeypatch.setattr(store_mod, "REMAP_LITERAL_MAX", 2)
    path2 = str(tmp_path / "advise2")
    append_trail_store(
        spark.createDataFrame([("u1", 100, 0, "a")], schema),
        path2, seq_col="seq",
    )
    append_trail_store(
        spark.createDataFrame([("u2", 200, 0, "b")], schema), path2
    )
    with pytest.warns(CompactionAdvisory) as rec2:
        open_trail_store(spark, path2)
    w2 = rec2[0].message
    assert w2.dropped_fields == ["t"] and w2.n_segments == 2
