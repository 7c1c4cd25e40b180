"""Streaming FSM execution: cross-batch state carry must reproduce the
batch engine's results when each micro-batch holds one source file of a
split-trail fixture (micro-batch == TrailDB analogy).
"""

from __future__ import annotations

import json
import os

import pytest

from tests.fixtures_util import REF_TEST_DIR, compare_results, load_json_fixture
from trck_spark.io import trails_json_to_df
from trck_spark.output import format_output
from trck_spark.fsm.interpreter import Results


def _stream_fixture(spark, tmp_path, trails_dbs, program, params):
    """Write one parquet file per source DB, stream them one per trigger
    through the stateful FSM, and collect the partial rows."""
    from trck_spark.streaming import aggregate_partials, streaming_partials

    src = tmp_path / "stream_src"
    src.mkdir(parents=True)
    all_fields = sorted(
        {
            k
            for db in trails_dbs
            for evs in db.values()
            for e in evs
            for k in e
            if k != "timestamp"
        }
    )
    # one file per DB, lexicographic file order == DB order; a final file
    # carries end-of-trail marker events (ts = 2^64-2) per uuid so pending
    # `after` edges fire, like the batch engine's finalization
    from trck_spark.runner import cookie_to_bytes
    from trck_spark.streaming import STREAM_END_TS as MAX_TIMESTAMP

    all_cookies = sorted(
        {cookie_to_bytes(c).hex() for db in trails_dbs for c in db}
    )
    schema = None
    for i, db in enumerate(trails_dbs):
        df = trails_json_to_df(spark, [db])
        for f in all_fields:
            if f not in df.columns:
                from pyspark.sql import functions as F

                df = df.withColumn(f, F.lit(None).cast("string"))
        df = df.select("uuid", "db", "seq", "timestamp", *all_fields)
        schema = df.schema
        df.coalesce(1).write.parquet(str(src / f"db{i:03d}.parquet"))
    end_rows = [
        (u, len(trails_dbs), 0, MAX_TIMESTAMP) + (None,) * len(all_fields)
        for u in all_cookies
    ]
    spark.createDataFrame(end_rows, schema).coalesce(1).write.parquet(
        str(src / "zzz_end.parquet")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*.parquet"))
    )
    parts = streaming_partials(
        stream,
        program,
        params=params,
        uuid_col="uuid",
        ts_col="timestamp",
        seq_col="seq",
    )
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = parts.writeStream.foreachBatch(sink).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)
    return collected


def _rows_to_output(program_ir, params, rows):
    from trck_spark.params import foreach_tuples
    from trck_spark.runner import TrckQuery

    q = TrckQuery(program_ir, params=params)
    tuples = foreach_tuples(q.program, params) if q.program.groupby else None
    per_tuple: dict[int, Results] = {}
    for r in rows:
        res = per_tuple.setdefault(int(r["tuple_id"]), Results())
        var = r["var"]
        if var in q.program.yield_counters:
            res.counters[var] = res.counters.get(var, 0) + int(r["n"])
        elif var in q.program.yield_sets + q.program.yield_multisets:
            key = bytes(r["key"])
            d = res.sets.setdefault(var, {})
            d[key] = d.get(key, 0) + int(r["n"])
        else:
            d = res.hlls.setdefault(var, {})
            reg = int(r["reg"])
            if d.get(reg, 0) < int(r["n"]):
                d[reg] = int(r["n"])
    return format_output(q.program, per_tuple, tuples)


@pytest.mark.parametrize(
    "fixture",
    ["test_groupby_split.json", "test_bounces_split.json",
     "test_stop_split.json"],
)
def test_streaming_split_fixtures(spark, tmp_path, fixture):
    """The reference's *_split fixtures verify cross-file state carry; here
    each file is a micro-batch, so they verify cross-BATCH state carry."""
    path = os.path.join(REF_TEST_DIR, "json", fixture)
    ir, trailer = load_json_fixture(path)
    params = trailer.get("params")
    failures = []
    for i, case in enumerate(trailer["tests"]):
        if len(case["trails"]) < 2:
            continue
        case_params = case.get("params", params)
        # implicit foreach needs explicit values on a stream
        prog_ir = {k: v for k, v in ir.items() if k != "tests"}
        from trck_spark.ir import Program

        p = Program(json.loads(json.dumps(prog_ir)))
        if p.implicit_foreach:
            field = p.var_fields.get(p.groupby_vars[0])
            values = sorted(
                {
                    str(e.get(field))
                    for db in case["trails"]
                    for evs in db.values()
                    for e in evs
                    if e.get(field)
                }
            )
            explicit = dict(case_params or {})
            explicit["@__stream"] = [[v] for v in ["", *values]]
            prog_ir = json.loads(json.dumps(prog_ir))
            prog_ir["groupby"]["values"] = "@__stream"
            case_params = explicit
        rows = _stream_fixture(
            spark, tmp_path / f"c{i}", case["trails"], prog_ir, case_params
        )
        actual = _rows_to_output(prog_ir, case_params, rows)
        if isinstance(case["expected"], list) and isinstance(actual, list):
            # drop the densified "" row the implicit grid adds
            actual = [
                r for r in actual
                if any(v for k, v in r.items() if k.startswith("%"))
                or any(
                    str(e.get("%", "")) == ""
                    for e in case["expected"]
                )
            ]
        for prob in compare_results(case["expected"], actual):
            failures.append(f"case {i}: {prob}")
    assert not failures, "\n".join(failures)
