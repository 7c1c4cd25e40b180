"""Distributed-path parity: run golden fixtures through the Spark engine.

The local path (tests/test_golden_fixtures.py) proves FSM semantics; this
suite proves the Spark orchestration — shuffle/sort trail assembly,
partition-level monoid accumulation, distributed aggregation, densified
output — produces identical results on a representative fixture subset.
"""

from __future__ import annotations

import os

import pytest

from tests.fixtures_util import (
    REF_TEST_DIR,
    compare_results,
    load_json_fixture,
    load_tr_fixture,
    sidecar,
)
from trck_spark.engine import TrckSparkEngine
from trck_spark.runner import cookie_to_bytes
from trck_spark.sideinputs import parse_exclude, parse_window_csv

# fixtures covering each operator family end-to-end (FFI needs a worker-side
# function registry — exercised via the local path only for now)
SPARK_FIXTURES = [
    "tr/test_multikey.tr",          # explicit foreach, counters
    "tr/test_multikey_set.tr",      # set-valued foreach vars
    "tr/test_timestamps.tr",        # timestamp relops with params
    "tr/test_merge_results.tr",     # merged results, tuple set yields
    "tr/test_set_result_tuple_window.tr",  # nested windows, start_timestamp
    "tr/test_hll_result.tr",        # HLL with exact hex goldens
    "tr/test_window_file.tr",       # per-uuid window entries
    "tr/test_window_file_with_id.tr",  # window entries with id rebinding
    "tr/test_exclude_file.tr",      # uuid anti-join
    "tr/test_filters.tr",           # CNF pre-scan filter (11 sub-cases)
    "tr/test_missing_field.tr",     # missing-field == "" + densification
    "tr/test_64bit_ts.tr",          # >32-bit timestamps
    "json/test_groupby.json",       # implicit foreach + negated clauses
    "json/test_fsm.json",           # windowed rule + stop
    "json/test_bounces_split.json", # trails split across source files
]


def _trails_to_df(spark, trails_dbs):
    rows = []
    for db_index, db in enumerate(trails_dbs):
        for cookie, events in db.items():
            uuid_hex = cookie_to_bytes(cookie).hex()
            for seq, e in enumerate(events):
                fields = {
                    k: str(v) for k, v in e.items() if k != "timestamp"
                }
                rows.append(
                    (uuid_hex, db_index, seq, int(e["timestamp"]), fields)
                )
    df = spark.createDataFrame(
        rows, "uuid string, db int, seq long, timestamp long, fields map<string,string>"
    )
    # explode the dynamic fields into real columns
    all_fields = sorted(
        {k for db in trails_dbs for evs in db.values() for e in evs for k in e if k != "timestamp"}
    )
    from pyspark.sql import functions as F

    for f in all_fields:
        df = df.withColumn(f, F.col("fields").getItem(f))
    return df.drop("fields")


@pytest.mark.parametrize("rel", SPARK_FIXTURES)
def test_spark_fixture(spark, rel):
    path = os.path.join(REF_TEST_DIR, rel)
    if rel.endswith(".tr"):
        program, trailer = load_tr_fixture(path)
    else:
        program, trailer = load_json_fixture(path)
    params_default = trailer.get("params")
    window_text = sidecar(path, ".window.csv")
    exclude_text = sidecar(path, ".exclude.csv")

    engine = TrckSparkEngine(spark)
    failures = []
    for i, case in enumerate(trailer["tests"]):
        df = _trails_to_df(spark, case["trails"])
        rs = engine.run(
            df,
            program,
            params=case.get("params", params_default),
            event_filter=case.get("filter"),
            window_entries=parse_window_csv(window_text)
            if window_text
            else None,
            exclude=sorted(parse_exclude(exclude_text))
            if exclude_text
            else None,
            uuid_col="uuid",
            ts_col="timestamp",
            seq_col="seq",
            db_col="db",
        )
        actual = rs.collect_json()
        for p in compare_results(case["expected"], actual):
            failures.append(f"case {i}: {p}")
    assert not failures, "\n".join(failures)
