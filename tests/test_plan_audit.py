"""Systematic physical-plan audit over EVERY registered query.

The per-operator plan tests pin specific shapes (bucketed-scan elision,
WindowGroupLimit, single-explode pipelines); this module enforces the
blanket invariants on the whole `queries()` registry at once:

1. No row-at-a-time Python UDF anywhere (`BatchEvalPython`): Python is
   allowed only as Arrow-batched pandas stages (mapInPandas /
   FlatMapGroupsInPandas — the FSM and multimodal paths).
2. No cartesian product without an explicit broadcast bound: a
   `CartesianProduct` node means a cross join fell off the broadcast
   path, which is O(n^2) shuffle at scale.  (BroadcastNestedLoopJoin
   over a broadcast side is fine — that's the deliberate
   small-side-cross-join pattern.)
3. Every documents/embeddings/events parquet scan prunes columns: a
   scan whose ReadSchema carries the full table width for a narrow
   query means projection pushdown broke.

Plans are inspected unexecuted (initial adaptive plan): node TYPES are
stable pre-execution even though AQE may later rewrite exchanges.
"""

from __future__ import annotations

import os
import re

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()

# full column sets of the wide tables; a scan reading ALL of them is
# only legitimate for queries that genuinely consume every column
_FULL_WIDTH = {
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in sorted(_QUERIES.items()):
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
        from trck_spark.pipeline.dedup import release

        release(df)
    return out


def test_no_row_python_udf(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF in: {bad}"


def test_no_unbounded_cartesian(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"non-broadcast cartesian product in: {bad}"


def _read_schemas(plan: str, table: str):
    """ReadSchema column sets for scans of `<table>.parquet`."""
    out = []
    for scan in re.finditer(
        r"FileScan parquet \[[^\]]*\][^\n]*" + re.escape(f"{table}.parquet")
        + r"[^\n]*ReadSchema: struct<([^>]*)>",
        plan,
    ):
        cols = {
            c.split(":")[0].strip()
            for c in scan.group(1).split(",")
            if c.strip()
        }
        out.append(cols)
    # plans rendered with Location before ReadSchema (common) — fall
    # back to scanning line-wise
    if not out:
        for line in plan.splitlines():
            if f"{table}.parquet" in line and "ReadSchema: struct<" in line:
                inner = line.split("ReadSchema: struct<", 1)[1]
                inner = inner.split(">", 1)[0]
                cols = {
                    c.split(":")[0].strip()
                    for c in inner.split(",")
                    if c.strip()
                }
                out.append(cols)
    return out


# queries that legitimately consume (almost) the whole documents row
_WIDE_OK = {
    "quota_sample",      # doc_id, source + rank hash
    "mixture_sample",    # doc_id, source
    "dedup_apply",       # doc_id, source, n_chars + text for pairs
    "incremental_dedup", # doc_id, source, text
}


def test_documents_scans_prune_columns(plans):
    full = _FULL_WIDTH["documents"]
    bad = []
    for name, plan in plans.items():
        for cols in _read_schemas(plan, "documents"):
            if cols >= full and name not in _WIDE_OK:
                bad.append((name, sorted(cols)))
    assert not bad, f"unpruned documents scans: {bad}"


def test_events_scans_prune_columns(plans):
    full = _FULL_WIDTH["events"]
    bad = []
    for name, plan in plans.items():
        for cols in _read_schemas(plan, "events"):
            if cols >= full:
                bad.append((name, sorted(cols)))
    assert not bad, f"unpruned events scans: {bad}"
