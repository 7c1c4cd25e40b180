"""Property-based differential across execution paths: random programs
and random trails through the FULL Spark engine — which auto-dispatches
to the Catalyst-compiled forms (counter/funnel/sessions/bounce/
attribution recognizers) or the distributed Arrow FSM path — must match
the pure-Python local runner, itself differentially validated against
the codegen path and the golden corpus (test_property_fsm.py,
test_golden_fixtures.py).  This closes the execution triangle
interpreter == codegen == Spark plan on the program space, not just the
fixed fixtures, and draws trails SPLIT across two source dbs to
exercise cross-db carried state through the shuffle/sort assembly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.fixtures_util import compare_results
from tests.test_engine_spark import _trails_to_df
from tests.test_property_fsm import (
    FFI_REGISTRY,
    _run_text,
    events_strategy,
    random_programs,
    ts_base_strategy,
)


def _events(deltas, base=0):
    ts = base
    events = []
    for delta, t, u in deltas:
        ts += delta
        e = {"timestamp": ts, "ts": str(ts)}
        if t:
            e["t"] = t
        if u:
            e["u"] = u
        events.append(e)
    return events


@st.composite
def multi_db_trails(draw):
    """1-3 trails, each optionally split across two source dbs at a
    drawn cut point (order preserved) — the multi-DB carried-state
    shape.  Zero-event trails are never emitted: they have no row
    representation, so neither side would see them."""
    n = draw(st.integers(min_value=1, max_value=3))
    # one 64-bit base per example (weighted toward 0 — see
    # test_property_fsm.TS_BASES): trails share it so cross-trail
    # side-input windows stay meaningful on the small-base draws
    base = draw(ts_base_strategy)
    dbs: list[dict] = [{}, {}]
    for i in range(n):
        deltas = draw(events_strategy)
        events = _events(deltas, base)
        if not events:
            continue
        cookie = f"{i:04x}"
        if draw(st.booleans()):
            cut = draw(st.integers(min_value=0, max_value=len(events)))
            if events[:cut]:
                dbs[0][cookie] = events[:cut]
            if events[cut:]:
                dbs[1][cookie] = events[cut:]
        else:
            dbs[0][cookie] = events
    out = [db for db in dbs if db]
    if not out:
        out = [{"0000": _events([(1, "a", "x")])}]
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(trails_dbs=multi_db_trails(), prog=random_programs())
def test_spark_engine_equals_local_on_random_programs(
    spark, trails_dbs, prog
):
    from trck_spark.engine import TrckSparkEngine

    text, params = prog
    expected = _run_text(text, params, trails_dbs, no_codegen=False)
    df = _trails_to_df(spark, trails_dbs)
    rs = TrckSparkEngine(spark).run(
        df,
        text,
        params=params,
        uuid_col="uuid",
        ts_col="timestamp",
        seq_col="seq",
        db_col="db",
        fn_registry=FFI_REGISTRY,
        dedup_cols="all",
    )
    actual = rs.collect_json()
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"program:\n{text}", f"trails: {trails_dbs!r}", *problems]
    )


# --- random programs over a FIXED TrailStore ------------------------
#
# The store-only dispatch tiers (dictionary-code aggregation, manifest
# rollups — engine.run's code_field / rollup blocks) never see the
# flat-DataFrame fuzz above.  One ts-unique store, written once per
# session, run under every drawn program: rollup-safe draws answer from
# the manifest, code-eligible draws take the dict-code scan, the rest
# fall through to compiled/FSM forms — all must equal the local runner.

_STORE_TRAILS = [{
    f"{i:04x}": [
        {
            "timestamp": 50 * i + 7 * j,  # strictly increasing per trail
            "ts": str(50 * i + 7 * j),
            "t": ["a", "b", "c", "z"][(i + j) % 4],
            "u": ["x", "y", "x\x00"][(2 * i + j) % 3],
        }
        for j in range(10)
    ]
    for i in range(4)
}]


@pytest.fixture(scope="module")
def trail_store(spark, tmp_path_factory):
    from trck_spark.store import write_trail_store

    df = _trails_to_df(spark, _STORE_TRAILS).drop("db")
    store = write_trail_store(
        df, str(tmp_path_factory.mktemp("fuzz_store") / "st")
    )
    assert store._trailstore_manifest["ts_unique"] is True
    assert "t" in store._trailstore_manifest["rollups"]
    return store


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(prog=random_programs())
def test_store_dispatch_equals_local_on_random_programs(
    spark, trail_store, prog
):
    from trck_spark.engine import TrckSparkEngine

    text, params = prog
    expected = _run_text(text, params, _STORE_TRAILS, no_codegen=False)
    actual = TrckSparkEngine(spark).run(
        trail_store, text, params=params,
        uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        fn_registry=FFI_REGISTRY, dedup_cols="all",
    ).collect_json()
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"program:\n{text}", *problems]
    )


# --- random programs over SEGMENTED TrailStores ----------------------
#
# VERDICT r07 item 3: the segmented open path (merged union manifest,
# remapped dictionary codes, per-segment dedup scoping, cross-segment
# carried FSM state) gets its own differential leg.  Segment splits of
# the same trail corpus are precomputed as module fixtures (store writes
# are seconds each; hypothesis draws WHICH split plus the program), and
# include a boundary-straddling duplicate (must survive — per-file
# reference semantics, and the merged rollup must count it twice) and an
# internal-duplicate segment (ts_unique False -> rollup tier off, scan
# and FSM paths must still dedup inside that segment only).

def _split_corpus(trails, n_segs, salt, boundary_dup=False,
                  internal_dup=False):
    """Deterministic varied per-trail cut points -> ordered db list."""
    dbs: list[dict] = [{} for _ in range(n_segs)]
    for idx, cookie in enumerate(sorted(trails[0])):
        events = trails[0][cookie]
        cuts = sorted(
            ((idx * 7 + salt * 13 + k * 5) % (len(events) + 1))
            for k in range(n_segs - 1)
        )
        bounds = [0] + cuts + [len(events)]
        for s in range(n_segs):
            chunk = [dict(e) for e in events[bounds[s]:bounds[s + 1]]]
            if chunk:
                dbs[s][cookie] = chunk
    if boundary_dup:
        # copy the last event of the first non-empty segment of trail 0
        # as the FIRST event of the next segment: a cross-file duplicate
        # the reference does NOT skip
        cookie = sorted(trails[0])[0]
        src = next(s for s in range(n_segs) if cookie in dbs[s])
        dup = dict(dbs[src][cookie][-1])
        nxt = src + 1
        if nxt < n_segs:
            dbs[nxt].setdefault(cookie, [])
            dbs[nxt][cookie] = [dup] + dbs[nxt][cookie]
    if internal_dup:
        # true in-segment duplicate (same ts, same fields): dedup skips
        # it inside its segment; ts_unique flips off for the whole store
        cookie = sorted(trails[0])[-1]
        seg = next(s for s in range(n_segs) if cookie in dbs[s])
        dbs[seg][cookie] = (
            dbs[seg][cookie][:1] + [dict(dbs[seg][cookie][0])]
            + dbs[seg][cookie][1:]
        )
    return [db for db in dbs if db]


_SEG_SPLITS = {
    "two_plain": dict(n_segs=2, salt=0),
    "three_plain": dict(n_segs=3, salt=1),
    "boundary_dup": dict(n_segs=2, salt=2, boundary_dup=True),
    "internal_dup": dict(n_segs=3, salt=3, internal_dup=True),
}


@pytest.fixture(scope="module")
def segmented_stores(spark, tmp_path_factory):
    from trck_spark.store import append_trail_store

    root = tmp_path_factory.mktemp("fuzz_seg_stores")
    out = {}
    for name, kw in _SEG_SPLITS.items():
        dbs = _split_corpus(_STORE_TRAILS, **kw)
        path = str(root / name)
        store = None
        for db in dbs:
            df = _trails_to_df(spark, [db]).drop("db")
            store = append_trail_store(df, path, seq_col="seq")
        m = store._trailstore_manifest
        assert m.get("segments"), name  # really multi-part
        assert m["ts_unique"] is (name != "internal_dup"), name
        out[name] = (dbs, store, path)
    return out


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    split=st.sampled_from(sorted(_SEG_SPLITS)),
    prog=random_programs(),
)
def test_segmented_store_equals_local_on_random_programs(
    spark, segmented_stores, split, prog
):
    from trck_spark.engine import TrckSparkEngine

    text, params = prog
    dbs, store, _path = segmented_stores[split]
    expected = _run_text(text, params, dbs, no_codegen=False)
    actual = TrckSparkEngine(spark).run(
        store, text, params=params,
        uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        fn_registry=FFI_REGISTRY, dedup_cols="all",
    ).collect_json()
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"split: {split}", f"program:\n{text}", *problems]
    )


@pytest.fixture(scope="module")
def compacted_stores(spark, segmented_stores, tmp_path_factory):
    """Each segmented fuzz store rewritten by compact_trail_store: the
    persisted __db0 segment index must replay event order and per-
    segment dedup scoping byte-identically (VERDICT r07 item 6)."""
    from trck_spark.store import compact_trail_store

    root = tmp_path_factory.mktemp("fuzz_compacted")
    out = {}
    for name, (dbs, _store, path) in segmented_stores.items():
        comp = compact_trail_store(spark, path, str(root / name))
        out[name] = (dbs, comp)
    return out


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    split=st.sampled_from(sorted(_SEG_SPLITS)),
    prog=random_programs(),
)
def test_compacted_store_equals_local_on_random_programs(
    spark, compacted_stores, split, prog
):
    from trck_spark.engine import TrckSparkEngine

    text, params = prog
    dbs, comp = compacted_stores[split]
    expected = _run_text(text, params, dbs, no_codegen=False)
    actual = TrckSparkEngine(spark).run(
        comp, text, params=params,
        uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        fn_registry=FFI_REGISTRY, dedup_cols="all",
    ).collect_json()
    problems = compare_results(expected, actual)
    assert not problems, "\n".join(
        [f"split: {split} (compacted)", f"program:\n{text}", *problems]
    )
