#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads mirror BASELINE.md: B1 implicit-foreach count (perftest1 shape),
B2 windowed funnel (FSM path), B3 trail throughput, plus the relational
and pipeline headliners.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --------------------------------------------------------- baseline gate
#
# BASELINE.md B1/B2: run the perftest1-shaped workload (reference
# test/perf/perftest1_db.py:9-12) with the DuckDB oracle wallclock
# measured side-by-side, and report spark_s / oracle_s / ratio per
# headline query.  Results are also value-compared ("match") so the
# timing claim carries its own correctness evidence.
#
# GATE SIZE: round 2 measured at 20M events and found the ratios
# dominated by Spark's fixed per-query floor (scheduler + py4j +
# codegen ~0.5-0.9s) against 35-800ms DuckDB wallclocks — overhead,
# not throughput.  The round-2 verdict's ask: grow the workload until
# the oracle itself works for seconds, so "within 2x" measures
# streaming throughput.  Default 160M events (800k trails x 200);
# override with SPARK_GRAFT_GATE_EVENTS.  Datasets are generated once
# and cached under .bench_cache/ across rounds.

GATE_EVENTS = int(os.environ.get("SPARK_GRAFT_GATE_EVENTS", 160_000_000))
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_cache"
)


def _perf_paths(n_events: int) -> tuple[str, str]:
    tag = f"perf{n_events // 1_000_000}m"
    return (
        os.path.join(_CACHE_DIR, f"{tag}.parquet"),
        os.path.join(_CACHE_DIR, f"{tag}_store"),
    )

B1_PROG = """
foreach %aeid
    start ->
        receive
            advertisable_eid = %aeid -> yield $r
            * -> repeat
"""

BASELINE_DEFS = {
    # name -> (trck program import name, duckdb oracle over view `perf`)
    "b1_count_foreach": (
        B1_PROG,
        "SELECT '' AS aeid, 0::BIGINT AS r UNION ALL "
        "SELECT advertisable_eid AS aeid, count(*)::BIGINT AS r "
        "FROM perf GROUP BY advertisable_eid",
    ),
    "b2_funnel": (
        "PROG_FUNNEL",
        """
WITH v AS (SELECT uuid, min(timestamp) AS vt FROM perf
           WHERE event_type='view' GROUP BY 1),
fc AS (SELECT e.uuid, min(e.timestamp) AS ct FROM perf e
       JOIN v USING(uuid)
       WHERE e.event_type='click' AND e.timestamp > v.vt GROUP BY 1)
SELECT count(*)::BIGINT AS conv FROM fc JOIN v USING(uuid)
WHERE ct < vt + 3600
""",
    ),
    "sessions": (
        "PROG_SESSIONS",
        """
WITH e AS (SELECT uuid, timestamp AS t,
                  lag(timestamp) OVER
                    (PARTITION BY uuid ORDER BY timestamp, seq) AS pt
           FROM perf)
SELECT count(*)::BIGINT AS sessions FROM e
WHERE pt IS NULL OR t >= pt + 1800
""",
    ),
    "attribution": (
        "PROG_ATTRIBUTION",
        """
WITH w AS (SELECT uuid, timestamp AS t, event_type,
                  max(CASE WHEN event_type='click' THEN timestamp END) OVER
                    (PARTITION BY uuid ORDER BY timestamp, seq
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ct
           FROM perf)
SELECT count(*)::BIGINT AS attr_purchases FROM w
WHERE event_type='purchase' AND ct IS NOT NULL AND t < ct + 604800
""",
    ),
}


def _open_perf(spark, n_events: int):
    """(flat_df, store_df, parquet_path) for an n_events perf dataset,
    generating and caching both layouts on first use."""
    from trck_spark.benchdata import N_EVENTS, ensure_perf_dataset
    from trck_spark.store import (
        is_trail_store,
        open_trail_store,
        read_manifest,
        write_trail_store,
    )

    path, store_path = _perf_paths(n_events)
    n_cookies = n_events // N_EVENTS
    path = ensure_perf_dataset(spark, path, n_cookies=n_cookies)
    flat = spark.read.parquet(path)
    if is_trail_store(store_path) and "dicts" in read_manifest(
        store_path
    ):
        store = open_trail_store(spark, store_path)
    else:
        store = write_trail_store(flat, store_path)
    return flat, store, path


def _steady_state(run, max_runs: int = 5):
    """Steady-state wallclock: one untimed warm-up, then best-of-two —
    EXTENDED while the timing is still improving >20% run-over-run
    (cap max_runs).  The 160M flat-path window sort needs 3-4 runs to
    reach steady state (JIT of the sort/shuffle path + page cache:
    77 -> 35 -> 17.5 -> 17.6 s measured); a fixed best-of-two records
    whatever point of that curve it happened to hit.  Applied
    identically to BOTH engines, so the protocol stays symmetric."""
    prev = run()  # untimed warm-up
    best = None
    timed = 0
    while timed < max_runs - 1:
        cur = run()
        timed += 1
        best = cur if best is None or cur < best else best
        if timed >= 2 and cur > prev * 0.8:
            break
        prev = cur
    return best


def run_baseline_gate(spark, n_events: int = None) -> dict:
    """Spark (flat parquet AND TrailStore bucketed layout) vs the DuckDB
    oracle at GATE_EVENTS events.  Timings are steady-state (see
    ``_steady_state``).  Every Spark result is value-compared against
    the oracle rows ("match").  Per-query events/s for both engines are
    reported alongside the raw ratio so floor-dominated rows
    (sub-second oracle) read as what they are."""
    import duckdb

    from trck_spark import queries as Q
    from trck_spark.benchdata import N_EVENTS
    from trck_spark.engine import TrckSparkEngine

    n_events = n_events or GATE_EVENTS
    flat, store, path = _open_perf(spark, n_events)
    engine = TrckSparkEngine(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW perf AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )

    def time_spark(src, prog):
        rows = []

        def one():
            t0 = time.time()
            rows[:] = (
                engine.run(src, prog, uuid_col="uuid", ts_col="timestamp",
                           seq_col="seq")
                .counters_df()
                .collect()
            )
            return time.time() - t0

        best = _steady_state(one)
        return rows, best

    # session-level warm-up: the first-ever Spark job in a session pays
    # executor spin-up + codegen-infrastructure costs beyond what the
    # per-query warm-up covers (measured: first-query store B1 1.3s
    # cold vs 0.7s in a warmed session) — burn it on an untimed run
    engine.run(
        store, B1_PROG, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
    ).counters_df().collect()

    out: dict = {"events": n_events, "trails": n_events // N_EVENTS}
    tot = {"spark_s": 0.0, "spark_store_s": 0.0, "oracle_s": 0.0}
    for name, (prog_ref, oracle_sql) in BASELINE_DEFS.items():
        prog = prog_ref if prog_ref.startswith("\n") else getattr(Q, prog_ref)
        # STORE first, FLAT second: the flat path's 160M-row window
        # sorts leave the heap churned for ~a minute afterwards
        # (measured: store B1 6.3s right after the flat runs vs 0.7s
        # clean), so the headline layout is timed on a settled heap and
        # the flat path absorbs its own churn.  A forced GC between
        # blocks bounds the carry-over further.
        _gc = spark.sparkContext._jvm.System.gc
        _, store_s = time_spark(store, prog)
        _gc()
        srows, spark_s = time_spark(flat, prog)
        _gc()
        # same adaptive steady-state protocol as Spark — otherwise the
        # ratio inherits the oracle's first-run page-cache noise
        orows: list = []

        def one_oracle():
            t0 = time.time()
            orows[:] = con.execute(oracle_sql).fetchall()
            return time.time() - t0

        oracle_s = _steady_state(one_oracle)
        match = sorted(tuple(r) for r in srows) == sorted(
            tuple(r) for r in orows
        )
        out[name] = {
            "spark_s": round(spark_s, 3),
            "spark_store_s": round(store_s, 3),
            "oracle_s": round(oracle_s, 3),
            "ratio": round(spark_s / oracle_s, 2) if oracle_s else None,
            "ratio_store": (
                round(store_s / oracle_s, 2) if oracle_s else None
            ),
            "spark_store_meps": round(n_events / store_s / 1e6, 1),
            "oracle_meps": round(n_events / oracle_s / 1e6, 1),
            "match": match,
        }
        tot["spark_s"] += spark_s
        tot["spark_store_s"] += store_s
        tot["oracle_s"] += oracle_s
        print(f"# baseline {name}: spark {out[name]['spark_s']}s / store "
              f"{out[name]['spark_store_s']}s vs duckdb "
              f"{out[name]['oracle_s']}s = {out[name]['ratio']}x / "
              f"{out[name]['ratio_store']}x (match={match})",
              file=sys.stderr)
    out["total"] = {
        "spark_s": round(tot["spark_s"], 3),
        "spark_store_s": round(tot["spark_store_s"], 3),
        "oracle_s": round(tot["oracle_s"], 3),
        "ratio": round(tot["spark_s"] / tot["oracle_s"], 2),
        "ratio_store": round(tot["spark_store_s"] / tot["oracle_s"], 2),
    }
    out["b3_trails_per_sec"] = round(
        out["trails"] / out["b1_count_foreach"]["spark_store_s"], 1
    )
    out["b3_events_per_sec"] = round(
        n_events / out["b1_count_foreach"]["spark_store_s"], 1
    )
    return out


def run_marginal_gate(spark, gate_out: dict,
                      n_lo: int = 20_000_000) -> dict:
    """Marginal per-event cost between n_lo and the gate size, both
    engines: (t_hi - t_lo) / (n_hi - n_lo).

    The subtraction cancels each engine's FIXED per-query cost (Spark:
    scheduler + py4j + codegen ~0.4-0.7 s; DuckDB: parse + plan), so
    the marginal ratio measures pure streaming throughput — the honest
    form of the 2x gate for queries whose DuckDB wallclock stays
    sub-second at any practical dataset size.  B1 is the motivating
    case: DuckDB aggregates the dictionary-coded column at ~900M
    events/s, so "grow until the oracle runs 5s" needs 4.5B events
    (~10 min regeneration per round); the marginal ratio gets the same
    floor-free comparison from the 20M dataset the FSM bench already
    caches.  hi-side timings are reused from the main gate run (same
    protocol: warm-up + best-of-two); lo-side timings are measured
    here the same way."""
    import duckdb

    from trck_spark import queries as Q
    from trck_spark.engine import TrckSparkEngine

    n_hi = gate_out["events"]
    _, store_lo, path_lo = _open_perf(spark, n_lo)
    engine = TrckSparkEngine(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW perf AS SELECT * FROM "
        f"read_parquet('{path_lo}/*.parquet')"
    )
    out: dict = {"events_lo": n_lo, "events_hi": n_hi}
    for name, (prog_ref, oracle_sql) in BASELINE_DEFS.items():
        prog = prog_ref if prog_ref.startswith("\n") else getattr(Q, prog_ref)

        def one_spark():
            t0 = time.time()
            engine.run(
                store_lo, prog, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq",
            ).counters_df().collect()
            return time.time() - t0

        def one_oracle():
            t0 = time.time()
            con.execute(oracle_sql).fetchall()
            return time.time() - t0

        lo_s = _steady_state(one_spark)
        olo_s = _steady_state(one_oracle)
        hi_s = gate_out[name]["spark_store_s"]
        ohi_s = gate_out[name]["oracle_s"]
        d_ev = n_hi - n_lo
        sp_marg = max(hi_s - lo_s, 1e-9) / d_ev
        or_marg = max(ohi_s - olo_s, 1e-9) / d_ev
        out[name] = {
            "spark_store_lo_s": round(lo_s, 3),
            "spark_store_hi_s": hi_s,
            "oracle_lo_s": round(olo_s, 3),
            "oracle_hi_s": ohi_s,
            "spark_marginal_meps": round(1 / sp_marg / 1e6, 1),
            "oracle_marginal_meps": round(1 / or_marg / 1e6, 1),
            "marginal_ratio": round(sp_marg / or_marg, 2),
        }
        print(f"# marginal {name}: spark {out[name]['spark_marginal_meps']}"
              f" Mev/s vs duckdb {out[name]['oracle_marginal_meps']}"
              f" Mev/s = {out[name]['marginal_ratio']}x",
              file=sys.stderr)
    return out


def run_fsm_path_bench(spark, n_events: int = 20_000_000) -> dict:
    """B1 on the GENERAL FSM path (TRCK_SPARK_NO_FASTPATH): the
    mapInPandas interpreter with occurring/non-occurring grid pruning —
    the reference's whole perf story is the pruned FSM
    (match_traildb.c:653-744); this records our pruned-FSM events/s and
    the pruning telemetry (fsm_runs per trail vs grid size) at a fixed
    20M-event workload.  Uses the TrailStore layout (no shuffle before
    the interpreter); B1_PROG (the perftest1 shape) exercises the
    ~100-value implicit-foreach grid."""
    from trck_spark.engine import TrckSparkEngine

    _, store, _ = _open_perf(spark, n_events)
    engine = TrckSparkEngine(spark)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        best, telem, n_tuples = None, {}, 0
        for i in range(2):  # warm-up python workers, then one timed run
            t0 = time.time()
            rs = engine.run(
                store, B1_PROG, uuid_col="uuid",
                ts_col="timestamp", seq_col="seq",
            )
            rows = rs.counters_df().collect()
            dt = time.time() - t0
            if i > 0:
                best = dt
                telem = rs.telemetry()
                n_tuples = len(rows)
    finally:
        del os.environ["TRCK_SPARK_NO_FASTPATH"]
    trails = telem.get("trails") or 1
    return {
        "events": n_events,
        "seconds": round(best, 3),
        "events_per_sec": round(n_events / best, 1),
        "grid_size": n_tuples,
        "fsm_runs": telem.get("fsm_runs"),
        "fsm_runs_per_trail": round(
            (telem.get("fsm_runs") or 0) / trails, 3
        ),
        "grid_shared": telem.get("grid_shared"),
        "trails": telem.get("trails"),
    }


def run_streaming_bench(spark, n_events: int = 20_000_000) -> dict:
    """Structured Streaming throughput: the 20M-event perf dataset
    replayed as a file stream (one micro-batch per parquet file, 32
    files) through the stateful sessionization operator
    (applyInPandasWithState) into a counting sink.  Reports end-to-end
    events/s and sessions emitted — the continuous-ingestion side of
    the engine, which the batch gate doesn't exercise."""
    from pyspark.sql import functions as F

    from trck_spark.pipeline.streaming import streaming_session_features

    path, _ = _perf_paths(n_events)
    # schema must be pinned for readStream; derive it from the files
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
        .select(
            F.expr("CAST(substring(uuid, 2) AS LONG)").alias("user_id"),
            F.timestamp_seconds(F.col("timestamp")).alias("ts"),
            F.col("seq").alias("event_id"),
            "event_type",
        )
    )
    counts = {"sessions": 0}

    def sink(batch_df, _bid):
        counts["sessions"] += batch_df.count()

    t0 = time.time()
    # the perf files are uuid-partitioned, not time-ordered: each
    # micro-batch covers the FULL time range for a uuid slice, so the
    # watermark delay must exceed the dataset's ~27h event-time span or
    # every batch after the first is dropped as late
    q = (
        streaming_session_features(sdf, delay="48 hours")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1200)
    dt = time.time() - t0
    return {
        "events": n_events,
        "seconds": round(dt, 3),
        "events_per_sec": round(n_events / dt, 1),
        "sessions_emitted": counts["sessions"],
    }


def check_ts_dtype(sf_dir: str) -> str:
    """Pin the events.ts dtype contract: the driver regenerates testdata
    between rounds and the parquet encoding has drifted before
    (TIMESTAMP(NANOS) in round 1, naive timestamp[us] in round 2).
    load_events handles the known encodings; anything NEW fails loudly
    here so a bench delta stays attributable to code, not data."""
    import pyarrow.parquet as pq

    ts = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    known = {"timestamp[ns]", "timestamp[us]", "timestamp[ms]", "int64"}
    if ts not in known:
        raise SystemExit(
            f"events.ts dtype drifted to {ts!r} (known: {sorted(known)}); "
            "update trck_spark.queries.load_events before benching"
        )
    print(f"# events.ts dtype: {ts}", file=sys.stderr)
    return ts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    ts_dtype = check_ts_dtype(sf_dir)
    from trck_spark.session import get_spark

    spark = get_spark("trck_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = dict(entry_mod.queries())
    # The REGISTERED minhash/simhash/contamination queries pin
    # hash_mode='md5' so the DuckDB correctness oracle reproduces every
    # derived hash.  The bench times the production default instead
    # (hash_mode='xxhash64': same algorithm, same plan shape,
    # engine-native hash) — md5-as-production cost +65% on the minhash
    # bench in round 2.  The xxhash64 path carries its own ground truth
    # via the planted-pair stress tests (tests/test_pipeline_stress.py).
    from trck_spark.pipeline import curation as _cur
    from trck_spark.pipeline import dedup as _dd

    queries["minhash_lsh_pairs"] = (
        lambda s, d: _dd.minhash_lsh_pairs(s, d, threshold=0.2)
    )
    queries["simhash_pairs"] = (
        lambda s, d: _dd.simhash_pairs(s, d, max_hamming=3)
    )
    queries["contamination_check"] = (
        lambda s, d: _cur.contamination_check(s, d, n_eval=100)
    )
    bench_names = [
        "trck_count_by_type",   # B1: implicit foreach counter
        "trck_funnel",          # B2: windowed funnel (FSM)
        "trck_sessions",        # FSM sessionization
        "trck_attribution",     # FSM 7d attribution window
        "lineitem_pricing",     # relational agg
        "revenue_by_segment",   # broadcast join + agg
    ]
    for extra in ("trck_sessions_by_type", "dedup_exact",
                  "ngram_jaccard_pairs", "ann_cosine_topk",
                  "minhash_lsh_pairs", "text_quality",
                  "embedding_near_dup_pairs", "video_frame_sample",
                  "dedup_clusters", "quota_sample",
                  "vocab_topk", "contamination_check",
                  "trck_clicks_by_user", "mixture_sample",
                  "ngram_containment_pairs", "repetition_stats",
                  "hash_split", "sequence_pack", "pii_stats",
                  "tfidf_topterms", "dup_span_stats", "semantic_dedup"):
        if extra in queries:
            bench_names.append(extra)

    timings: dict[str, float] = {}
    # warm the JVM, codegen, python workers and parquet footers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    queries["trck_count_clicks"](spark, sf_dir).count()

    # the baseline gate runs FIRST: its 20M-event dataset is freshly
    # written/read (page-cache warm) and the heavy sf0.1 pipeline
    # queries haven't pressured memory yet — running it last made the
    # DuckDB oracle's wallclock swing 4-6x between invocations
    baseline = None
    if os.environ.get("SPARK_GRAFT_SKIP_BASELINE") != "1":
        try:
            baseline = run_baseline_gate(spark)
        except Exception as e:  # never let the gate break the contract line
            baseline = {"error": f"{type(e).__name__}: {e}"}
            print(f"# baseline gate failed: {e}", file=sys.stderr)
        try:
            if "error" not in baseline:
                baseline["marginal"] = run_marginal_gate(spark, baseline)
        except Exception as e:
            baseline["marginal"] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# marginal gate failed: {e}", file=sys.stderr)
        try:
            baseline["b1_fsm_path"] = run_fsm_path_bench(spark)
            print(f"# b1 FSM path: {baseline['b1_fsm_path']}",
                  file=sys.stderr)
        except Exception as e:
            baseline["b1_fsm_path"] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# fsm-path bench failed: {e}", file=sys.stderr)
        try:
            baseline["streaming"] = run_streaming_bench(spark)
            print(f"# streaming sessionization: {baseline['streaming']}",
                  file=sys.stderr)
        except Exception as e:
            baseline["streaming"] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# streaming bench failed: {e}", file=sys.stderr)

    from trck_spark.pipeline.dedup import release

    for name in bench_names:
        fn = queries[name]
        best = None
        n = 0
        df = None
        for _ in range(2):  # steady-state: best of two runs
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        # drop cached intermediates (persist lifetime is caller-owned;
        # Spark's CacheManager matches canonical plans, so releasing the
        # last invocation's frames releases the shared entries)
        release(df)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # B3: trail throughput on the B1 workload
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_trails = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    b1 = timings.get("trck_count_by_type") or 1.0
    print(
        f"# {n_trails} trails, {n_events} events; B1 trails/sec = "
        f"{n_trails / b1:.0f}, events/sec = {n_events / b1:.0f}",
        file=sys.stderr,
    )

    result = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "trails_per_sec": round(n_trails / b1, 1),
        "events_per_sec": round(n_events / b1, 1),
        "ts_dtype": ts_dtype,
    }
    if baseline is not None:
        result["baseline"] = baseline
    print(json.dumps(result))


if __name__ == "__main__":
    main()
