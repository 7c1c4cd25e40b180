#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads mirror BASELINE.md: B1 implicit-foreach count (perftest1 shape),
B2 windowed funnel (FSM path), B3 trail throughput, plus the relational
and pipeline headliners.

Process layout (round 4): the 160M-event baseline gate (plus marginal /
FSM-path / streaming benches) runs in a SUBPROCESS with a 48g driver
heap, writing its full result to BENCH_GATE.json; the sf0.1 query loop
runs in THIS process on the library-default 16g heap.  Two reasons:
(a) the gate's 160M window sorts OOM a 16g heap, but 48g as a library
default breaks modest hosts (round-3 ADVICE), and (b) round 3 measured
15-47% drift on the sf0.1 pipeline queries when they shared a JVM with
the gate's churned heap — process isolation pins the blame structure.
The final contract line carries the per-query sf0.1 timings plus a
compact gate summary; full gate detail lives in BENCH_GATE.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_REPO = os.path.dirname(os.path.abspath(__file__))

# ------------------------------------------------ wall-clock budget (r10)
#
# Round 9 lost its entire official perf artifact (BENCH_r09 rc=124,
# parsed: null) because the run had no total wall-clock budget and the
# gate child held every measured number in memory until the end.  The
# harness now (a) tracks a TOTAL budget from process start, (b) sizes
# each child's timeout from what remains, (c) degrades the pair-scale
# protocol 3->1 runs and then SKIPS blocks (with a disclosed marker)
# rather than dying, and (d) checkpoints every artifact after every
# completed block, so a kill at any point leaves a parseable, current
# BENCH_GATE.json / BENCH_SF.json and the parent can always emit the
# contract line.  Default 4200s (VERDICT r10 item 2): the 5400s r10
# default demonstrably overran the driver's outer timeout — the kill
# landed mid-pair with sf + oracle + gate complete — so the default is
# sized to what r10's evidence says fits (those blocks) plus bounded
# pair headroom, and the pair protocol pre-degrades 3->1 runs before
# launch when the remainder can't fit three.

_T0 = time.time()

# ------------------------------------------- low-core scaling probe (r12)
#
# The driver re-runs this bench at a LOW core count to measure scaling,
# on a shorter outer deadline: the r11 8-core run (BENCH_r11_c8)
# finished sf + oracle + gate + flat but was SIGTERM-killed mid-pair,
# rc=124, because the protocol was sized for 32 cores.  Below 24 cores
# the defaults pre-degrade so the probe self-completes (VERDICT r11
# item 3): the total budget scales with the core ratio (plus fixed-JVM
# headroom), the streaming benches and the pair corpus shrink by the
# same ratio (each row discloses its own n_events / n_docs, so nothing
# is silently comparable across core counts), and the per-timing
# steady-state time cap scales down (run lists still committed; the
# plateau/settle RULES are unchanged).  At >= 24 cores every value is
# byte-identical to the r11 protocol — no change to the driver's main
# bench.  Every knob stays env-overridable.
_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (
    os.cpu_count() or 32
)
_LOW_CORE = _CPUS < 24
_CORE_SCALE = 1.0 if not _LOW_CORE else max(_CPUS / 32.0, 0.05)
_env_budget = os.environ.get("TRCK_SPARK_BENCH_BUDGET_S")
_BUDGET_S = (
    float(_env_budget)
    if _env_budget
    else (4200.0 if not _LOW_CORE else max(
        1500.0, 4200.0 * _CORE_SCALE + 1200.0
    ))
)
# final BENCH_SF rewrite + contract print headroom
_FINAL_RESERVE_S = 120.0


def _stream_events() -> int:
    """Streaming-bench event count: 20M at full scale, core-ratio-scaled
    on the low-core probe (each row carries its own `events`)."""
    return max(2_000_000, int(20_000_000 * _CORE_SCALE))


def _pair_docs() -> int:
    """Pair-family corpus size: 5M docs at full scale, core-ratio-scaled
    on the low-core probe (the row carries its own `n_docs`)."""
    envv = os.environ.get("SPARK_GRAFT_PAIR_DOCS")
    if envv is not None:
        return int(envv)
    return max(250_000, int(5_000_000 * _CORE_SCALE))


# ------------------------------------------ interference sampler (r12)
#
# VERDICT r11 item 4: this box pays episodic hypervisor steal (a
# /proc/stat sampler measured 7-21% steal windows during the r11 runs,
# which explains the B2-funnel regime spread on untouched code).  The
# sampler now lives IN the harness: a daemon thread samples the
# aggregate /proc/stat cpu line every ~5 s, and every steady-state
# timing window records the max/mean steal percentage it overlapped —
# so the driver can separate box regime from code regressions
# mechanically, per row.


class _StealSampler:
    PERIOD_S = 5.0

    def __init__(self) -> None:
        self.samples: list = []  # (wall_time, steal_pct)
        self._started = False

    def start(self) -> None:
        import threading

        if self._started:
            return
        self._started = True
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def _loop(self) -> None:
        prev = None
        while True:
            try:
                with open("/proc/stat") as f:
                    parts = f.readline().split()
                vals = [int(x) for x in parts[1:]]
            except Exception:
                return  # no /proc/stat: rows carry null, disclosed
            tot = sum(vals)
            steal = vals[7] if len(vals) > 7 else 0
            now = time.time()
            if prev is not None and tot > prev[0]:
                self.samples.append(
                    (now, 100.0 * (steal - prev[1]) / (tot - prev[0]))
                )
            prev = (tot, steal)
            time.sleep(self.PERIOD_S)

    def window(self, t0: float, t1: float):
        """max/mean steal%% over samples inside [t0, t1] (padded one
        period so a short window still catches its covering sample)."""
        xs = [
            s
            for t, s in list(self.samples)
            if t0 <= t <= t1 + self.PERIOD_S
        ]
        if not xs:
            return None
        return {
            "max": round(max(xs), 1),
            "mean": round(sum(xs) / len(xs), 1),
            "n": len(xs),
        }


_STEAL_SAMPLER = _StealSampler()


def _remaining() -> float:
    """Seconds left in the total bench budget (may go negative)."""
    return _BUDGET_S - (time.time() - _T0)


def _atomic_write_json(path: str, obj) -> None:
    """Write-then-rename so a kill mid-write can never leave a torn
    artifact; every block checkpoint goes through here."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(obj, indent=1, default=str) + "\n")
    os.replace(tmp, path)


def _read_json(path: str):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None

# --------------------------------------------------------- baseline gate
#
# BASELINE.md B1/B2: run the perftest1-shaped workload (reference
# test/perf/perftest1_db.py:9-12) with the DuckDB oracle wallclock
# measured side-by-side, and report spark_s / oracle_s / ratio per
# headline query.  Results are also value-compared ("match") so the
# timing claim carries its own correctness evidence.
#
# GATE SIZE: round 2 measured at 20M events and found the ratios
# dominated by Spark's fixed per-query floor against 35-800ms DuckDB
# wallclocks — overhead, not throughput.  Default 160M events (800k
# trails x 200); override with SPARK_GRAFT_GATE_EVENTS.  Datasets are
# generated once and cached under .bench_cache/ across rounds.

GATE_EVENTS = int(os.environ.get("SPARK_GRAFT_GATE_EVENTS", 160_000_000))
_CACHE_DIR = os.path.join(_REPO, ".bench_cache")


def _has_hll_slices(seg_path: str, m: dict) -> bool:
    """True when the base AND every segment of the cached store carry
    the r11 sliced sketch sidecar (store._write_hll_slices) — a stale
    cache would silently measure the pre-slice boundary plan."""
    from trck_spark.store import read_manifest

    if not m.get("hll_slices"):
        return False
    for s in m.get("segments") or []:
        try:
            if not read_manifest(os.path.join(seg_path, s)).get(
                "hll_slices"
            ):
                return False
        except FileNotFoundError:
            return False
    return True


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
        ensure_rollups,
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
        # upgrade pre-v3 cached stores in place (one scan, no rewrite):
        # the manifest rollup is what lets B1 answer without a scan
        ensure_rollups(spark, store_path)
        store = open_trail_store(spark, store_path)
    else:
        store = write_trail_store(flat, store_path)
    return flat, store, path


def _open_perf_segmented(spark, n_events: int):
    """SEGMENTED variant of the perf store — the same events time-sliced
    into three period appends (one-tdb-per-period ingestion), cached
    next to the plain store.  The bench row it feeds proves continuous
    ingestion keeps B1 on the zero-scan merged-rollup tier (VERDICT r07
    item 1)."""
    from pyspark.sql import functions as F

    from trck_spark.store import (
        append_trail_store,
        is_trail_store,
        open_trail_store,
        read_manifest,
    )

    path, store_path = _perf_paths(n_events)
    seg_path = store_path + "_seg"
    if is_trail_store(seg_path) and read_manifest(seg_path).get(
        "segments"
    ):
        m = read_manifest(seg_path)
        if not m.get("hll_rr_col"):
            # cached by a pre-r10 layout (no materialized __hll_rr
            # column): the rr_fold boundary plan needs the PERSISTED
            # column, which only a rewrite can add — rebuild so the
            # gate measures the shipped layout
            import shutil

            print(f"# rebuilding {seg_path} (stale store layout)",
                  file=sys.stderr)
            shutil.rmtree(seg_path, ignore_errors=True)
        else:
            if "hll_rollups" not in m or not _has_hll_slices(
                seg_path, m
            ):
                # backfill the cookie sketches / sliced sidecar (and
                # any missing rollups/zone maps) in place — one scan
                # per segment instead of the full rewrite an r10
                # cache previously forced
                from trck_spark.store import ensure_rollups

                ensure_rollups(spark, seg_path)
            return open_trail_store(spark, seg_path)
    flat = spark.read.parquet(path)
    lohi = flat.agg(
        F.min("timestamp").alias("lo"), F.max("timestamp").alias("hi")
    ).first()
    t1 = lohi["lo"] + (lohi["hi"] - lohi["lo"]) // 3
    t2 = lohi["lo"] + 2 * (lohi["hi"] - lohi["lo"]) // 3
    store = None
    for cond in (
        F.col("timestamp") < t1,
        (F.col("timestamp") >= t1) & (F.col("timestamp") < t2),
        F.col("timestamp") >= t2,
    ):
        store = append_trail_store(flat.filter(cond), seg_path)
    return store


def _open_perf_segmented_thin(spark, n_events: int):
    """PRODUCTION-CADENCE geometry (VERDICT r09 item 3): deep covered
    history (three equal segments over the first ~98% of the time
    span) plus a THIN newest segment (~2%) — the reference's
    one-tdb-per-period ingestion at the point where a ts-bounded
    uniques query's boundary is a sliver of history.  The adversarial
    3-equal-segments store (boundary = 1/3 of all data) stays in the
    gate; this row grades the tier's design point."""
    from pyspark.sql import functions as F

    from trck_spark.store import (
        append_trail_store,
        is_trail_store,
        open_trail_store,
        read_manifest,
    )

    path, store_path = _perf_paths(n_events)
    seg_path = store_path + "_segthin"
    if is_trail_store(seg_path) and read_manifest(seg_path).get(
        "segments"
    ) and read_manifest(seg_path).get("hll_rr_col") and _has_hll_slices(
        seg_path, read_manifest(seg_path)
    ):
        return open_trail_store(spark, seg_path)
    import shutil

    shutil.rmtree(seg_path, ignore_errors=True)
    flat = spark.read.parquet(path)
    lohi = flat.agg(
        F.min("timestamp").alias("lo"), F.max("timestamp").alias("hi")
    ).first()
    span = lohi["hi"] - lohi["lo"]
    h = lohi["lo"] + span * 98 // 100  # history/thin cut
    t1 = lohi["lo"] + (h - lohi["lo"]) // 3
    t2 = lohi["lo"] + 2 * (h - lohi["lo"]) // 3
    store = None
    for cond in (
        F.col("timestamp") < t1,
        (F.col("timestamp") >= t1) & (F.col("timestamp") < t2),
        (F.col("timestamp") >= t2) & (F.col("timestamp") < h),
        F.col("timestamp") >= h,
    ):
        store = append_trail_store(flat.filter(cond), seg_path)
    return store


def _steady_state(run, max_runs: int = 12, plateau: float = 0.10,
                  budget_s: float = 60.0, settle_runs: int = 2):
    """Steady-state wallclock: one untimed warm-up, then repeat until
    the timing plateaus; return (best, all_timed_runs, median).

    The JVM's C2 JIT takes MANY runs to fully compile the generated
    scan/agg code: the 160M B1 curve measures 44.5 -> 3.0 -> 1.8 ->
    1.2 -> ... -> 0.65 s over ~12 runs (round-4 profiling), and round
    3's best-of-two protocol recorded whatever mid-curve point it
    happened to stop at — the committed artifact's contaminated B1
    lo-side was exactly that.  Plateau rule: stop after two consecutive
    runs that failed to improve the best by >`plateau`, cap `max_runs`
    runs or `budget_s` cumulative seconds.  Applied identically to
    BOTH engines, so the protocol stays symmetric.  The full run list
    goes into the artifact so a reader can see the curve a number came
    from instead of trusting a point estimate.

    `median` (VERDICT r05 item 2): after the plateau, `settle_runs`
    additional timed runs are taken, and the median is computed over
    the STEADY-STATE SUBSET — the last (settle_runs + 2) runs that lie
    within 1.5x of the best.  The subset rule (not just "last N") is
    what excludes the ramp even when the loop exits on the time budget
    mid-descent: a 160M cold-page-cache first run can be 7x the steady
    state, and a plain tail median would inherit it.  Best-of-N on a
    ±30% JIT/page-cache-variance query flips across a ratio bar
    between same-day reruns; the steady-state median is the gate's
    REPORTED STATISTIC, and `best` stays in the artifact for
    cross-round comparability.

    `mean` is the fmean over the same tail: the marginal ratio divides
    a DIFFERENCE of two same-scale timings, and differences of
    best-of-N (each biased low by its own luckiest draw) carry ~2x the
    run noise of either input — the round-6 B1 marginal measured 1.35x
    / 1.56x / 2.07x across three same-day full runs on exactly that
    estimator.  The tail mean is the variance-minimizing combination
    for that subtraction; the gate queries also pass settle_runs=4 so
    the tail holds 6 samples instead of 4, and the B1 marginal inputs
    pass settle_runs=10 (12-sample tails — VERDICT r06 item 3: the
    6-sample B1 marginal swung 0.91x -> 1.39x between same-day runs;
    the inputs are sub-second, so doubling the tail costs seconds).

    The tail itself is returned so callers can attach a confidence
    interval to statistics DERIVED from the means (the marginal
    ratio's delta-method CI).

    No-plateau guard (VERDICT r10 item 1a): on a bimodal /
    non-plateauing query the within-1.5x-of-best subset can collapse to
    the two luckiest runs (the r10 b_hll_store_ts run list
    [2.19..8.00 s] reported a best-2-of-7 "median" of 1.95x where the
    driver measured 4.42x).  When the subset holds fewer than
    settle_runs+2 samples, or the last settle_runs+2 runs of the FULL
    list still disperse beyond 1.5x (never settled), the reported
    median/mean switch to the FULL run list and the result carries
    ``no_plateau=True`` so the artifact discloses the regime."""
    import statistics

    if _LOW_CORE:
        # low-core scaling probe: same plateau/settle RULES, scaled
        # time cap (see the low-core block at the top of this file)
        budget_s = max(10.0, budget_s * _CORE_SCALE)
    _STEAL_SAMPLER.start()
    t_start = time.time()
    run()  # untimed warm-up
    best = None
    non_improving = 0
    spent = 0.0
    runs: list[float] = []
    for _ in range(max_runs):
        cur = run()
        spent += cur
        runs.append(round(cur, 3))
        if best is None or cur < best * (1.0 - plateau):
            best = cur if best is None or cur < best else best
            non_improving = 0
        else:
            best = min(best, cur)
            non_improving += 1
        if non_improving >= 2 or spent > budget_s:
            break
    for _ in range(settle_runs):
        if spent > budget_s * 1.5:
            break  # settle tail gets slack but not unbounded time
        cur = run()
        spent += cur
        runs.append(round(cur, 3))
        best = min(best, cur)
    steady = [r for r in runs if r <= best * 1.5] or [best]
    tail = steady[-min(len(steady), settle_runs + 2):]
    want = min(len(runs), settle_runs + 2)
    last_window = runs[-want:]
    no_plateau = len(steady) < want or (
        len(last_window) >= 2
        and max(last_window) > min(last_window) * 1.5
    )
    if no_plateau:
        tail = list(runs)
    res = _SteadyResult(
        (best, runs, round(statistics.median(tail), 3),
         round(statistics.fmean(tail), 3), tail)
    )
    res.no_plateau = no_plateau
    # hypervisor-steal regime over this timing's whole window (incl.
    # warm-up): null when /proc/stat is unavailable or the window is
    # shorter than one sample period
    res.steal_pct = _STEAL_SAMPLER.window(t_start, time.time())
    return res


class _SteadyResult(tuple):
    """5-tuple (best, runs, median, mean, tail) plus ``no_plateau`` and
    ``steal_pct`` disclosure attributes — unpacks exactly like the
    historical tuple."""

    no_plateau = False
    steal_pct = None


def _median_ci(tail):
    """Order-statistic ~95% CI for the median of a steady tail: 2nd
    smallest to 2nd largest when the tail holds >=6 samples (binomial
    coverage ~96-99% at n=6-12), min..max for tinier tails."""
    t = sorted(tail)
    if len(t) >= 6:
        return [t[1], t[-2]]
    return [t[0], t[-1]]


def run_baseline_gate(spark, n_events: int = None,
                      n_lo: int = 20_000_000, ckpt=None) -> dict:
    """Spark (flat parquet AND TrailStore bucketed layout) vs the DuckDB
    oracle at GATE_EVENTS events, plus the 20M lo-side runs that feed
    the marginal-throughput ratios.  Every timing is steady-state (see
    ``_steady_state``) and the artifact carries the full run list per
    timing, so stability is inspectable in the committed file.

    BLOCK STRUCTURE, not per-query interleaving: all store-layout
    timings (hi AND lo — the headline numbers and both marginal
    inputs) run first on a settled heap; the flat-parquet block runs
    second and absorbs its own churn (its 160M window sorts degrade
    whatever runs after them — round 3's B2 store reading 2.6 s in the
    gate vs 1.0 s standalone was exactly this contamination); the
    DuckDB block runs last (a separate C++ allocator, indifferent to
    JVM heap state, with its own steady-state warm-up for page cache).

    The timed Spark region is engine.run(...).counters_df().collect()
    — parse, plan, execute, fetch.  Repeat runs hit the engine's
    prepared-plan cache (engine.py), which re-executes every stage on
    a fresh Dataset but skips the Python-side plan construction; that
    matches what DuckDB's sub-millisecond parse+plan pays on ITS
    repeat runs, so best-of-N compares streaming execution, not py4j
    socket chatter.

    Marginal ratio = (t_hi - t_lo) / (n_hi - n_lo) per engine: cancels
    each engine's fixed per-query cost — the honest form of the 2x
    gate for queries whose DuckDB wallclock stays sub-second at any
    practical size.  NON-MONOTONE GUARD (round-3 verdict item 1): if
    t_hi <= t_lo for either engine, the lo side is re-measured once;
    if still non-positive, the marginal fields are null with
    "non_monotone": true — never a clamped sentinel (BENCH_r03's fake
    1.4e11 Mev/s row)."""
    import duckdb

    from trck_spark import queries as Q
    from trck_spark.benchdata import N_EVENTS
    from trck_spark.engine import TrckSparkEngine

    n_events = n_events or GATE_EVENTS
    flat, store, path = _open_perf(spark, n_events)
    _, store_lo, path_lo = _open_perf(spark, n_lo)
    engine = TrckSparkEngine(spark)
    _gc = spark.sparkContext._jvm.System.gc
    progs = {
        name: (p if p.startswith("\n") else getattr(Q, p))
        for name, (p, _sql) in BASELINE_DEFS.items()
    }

    def time_spark(src, prog, settle_runs=4):
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

        res = _steady_state(one, settle_runs=settle_runs)
        best, runs, med, mean, tail = res
        return rows, best, runs, med, mean, tail, res

    # B1's marginal is the one bar-carrying statistic built from
    # sub-second means; give its four inputs 12-sample tails (VERDICT
    # r06 item 3).  B2's median showed the widest inter-signal spread
    # of the four gate bars (1.63x committed vs 1.08x driver in r07) —
    # give its four inputs the same 12-sample treatment (VERDICT r07
    # item 4; runs are 1-2 s, ~30 s total).  The rest keep 6-sample
    # tails.
    def _settle_runs_for(name):
        return 10 if name in ("b1_count_foreach", "b2_funnel") else 4

    # session-level warm-up: the first-ever Spark job in a session pays
    # executor spin-up + codegen-infrastructure costs beyond what the
    # per-query warm-up covers — burn it on an untimed run
    engine.run(
        store, B1_PROG, uuid_col="uuid", ts_col="timestamp", seq_col="seq"
    ).counters_df().collect()

    # --- store block: headline layout + both marginal inputs ---
    st: dict = {}
    for name, prog in progs.items():
        sr = _settle_runs_for(name)
        (srows, hi_s, hi_runs, hi_med, hi_mean, hi_tail,
         hi_res) = time_spark(store, prog, settle_runs=sr)
        (_r, lo_s, lo_runs, lo_med, lo_mean, lo_tail,
         lo_res) = time_spark(store_lo, prog, settle_runs=sr)
        st[name] = {
            "rows": srows, "hi_s": hi_s, "hi_runs": hi_runs,
            "lo_s": lo_s, "lo_runs": lo_runs,
            "hi_med": hi_med, "lo_med": lo_med,
            "hi_mean": hi_mean, "lo_mean": lo_mean,
            "hi_tail": hi_tail, "lo_tail": lo_tail,
            "hi_steal": hi_res.steal_pct, "lo_steal": lo_res.steal_pct,
        }
        print(f"# store {name}: hi {hi_s:.3f}s med {hi_med:.3f}s "
              f"{hi_runs} / lo {lo_s:.3f}s {lo_runs}", file=sys.stderr)
        if ckpt:
            # durability checkpoint: measured store timings survive a
            # kill even before the oracle side runs (transient key,
            # dropped when the full rows are assembled below)
            ckpt({"_store_block_partial": {
                n: {k: d[k] for k in
                    ("hi_s", "hi_med", "lo_s", "lo_med",
                     "hi_runs", "lo_runs")}
                for n, d in st.items()
            }})
    _gc()

    # --- oracle block ---
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW perf AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW perf_lo AS SELECT * FROM "
        f"read_parquet('{path_lo}/*.parquet')"
    )
    oc: dict = {}
    for name, (_p, oracle_sql) in BASELINE_DEFS.items():
        orows: list = []
        # word-bounded so an identifier merely CONTAINING 'perf' (e.g.
        # perf_score) can never be silently rewritten into a wrong view
        lo_sql = re.sub(r"\bperf\b", "perf_lo", oracle_sql)

        def one_oracle():
            t0 = time.time()
            orows[:] = con.execute(oracle_sql).fetchall()
            return time.time() - t0

        def one_oracle_lo():
            t0 = time.time()
            con.execute(lo_sql).fetchall()
            return time.time() - t0

        sr = _settle_runs_for(name)
        ohi_res = _steady_state(one_oracle, settle_runs=sr)
        ohi_s, ohi_runs, ohi_med, ohi_mean, ohi_tail = ohi_res
        olo_s, olo_runs, olo_med, olo_mean, olo_tail = _steady_state(
            one_oracle_lo, settle_runs=sr
        )
        oc[name] = {
            "rows": list(orows), "hi_s": ohi_s, "hi_runs": ohi_runs,
            "lo_s": olo_s, "lo_runs": olo_runs,
            "hi_med": ohi_med, "lo_med": olo_med,
            "hi_mean": ohi_mean, "lo_mean": olo_mean,
            "hi_tail": ohi_tail, "lo_tail": olo_tail,
            "one_lo": one_oracle_lo,
            "hi_steal": ohi_res.steal_pct,
        }
        print(f"# oracle {name}: hi {ohi_s:.3f}s med {ohi_med:.3f}s "
              f"{ohi_runs} / lo {olo_s:.3f}s {olo_runs}", file=sys.stderr)
        if ckpt:
            ckpt({
                "_store_block_partial": {
                    n: {k: d[k] for k in
                        ("hi_s", "hi_med", "lo_s", "lo_med",
                         "hi_runs", "lo_runs")}
                    for n, d in st.items()
                },
                "_oracle_block_partial": {
                    n: {k: d[k] for k in
                        ("hi_s", "hi_med", "lo_s", "lo_med")}
                    for n, d in oc.items()
                },
            })

    # --- assemble (flat-layout numbers are patched in by
    # run_flat_block, which the suite runs LAST: its 160M window sorts
    # degrade everything that runs after them in the same JVM — round
    # 4 measured the 20M FSM bench at 100 s right after the flat block
    # vs 22 s standalone) ---
    out: dict = {
        "events": n_events, "trails": n_events // N_EVENTS,
        # the gate's declared statistic (VERDICT r05 item 2): ratios
        # are reported on BOTH best and steady-state median; the BAR is
        # declared on the MEDIAN (run-stable), best kept for
        # cross-round comparability.  Full run lists per timing below.
        "statistic": "median of post-plateau runs (see _steady_state); "
                     "best retained for comparability; marginal bar "
                     "declared on the steady-tail MEAN (6-sample tails; "
                     "B1 uses 12-sample tails) with a delta-method 95% "
                     "CI committed next to it — differences of "
                     "best-of-N are biased and ~2x noisier",
    }
    tot = {"spark_store_s": 0.0, "oracle_s": 0.0,
           "spark_store_med": 0.0, "oracle_med": 0.0}
    marginal: dict = {"events_lo": n_lo, "events_hi": n_events}
    d_ev = n_events - n_lo
    for name in BASELINE_DEFS:
        store_s, oracle_s = st[name]["hi_s"], oc[name]["hi_s"]
        store_med, oracle_med = st[name]["hi_med"], oc[name]["hi_med"]
        match = sorted(tuple(r) for r in st[name]["rows"]) == sorted(
            tuple(r) for r in oc[name]["rows"]
        )
        sci, oci = _median_ci(st[name]["hi_tail"]), _median_ci(
            oc[name]["hi_tail"]
        )
        out[name] = {
            "spark_store_s": round(store_s, 3),
            "oracle_s": round(oracle_s, 3),
            "ratio_store": (
                round(store_s / oracle_s, 2) if oracle_s else None
            ),
            "spark_store_median_s": store_med,
            "oracle_median_s": oracle_med,
            "ratio_store_median": (
                round(store_med / oracle_med, 2) if oracle_med else None
            ),
            # order-statistic ~95% CI on each median, and the
            # conservative interval it implies for the ratio (VERDICT
            # r07 item 4: B2's inter-signal spread needs a disclosed
            # interval, not a point estimate)
            "spark_store_median_ci": sci,
            "oracle_median_ci": oci,
            "ratio_store_median_ci": (
                [round(sci[0] / oci[1], 2), round(sci[1] / oci[0], 2)]
                if oci[0]
                else None
            ),
            "spark_store_meps": round(n_events / store_s / 1e6, 1),
            "oracle_meps": round(n_events / oracle_s / 1e6, 1),
            "match": match,
            "spark_store_runs": st[name]["hi_runs"],
            "oracle_runs": oc[name]["hi_runs"],
            # hypervisor-steal regime per timing window (VERDICT r11
            # item 4): the mechanical separator of box interference
            # from code regressions — null when /proc/stat has no
            # samples in the window
            "steal_pct": {
                "spark_hi": st[name]["hi_steal"],
                "spark_lo": st[name]["lo_steal"],
                "oracle_hi": oc[name]["hi_steal"],
            },
        }
        tot["spark_store_s"] += store_s
        tot["oracle_s"] += oracle_s
        tot["spark_store_med"] += store_med
        tot["oracle_med"] += oracle_med
        print(f"# baseline {name}: store "
              f"{out[name]['spark_store_s']}s vs duckdb "
              f"{out[name]['oracle_s']}s = "
              f"{out[name]['ratio_store']}x best / "
              f"{out[name]['ratio_store_median']}x median "
              f"(match={match})",
              file=sys.stderr)

        lo_s, olo_s = st[name]["lo_s"], oc[name]["lo_s"]
        lo_med, olo_med = st[name]["lo_med"], oc[name]["lo_med"]
        lo_mean, olo_mean = st[name]["lo_mean"], oc[name]["lo_mean"]
        olo_tail = oc[name]["lo_tail"]
        if oracle_s - olo_s <= 0:  # re-measure the cheap side once
            re_best, _rr, re_med, re_mean, re_tail = _steady_state(
                oc[name]["one_lo"], settle_runs=_settle_runs_for(name)
            )
            if re_best < olo_s:
                olo_s, olo_med, olo_mean = re_best, re_med, re_mean
                olo_tail = re_tail
        mrow: dict = {
            "spark_store_lo_s": round(lo_s, 3),
            "spark_store_hi_s": round(store_s, 3),
            "oracle_lo_s": round(olo_s, 3),
            "oracle_hi_s": round(oracle_s, 3),
            "spark_lo_runs": st[name]["lo_runs"],
            "oracle_lo_runs": oc[name]["lo_runs"],
        }
        if store_s - lo_s <= 0 or oracle_s - olo_s <= 0:
            mrow.update(
                {
                    "spark_marginal_meps": None,
                    "oracle_marginal_meps": None,
                    "marginal_ratio": None,
                    "non_monotone": True,
                }
            )
        else:
            sp_marg = (store_s - lo_s) / d_ev
            or_marg = (oracle_s - olo_s) / d_ev
            mrow.update(
                {
                    "spark_marginal_meps": round(1 / sp_marg / 1e6, 1),
                    "oracle_marginal_meps": round(1 / or_marg / 1e6, 1),
                    "marginal_ratio": round(sp_marg / or_marg, 2),
                }
            )
        # median-based marginal (same non-monotone guard, same
        # honesty rule: null, never a clamped sentinel)
        if store_med - lo_med <= 0 or oracle_med - olo_med <= 0:
            mrow["marginal_ratio_median"] = None
        else:
            mrow["marginal_ratio_median"] = round(
                ((store_med - lo_med) / d_ev)
                / ((oracle_med - olo_med) / d_ev), 2
            )
        # tail-mean marginal — the DECLARED marginal statistic from
        # round 6 on (see _steady_state docstring: a difference of
        # best-of-N draws is biased and ~2x noisier than a difference
        # of tail means; with settle_runs=4 each mean averages 6
        # steady-state samples)
        store_mean, oracle_mean = st[name]["hi_mean"], oc[name]["hi_mean"]
        mrow["spark_store_lo_mean_s"] = lo_mean
        mrow["spark_store_hi_mean_s"] = store_mean
        mrow["oracle_lo_mean_s"] = olo_mean
        mrow["oracle_hi_mean_s"] = oracle_mean
        if store_mean - lo_mean <= 0 or oracle_mean - olo_mean <= 0:
            mrow["marginal_ratio_mean"] = None
        else:
            mrow["marginal_ratio_mean"] = round(
                (store_mean - lo_mean) / (oracle_mean - olo_mean), 2
            )
            # delta-method 95% CI on the ratio of mean-differences
            # (VERDICT r06 item 3: a point statistic that swung 50%
            # between same-day runs cannot certify a 0.1x margin — the
            # interval is now committed next to the bar).  Each input
            # mean carries se = stdev/sqrt(n) over its steady tail;
            # Var(num) = se_hi^2 + se_lo^2 per engine, and
            # se_r ~= |r| * sqrt(Var_num/num^2 + Var_den/den^2).
            import statistics as _stats

            def _se(tail):
                if len(tail) < 2:
                    return 0.0
                return _stats.stdev(tail) / len(tail) ** 0.5

            num = store_mean - lo_mean
            den = oracle_mean - olo_mean
            var_num = _se(st[name]["hi_tail"]) ** 2 + _se(
                st[name]["lo_tail"]
            ) ** 2
            var_den = _se(oc[name]["hi_tail"]) ** 2 + _se(olo_tail) ** 2
            r = num / den
            se_r = abs(r) * (
                var_num / num ** 2 + var_den / den ** 2
            ) ** 0.5
            mrow["marginal_ratio_mean_ci95"] = [
                round(r - 1.96 * se_r, 2), round(r + 1.96 * se_r, 2)
            ]
            mrow["marginal_tail_n"] = {
                "spark_hi": len(st[name]["hi_tail"]),
                "spark_lo": len(st[name]["lo_tail"]),
                "oracle_hi": len(oc[name]["hi_tail"]),
                "oracle_lo": len(olo_tail),
            }
        marginal[name] = mrow
        print(f"# marginal {name}: spark {mrow['spark_marginal_meps']}"
              f" Mev/s vs duckdb {mrow['oracle_marginal_meps']}"
              f" Mev/s = {mrow['marginal_ratio']}x best / "
              f"{mrow['marginal_ratio_mean']}x tail-mean",
              file=sys.stderr)
    out["marginal"] = marginal
    if ckpt:
        ckpt(out)  # all four baseline rows + marginals assembled
    # --- segmented-store B1 (VERDICT r07 item 1): three time-sliced
    # appends must keep the zero-scan merged-rollup tier — the row is
    # green when it matches the plain store's B1 rows and stays at
    # rollup latency (~0.1 s at 160M, not a scan) ---
    seg_store = _open_perf_segmented(spark, n_events)
    (segrows, seg_s, seg_runs, seg_med, seg_mean, seg_tail,
     seg_res) = time_spark(seg_store, B1_PROG, settle_runs=4)
    seg_match = sorted(tuple(r) for r in segrows) == sorted(
        tuple(r) for r in st["b1_count_foreach"]["rows"]
    )
    # zero-scan is asserted structurally, not inferred from latency:
    # the rollup answer is a local relation, so its input file set is
    # empty; any FileScan would list the segment parquet files
    seg_zero_scan = (
        engine.run(
            seg_store, B1_PROG, uuid_col="uuid", ts_col="timestamp",
            seq_col="seq",
        )
        .counters_df()
        .inputFiles()
        == []
    )
    out["b1_store_segmented"] = {
        "spark_store_s": round(seg_s, 3),
        "spark_store_median_s": seg_med,
        "spark_store_median_ci": _median_ci(seg_tail),
        "runs": seg_runs,
        "match_plain_store": seg_match,
        "zero_scan": seg_zero_scan,
        "steal_pct": seg_res.steal_pct,
    }
    print(
        f"# segmented-store B1: {seg_s:.3f}s best / {seg_med:.3f}s "
        f"median {seg_runs} (match={seg_match})",
        file=sys.stderr,
    )
    _gc()
    if ckpt:
        ckpt(out)

    # --- HLL uniques through the segmented store (VERDICT r08 item 1):
    # `yield cookie to ^uniq` per advertisable_eid answers entirely from
    # the manifest's cookie sketches (register-max merged across the
    # three segments) — zero Spark work, asserted structurally by the
    # result-set type, value-checked against DuckDB's exact
    # count(DISTINCT uuid) within the sketch's error envelope ---
    HLL_PROG = """
foreach %aeid
    start ->
        receive
            advertisable_eid = %aeid -> yield cookie to ^uniq, repeat
            * -> repeat
"""
    from trck_spark.engine import TrckLocalResultSet
    from trck_spark.fsm.hll import hll_from_hex

    hll_box: dict = {}

    def one_hll():
        t0 = time.time()
        rs = engine.run(
            seg_store, HLL_PROG, uuid_col="uuid", ts_col="timestamp",
            seq_col="seq",
        )
        hll_box["rs"] = rs
        hll_box["out"] = rs.collect_json()
        return time.time() - t0

    h_res = _steady_state(one_hll, settle_runs=4)
    h_s, h_runs, h_med, _h_mean, h_tail = h_res
    hll_oracle_rows: list = []

    def one_hll_oracle():
        t0 = time.time()
        hll_oracle_rows[:] = con.execute(
            "SELECT advertisable_eid, count(DISTINCT uuid)::BIGINT "
            "FROM perf GROUP BY 1"
        ).fetchall()
        return time.time() - t0

    oh_s, oh_runs, oh_med, _oh_mean, oh_tail = _steady_state(
        one_hll_oracle, settle_runs=4
    )
    exact_u = {r[0]: int(r[1]) for r in hll_oracle_rows}
    max_rel_err = 0.0
    for r in hll_box["out"]:
        ex = exact_u.get(r["%aeid"], 0)
        hexs = r.get("^uniq")
        est = hll_from_hex(hexs).estimate() if hexs else 0.0
        if ex == 0:
            if est != 0:
                max_rel_err = float("inf")
        else:
            max_rel_err = max(max_rel_err, abs(est - ex) / ex)
    out["b_hll_store_segmented"] = {
        "spark_store_s": round(h_s, 3),
        "spark_store_median_s": h_med,
        "spark_store_median_ci": _median_ci(h_tail),
        "runs": h_runs,
        "oracle_s": round(oh_s, 3),
        "oracle_median_s": oh_med,
        "oracle_median_ci": _median_ci(oh_tail),
        "oracle_runs": oh_runs,
        "ratio_store_median": round(h_med / oh_med, 2),
        "zero_scan": isinstance(hll_box["rs"], TrckLocalResultSet),
        "values": len(exact_u),
        # p=14 envelope: sigma ~0.81% raw; bias-corrected/linear-counting
        # regimes are tighter.  4% (~5 sigma) over 100 values => a drifted
        # sketch fails, an honest one essentially never does
        "max_rel_err": round(max_rel_err, 5),
        "match": max_rel_err <= 0.04,
        "steal_pct": h_res.steal_pct,
    }
    print(
        f"# hll-store uniques: {h_s:.3f}s best / {h_med:.3f}s median "
        f"vs oracle {oh_med:.3f}s = {h_med / oh_med:.2f}x "
        f"(max_rel_err={max_rel_err:.4f}, "
        f"zero_scan={out['b_hll_store_segmented']['zero_scan']})",
        file=sys.stderr,
    )
    _gc()
    if ckpt:
        ckpt(out)

    # --- TIME-BOUNDED uniques through the segmented store (round 9):
    # "uniques up to T" with T inside the newest segment — the first
    # two segments answer from their manifest sketches (zero scan),
    # ONLY the newest segment scans, merged by register max
    # (engine._run_ts_scoped_hll).  The oracle pays a full-history
    # bounded count-distinct every time; the engine's scan cost stays
    # proportional to the boundary slice no matter how much history
    # accumulates — the 100 TB incremental-uniques shape. ---
    parts_meta = seg_store._trailstore_manifest["parts"]
    t_hi = (
        int(parts_meta[2]["ts_min"]) + int(parts_meta[2]["ts_max"])
    ) // 2
    HLL_TS_PROG = f"""
foreach %aeid
    start ->
        receive
            advertisable_eid = %aeid, timestamp < {t_hi} -> yield cookie to ^uniq, repeat
            * -> repeat
"""
    hts_box: dict = {}

    def one_hll_ts():
        t0 = time.time()
        rs = engine.run(
            seg_store, HLL_TS_PROG, uuid_col="uuid", ts_col="timestamp",
            seq_col="seq",
        )
        hts_box["rs"] = rs
        hts_box["out"] = rs.collect_json()
        return time.time() - t0

    hts_res = _steady_state(one_hll_ts, settle_runs=2)
    hts_s, hts_runs, hts_med, _m, hts_tail = hts_res
    hts_oracle_rows: list = []

    def one_hll_ts_oracle():
        t0 = time.time()
        hts_oracle_rows[:] = con.execute(
            "SELECT advertisable_eid, count(DISTINCT CASE WHEN "
            f"timestamp < {t_hi} THEN uuid END)::BIGINT "
            "FROM perf GROUP BY 1"
        ).fetchall()
        return time.time() - t0

    ohts_s, ohts_runs, ohts_med, _m2, ohts_tail = _steady_state(
        one_hll_ts_oracle, settle_runs=2
    )
    exact_uts = {r[0]: int(r[1]) for r in hts_oracle_rows}
    max_rel_err_ts = 0.0
    for r in hts_box["out"]:
        ex = exact_uts.get(r["%aeid"], 0)
        hexs = r.get("^uniq")
        est = hll_from_hex(hexs).estimate() if hexs else 0.0
        if ex == 0:
            if est != 0:
                max_rel_err_ts = float("inf")
        else:
            max_rel_err_ts = max(max_rel_err_ts, abs(est - ex) / ex)
    scope = getattr(hts_box["rs"], "_ts_scope", {})
    out["b_hll_store_ts"] = {
        "spark_store_s": round(hts_s, 3),
        "spark_store_median_s": hts_med,
        "spark_store_median_ci": _median_ci(hts_tail),
        "runs": hts_runs,
        "oracle_s": round(ohts_s, 3),
        "oracle_median_s": ohts_med,
        "oracle_median_ci": _median_ci(ohts_tail),
        "oracle_runs": ohts_runs,
        "ratio_store_median": round(hts_med / ohts_med, 2),
        "covered_parts": scope.get("covered_parts"),
        "boundary_parts": scope.get("boundary_parts"),
        "boundary_plan": scope.get("boundary_plan"),
        "values": len(exact_uts),
        "max_rel_err": round(max_rel_err_ts, 5),
        "match": max_rel_err_ts <= 0.04,
        "no_plateau": hts_res.no_plateau,
        "steal_pct": hts_res.steal_pct,
    }
    print(
        f"# hll-store ts-bounded uniques: {hts_s:.3f}s best / "
        f"{hts_med:.3f}s median vs oracle {ohts_med:.3f}s = "
        f"{hts_med / ohts_med:.2f}x (covered={scope.get('covered_parts')}, "
        f"boundary={scope.get('boundary_parts')}, "
        f"max_rel_err={max_rel_err_ts:.4f})",
        file=sys.stderr,
    )
    _gc()
    if ckpt:
        ckpt(out)

    # --- PRODUCTION-CADENCE ts-bounded uniques (VERDICT r09 item 3):
    # thin newest segment (~2% of events) over deep covered history —
    # the one-tdb-per-period ingestion shape the tier exists for.  The
    # three history segments answer from manifest sketches; only the
    # thin segment scans (JVM __hll_rr plan), so the engine's cost is
    # proportional to the period sliver while the oracle rescans the
    # full history every time. ---
    thin_store = _open_perf_segmented_thin(spark, n_events)
    parts_thin = thin_store._trailstore_manifest["parts"]
    t_thin = (
        int(parts_thin[-1]["ts_min"]) + int(parts_thin[-1]["ts_max"])
    ) // 2
    HLL_TS_THIN_PROG = f"""
foreach %aeid
    start ->
        receive
            advertisable_eid = %aeid, timestamp < {t_thin} -> yield cookie to ^uniq, repeat
            * -> repeat
"""
    htn_box: dict = {}

    def one_hll_thin():
        t0 = time.time()
        rs = engine.run(
            thin_store, HLL_TS_THIN_PROG, uuid_col="uuid",
            ts_col="timestamp", seq_col="seq",
        )
        htn_box["rs"] = rs
        htn_box["out"] = rs.collect_json()
        return time.time() - t0

    htn_res = _steady_state(one_hll_thin, settle_runs=2)
    htn_s, htn_runs, htn_med, _m3, htn_tail = htn_res
    htn_oracle_rows: list = []

    def one_hll_thin_oracle():
        t0 = time.time()
        htn_oracle_rows[:] = con.execute(
            "SELECT advertisable_eid, count(DISTINCT CASE WHEN "
            f"timestamp < {t_thin} THEN uuid END)::BIGINT "
            "FROM perf GROUP BY 1"
        ).fetchall()
        return time.time() - t0

    ohtn_s, ohtn_runs, ohtn_med, _m4, ohtn_tail = _steady_state(
        one_hll_thin_oracle, settle_runs=2
    )
    exact_utn = {r[0]: int(r[1]) for r in htn_oracle_rows}
    max_rel_err_tn = 0.0
    for r in htn_box["out"]:
        ex = exact_utn.get(r["%aeid"], 0)
        hexs = r.get("^uniq")
        est = hll_from_hex(hexs).estimate() if hexs else 0.0
        if ex == 0:
            if est != 0:
                max_rel_err_tn = float("inf")
        else:
            max_rel_err_tn = max(max_rel_err_tn, abs(est - ex) / ex)
    scope_tn = getattr(htn_box["rs"], "_ts_scope", {})
    out["b_hll_store_ts_thin"] = {
        "spark_store_s": round(htn_s, 3),
        "spark_store_median_s": htn_med,
        "spark_store_median_ci": _median_ci(htn_tail),
        "runs": htn_runs,
        "oracle_s": round(ohtn_s, 3),
        "oracle_median_s": ohtn_med,
        "oracle_median_ci": _median_ci(ohtn_tail),
        "oracle_runs": ohtn_runs,
        "ratio_store_median": round(htn_med / ohtn_med, 2),
        "covered_parts": scope_tn.get("covered_parts"),
        "boundary_parts": scope_tn.get("boundary_parts"),
        "boundary_plan": scope_tn.get("boundary_plan"),
        "values": len(exact_utn),
        "max_rel_err": round(max_rel_err_tn, 5),
        "match": max_rel_err_tn <= 0.04,
        "no_plateau": htn_res.no_plateau,
        "steal_pct": htn_res.steal_pct,
    }
    print(
        f"# hll-store ts-bounded uniques (thin boundary): {htn_s:.3f}s "
        f"best / {htn_med:.3f}s median vs oracle {ohtn_med:.3f}s = "
        f"{htn_med / ohtn_med:.2f}x "
        f"(covered={scope_tn.get('covered_parts')}, "
        f"boundary={scope_tn.get('boundary_parts')}, "
        f"plan={scope_tn.get('boundary_plan')}, "
        f"max_rel_err={max_rel_err_tn:.4f})",
        file=sys.stderr,
    )
    _gc()
    if ckpt:
        ckpt(out)

    out["total"] = {
        "spark_store_s": round(tot["spark_store_s"], 3),
        "oracle_s": round(tot["oracle_s"], 3),
        "ratio_store": round(tot["spark_store_s"] / tot["oracle_s"], 2),
        "spark_store_median_s": round(tot["spark_store_med"], 3),
        "oracle_median_s": round(tot["oracle_med"], 3),
        "ratio_store_median": round(
            tot["spark_store_med"] / tot["oracle_med"], 2
        ),
    }
    out["marginal"] = marginal
    out["b3_trails_per_sec"] = round(
        out["trails"] / out["b1_count_foreach"]["spark_store_s"], 1
    )
    out["b3_events_per_sec"] = round(
        n_events / out["b1_count_foreach"]["spark_store_s"], 1
    )
    return out


def run_flat_block(spark, gate_out: dict) -> None:
    """Time the FLAT-parquet layout for every gate query and patch the
    numbers into ``gate_out`` — the motivation column (what every trail
    query costs without the TrailStore layout: a full 160M-row
    repartition + window sort each).  Runs LAST in the suite because
    those sorts leave the JVM heap/page cache degraded for whatever
    follows."""
    from trck_spark import queries as Q
    from trck_spark.engine import TrckSparkEngine

    n_events = gate_out["events"]
    flat, _store, _path = _open_perf(spark, n_events)
    engine = TrckSparkEngine(spark)
    _gc = spark.sparkContext._jvm.System.gc
    tot_flat = 0.0
    for name, (prog_ref, _sql) in BASELINE_DEFS.items():
        prog = prog_ref if prog_ref.startswith("\n") else getattr(Q, prog_ref)

        def one():
            t0 = time.time()
            engine.run(
                flat, prog, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq",
            ).counters_df().collect()
            return time.time() - t0

        f_s, f_runs, f_med, _f_mean, _f_tail = _steady_state(one)
        _gc()
        row = gate_out[name]
        row["spark_s"] = round(f_s, 3)
        row["ratio"] = (
            round(f_s / row["oracle_s"], 2) if row["oracle_s"] else None
        )
        row["spark_median_s"] = f_med
        row["ratio_median"] = (
            round(f_med / row["oracle_median_s"], 2)
            if row.get("oracle_median_s") else None
        )
        row["spark_flat_runs"] = f_runs
        tot_flat += f_s
        print(f"# flat {name}: {f_s:.3f}s med {f_med:.3f}s {f_runs}",
              file=sys.stderr)
    gate_out["total"]["spark_s"] = round(tot_flat, 3)
    gate_out["total"]["ratio"] = round(
        tot_flat / gate_out["total"]["oracle_s"], 2
    )


def run_fsm_path_bench(spark, prog: str = B1_PROG,
                       n_events: int = 20_000_000) -> dict:
    """`prog` on the GENERAL FSM path (TRCK_SPARK_NO_FASTPATH): the
    mapInPandas interpreter with occurring/non-occurring grid pruning —
    the reference's whole perf story is the pruned FSM
    (match_traildb.c:653-744); this records our pruned-FSM events/s and
    the pruning telemetry (fsm_runs per trail vs grid size) at a fixed
    20M-event workload.  Uses the TrailStore layout (no shuffle before
    the interpreter).  B1_PROG exercises the ~100-value
    implicit-foreach grid; PROG_FUNNEL (B2) exercises the `after`
    window/timeout machinery — the FSM's actual hot loop."""
    from trck_spark.engine import TrckSparkEngine

    _, store, _ = _open_perf(spark, n_events)
    engine = TrckSparkEngine(spark)
    os.environ["TRCK_SPARK_NO_FASTPATH"] = "1"
    try:
        best, telem, n_tuples = None, {}, 0
        for i in range(2):  # warm-up python workers, then one timed run
            t0 = time.time()
            rs = engine.run(
                store, prog, uuid_col="uuid",
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

    # the perf files are uuid-partitioned, not time-ordered: each
    # micro-batch covers the FULL time range for a uuid slice, so the
    # watermark delay must exceed the dataset's ~27h event-time span or
    # every batch after the first is dropped as late
    def one():
        counts["sessions"] = 0
        t0 = time.time()
        q = (
            streaming_session_features(sdf, delay="48 hours")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(1200)
        dt = time.time() - t0
        if not finished:
            q.stop()
        return dt, finished

    # same settle + median treatment as the gate queries (VERDICT r06
    # item 8: a single-run streaming number had no steady-state
    # protocol, so a ~15% drift was unattributable)
    _STEAL_SAMPLER.start()
    t_steal0 = time.time()
    runs: list[float] = []
    for i in range(3):
        dt, finished = one()
        if not finished:
            # timed out: events processed is NOT n_events — report the
            # failure instead of a fabricated throughput (round-3 ADVICE)
            return {
                "events": n_events,
                "seconds": round(dt, 3),
                "error": "timeout after 1200s (partial run, no throughput)",
                "sessions_emitted": counts["sessions"],
            }
        runs.append(round(dt, 3))
        if i < 2:
            _settle("between streaming runs", max_wait=60)
    import statistics

    med = round(statistics.median(runs), 3)
    return {
        "events": n_events,
        "seconds": min(runs),
        "seconds_median": med,
        "runs": runs,
        "events_per_sec": round(n_events / min(runs), 1),
        "events_per_sec_median": round(n_events / med, 1),
        "sessions_emitted": counts["sessions"],
        "steal_pct": _STEAL_SAMPLER.window(t_steal0, time.time()),
    }


def run_streaming_window_bench(spark, n_events: int = 20_000_000) -> dict:
    """Streaming throughput WITH a window-file side input active
    (VERDICT r05 item 8): the 20M-event perf dataset streamed through
    ``streaming_partials`` with a window_df covering every trail plus a
    second bounded entry for every 10th uuid — so the stream-static
    join, the per-(original uuid, entry) state keys, and the multi-
    entry fan-out all sit on the timed path.  The emitted counter total
    is checked against two batch SQL counts over the same parquet (the
    full-range entries see every click; the sub-range entries see the
    clicks inside their bounds), so the number is value-checked, not
    just a stopwatch."""
    from pyspark.sql import functions as F

    from trck_spark.streaming import streaming_partials

    path, _ = _perf_paths(n_events)
    schema = spark.read.parquet(path).schema
    n_cookies = n_events // 200  # benchdata: N_EVENTS per cookie
    w_df = (
        spark.range(n_cookies)
        .selectExpr(
            "concat('u', id) AS uuid",
            "CAST(0 AS LONG) AS s",
            "CAST(2000000 AS LONG) AS e",
        )
        .union(
            spark.range(0, n_cookies, 10).selectExpr(
                "concat('u', id) AS uuid",
                "CAST(1010000 AS LONG) AS s",
                "CAST(1020000 AS LONG) AS e",
            )
        )
    )
    prog = """
start ->
    receive
        event_type = "click" -> yield $clicks, repeat
        * -> repeat
"""
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )
    parts = streaming_partials(
        sdf, prog, uuid_col="uuid", ts_col="timestamp", seq_col="seq",
        window_df=w_df,
    )
    got = {"clicks": 0, "rows": 0}

    def sink(batch_df, _bid):
        row = batch_df.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("s"),
            F.count(F.lit(1)).alias("c"),
        ).collect()[0]
        got["clicks"] += int(row["s"])
        got["rows"] += int(row["c"])

    def one():
        got["clicks"] = 0
        got["rows"] = 0
        t0 = time.time()
        q = (
            parts.writeStream.foreachBatch(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(1200)
        dt = time.time() - t0
        if not finished:
            q.stop()
        return dt, finished

    _STEAL_SAMPLER.start()
    t_steal0 = time.time()
    runs: list[float] = []
    for i in range(3):
        dt, finished = one()
        if not finished:
            return {
                "events": n_events, "seconds": round(dt, 3),
                "error": "timeout after 1200s (partial run, no throughput)",
            }
        runs.append(round(dt, 3))
        if i < 2:
            _settle("between streaming-window runs", max_wait=60)
    t_steal1 = time.time()
    ev = spark.read.parquet(path)
    expected = ev.filter(F.col("event_type") == "click").count()
    expected += (
        ev.filter(
            (F.col("event_type") == "click")
            & (F.col("timestamp") >= 1_010_000)
            & (F.col("timestamp") < 1_020_000)
            & (F.expr("CAST(substring(uuid, 2) AS LONG)") % 10 == 0)
        ).count()
    )
    import statistics

    med = round(statistics.median(runs), 3)
    return {
        "events": n_events,
        "window_entries": n_cookies + n_cookies // 10,
        "seconds": min(runs),
        "seconds_median": med,
        "runs": runs,
        "events_per_sec": round(n_events / min(runs), 1),
        "events_per_sec_median": round(n_events / med, 1),
        "clicks": got["clicks"],
        "expected_clicks": expected,
        "clicks_match": got["clicks"] == expected,
        "steal_pct": _STEAL_SAMPLER.window(t_steal0, t_steal1),
    }


def run_streaming_uniques_bench(spark, n_events: int = 20_000_000) -> dict:
    """Streaming incremental-uniques throughput (VERDICT r09 item 5):
    the 20M-event perf dataset replayed as a file stream through
    ``streaming_uniques`` — per-advertisable_eid ``yield cookie to
    ^uniq`` with the ~100-value foreach grid — so the stateful FSM step
    AND the downstream register-max aggregation state (tuples x 16384
    keys) both sit on the timed path.  Value-checked: the collected
    sketches' estimates must sit inside the p=14 envelope of the exact
    per-value count(DISTINCT uuid) over the same parquet."""
    from pyspark.sql import functions as F

    from trck_spark.fsm.hll import Hll
    from trck_spark.streaming import HllStreamCollector, streaming_uniques

    path, _ = _perf_paths(n_events)
    ev = spark.read.parquet(path)
    schema = ev.schema
    values = [
        r[0]
        for r in ev.select("advertisable_eid").distinct().collect()
        if r[0]
    ]
    prog = """
foreach %aeid
    start ->
        receive
            advertisable_eid = %aeid -> yield cookie to ^uniq, repeat
            * -> repeat
"""
    colls: list[HllStreamCollector] = []

    def one():
        coll = HllStreamCollector()
        colls.append(coll)
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(path)
        )
        t0 = time.time()
        q = (
            streaming_uniques(
                sdf, prog, uuid_col="uuid", ts_col="timestamp",
                seq_col="seq", foreach_values=sorted(values),
            )
            .writeStream.foreachBatch(lambda bdf, _b: coll.update(bdf))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(1200)
        dt = time.time() - t0
        if not finished:
            q.stop()
        return dt, finished

    _STEAL_SAMPLER.start()
    t_steal0 = time.time()
    runs: list[float] = []
    for i in range(3):
        dt, finished = one()
        if not finished:
            return {
                "events": n_events,
                "seconds": round(dt, 3),
                "error": "timeout after 1200s (partial run, no throughput)",
            }
        runs.append(round(dt, 3))
        if i < 2:
            _settle("between streaming-uniques runs", max_wait=60)
    t_steal1 = time.time()
    # value check on the last run's collector
    exact = {
        r[0]: int(r[1])
        for r in ev.groupBy("advertisable_eid")
        .agg(F.countDistinct("uuid"))
        .collect()
        if r[0]
    }
    coll = colls[-1]
    # tuple order must mirror the streaming step's own grid exactly
    # (foreach_tuples over the program, NOT a plain sorted(values) —
    # implicit grids densify an "" row at a fixed position)
    from trck_spark.params import foreach_tuples
    from trck_spark.runner import TrckQuery

    tuples = foreach_tuples(
        TrckQuery(prog).program, None, lexicon_values=sorted(values)
    )
    max_rel_err = 0.0
    for ti, tup in enumerate(tuples):
        v = tup[0]
        ex = exact.get(v, 0)
        est = coll.estimate(ti, "^uniq")
        if ex:
            max_rel_err = max(max_rel_err, abs(est - ex) / ex)
        elif est:
            max_rel_err = float("inf")
    import statistics

    med = round(statistics.median(runs), 3)
    return {
        "events": n_events,
        "grid_values": len(values),
        "seconds": min(runs),
        "seconds_median": med,
        "runs": runs,
        "events_per_sec": round(n_events / min(runs), 1),
        "events_per_sec_median": round(n_events / med, 1),
        "max_rel_err": round(max_rel_err, 5),
        "match": max_rel_err <= 0.04,
        "steal_pct": _STEAL_SAMPLER.window(t_steal0, t_steal1),
    }


def run_gate_suite(out_path: str | None = None) -> dict:
    """Everything that needs the 48g heap / 160M dataset, in one
    process: baseline gate, marginal gate, FSM-path benches (B1
    counter grid + B2 funnel window), streaming sessionization.

    Every completed block is CHECKPOINTED to ``out_path`` (atomic
    tmp+rename) the moment it finishes — round 9's driver timeout
    destroyed ~35 minutes of already-measured gate bars because the
    artifact was written only at the end (VERDICT r09 item 1a).  A
    partial artifact carries ``status: partial``; the parent flips it
    to ``gate_complete`` semantics by later blocks (flat/pair) that
    patch it in place.

    The pair-scale family does NOT run here anymore: it is the single
    most expensive block (~37 min at 3 runs) and its death must not be
    able to take the gate artifact down with it (VERDICT r09 item 1b)
    — the parent runs it as its own fresh-JVM ``--pair`` child, last."""
    from trck_spark.session import get_spark

    spark = get_spark("trck_spark_gate")
    spark.sparkContext.setLogLevel("ERROR")
    # contention attribution: a loaded box (orphan JVMs, concurrent
    # test runs) shows up here, so a slow artifact is inspectable
    load0 = [round(x, 2) for x in os.getloadavg()]
    out: dict = {"status": "partial"}

    def ckpt(baseline_partial: dict | None = None):
        if not out_path:
            return
        snap = dict(out)
        if baseline_partial is not None:
            snap.update(baseline_partial)
        _atomic_write_json(out_path, snap)

    try:
        base = run_baseline_gate(spark, ckpt=ckpt)
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {e}"
        ckpt()
        return out
    out.update(base)
    out["loadavg_at_start"] = load0
    out["loadavg_after_baseline"] = [
        round(x, 2) for x in os.getloadavg()
    ]
    ckpt()
    for key, prog_name in (("b1_fsm_path", B1_PROG), ("b2_fsm_path", None)):
        try:
            if prog_name is None:
                from trck_spark import queries as Q

                prog_name = Q.PROG_FUNNEL
            out[key] = run_fsm_path_bench(spark, prog_name)
            print(f"# {key}: {out[key]}", file=sys.stderr)
        except Exception as e:
            out[key] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# {key} failed: {e}", file=sys.stderr)
        ckpt()
    try:
        out["streaming"] = run_streaming_bench(spark, _stream_events())
        print(f"# streaming sessionization: {out['streaming']}",
              file=sys.stderr)
    except Exception as e:
        out["streaming"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# streaming bench failed: {e}", file=sys.stderr)
    ckpt()
    try:
        out["streaming_window"] = run_streaming_window_bench(
            spark, _stream_events()
        )
        print(f"# streaming with window file: {out['streaming_window']}",
              file=sys.stderr)
    except Exception as e:
        out["streaming_window"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# streaming window bench failed: {e}", file=sys.stderr)
    ckpt()
    try:
        out["streaming_uniques"] = run_streaming_uniques_bench(
            spark, _stream_events()
        )
        print(f"# streaming uniques: {out['streaming_uniques']}",
              file=sys.stderr)
    except Exception as e:
        out["streaming_uniques"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# streaming uniques bench failed: {e}", file=sys.stderr)
    # NOTE: neither the flat block nor the pair-scale family runs here.
    # Flat: round 6 showed the converse contamination (fragmented 48g
    # heap after the grown suite degraded flat B1 6x, then OOM'd).
    # Pair-scale: round 9's timeout post-mortem (VERDICT r09 item 1b).
    # Both run as their own fresh-JVM children that PATCH the artifact.
    out["status"] = "gate_complete"
    ckpt()
    return out


def run_pair_scale_bench(spark, n_docs: int = 5_000_000,
                         ckpt=None) -> dict:
    """Dedup pair family at a scale where the O(candidates) terms
    dominate (VERDICT r04 item 6): minhash_lsh_pairs, simhash_pairs,
    embedding_near_dup_pairs (on a planted n_docs/5 vector corpus),
    dedup_clusters and dedup_apply end-to-end over a generated
    ``n_docs`` corpus with
    planted exact/near duplicates and a boilerplate hot-shingle flood
    (trck_spark.benchdata.ensure_docs_dataset — ground truth returned
    by the generator, asserted here, so this is a value-checked bench,
    not just a stopwatch).

    Reports per-operator wallclock + docs/s, the band-collision
    candidate count vs verified pair count, planted-pair recall
    (minhash is probabilistic by construction: ~87% expected at the
    planted J~0.5 under 32x4 banding; the ngram path behind
    dedup_clusters/apply is exact and must find every planted dup),
    and survivors vs planted ground truth.  Each operator's wallclock
    is the MEDIAN of TRCK_SPARK_PAIR_RUNS (default 3) timed runs with a
    settle-wait between them and the full run list committed (VERDICT
    r08 item 3: best-of-1 swung 1.4-2x between the committed and driver
    signals, so a real regression in the scale family was invisible);
    recall/survivor diagnostics run once on the final run's lineage.
    Fingerprints are intentionally NOT shared across operators (each
    timing is the full end-to-end cost)."""
    import statistics as _stats
    import time as _t

    from pyspark.sql import functions as F

    from trck_spark.benchdata import ensure_docs_dataset
    from trck_spark.pipeline import dedup as _dd

    _gc = spark.sparkContext._jvm.System.gc
    n_runs = max(1, int(os.environ.get("TRCK_SPARK_PAIR_RUNS", "3")))

    def _timed(label, mk, action):
        """Median-of-n timing: build the frame fresh each run, execute
        `action(frame)` as the timed materialization, release between
        runs.  Returns (runs, median, last_frame, last_action_result) —
        the last frame stays unreleased for the caller's untimed
        diagnostics.

        Adaptive degrade (VERDICT r11 item 7): after the first run, a
        repeat is attempted only while the remaining budget can hold
        another run of the measured cost (x1.5 + settle/diagnostic
        slack) — so the parent can ask for 3-run medians whenever a
        first pass fits, and an operator that would blow the budget
        stops early WITH its completed run list committed instead of
        the whole family degrading to best-of-1 up front."""
        runs: list[float] = []
        frame = result = None
        for i in range(n_runs):
            if frame is not None:
                if _remaining() - _FINAL_RESERVE_S < runs[-1] * 1.5 + 180:
                    print(
                        f"# pair {label}: stopping at {len(runs)} "
                        f"run(s) ({_remaining():.0f}s budget left)",
                        file=sys.stderr,
                    )
                    break
                _dd.release(frame)
                _settle(f"between {label} runs", max_wait=120)
            t0 = _t.time()
            frame = mk()
            result = action(frame)
            runs.append(round(_t.time() - t0, 1))
            print(
                f"# pair {label} run {i + 1}/{n_runs}: {runs[-1]}s",
                file=sys.stderr,
            )
        return runs, round(_stats.median(runs), 1), frame, result

    path = os.path.join(_CACHE_DIR, f"docs_{n_docs}")
    t0 = _t.time()
    truth = ensure_docs_dataset(spark, path, n_docs=n_docs)
    out: dict = {"n_docs": n_docs, "gen_s": round(_t.time() - t0, 1),
                 "truth": truth,
                 "statistic": f"median of {n_runs} runs, run lists "
                              "committed per operator"}

    def _ck():
        # per-operator durability: a kill mid-family keeps every
        # completed operator's medians in the artifact (r09 item 1)
        if ckpt:
            ckpt(dict(out))
    near_lo, orig_hi = truth["near_lo"], truth["orig_hi"]

    # --- simhash at candidate-dominated scale (VERDICT r05 item 5):
    # exact dups have hamming 0 and identical fingerprints, so the
    # 6-choose-3 multi-index MUST find every one (pigeonhole — a hard
    # 1.0 bar); planted near dups swap 3 of 30 words, whose hamming is
    # signal-dependent, so that slice is reported, not gated.
    sh_runs, el, sh, n_sh_pairs = _timed(
        "simhash",
        lambda: _dd.simhash_pairs(
            spark, path, max_hamming=3, log_dropped=True
        ),
        lambda f: f.count(),
    )
    sh_cands = sh._trck_candidates.count()
    sh_dropped = (
        sh._trck_dropped_buckets.count()
        if sh._trck_dropped_buckets is not None else 0
    )
    sh_exact = sh.filter(
        (F.col("b") >= orig_hi) & (F.col("b") < near_lo)
        & (F.col("a") == F.col("b") - orig_hi)
    ).count()
    sh_near = sh.filter(
        (F.col("b") >= near_lo) & (F.col("a") == F.col("b") - near_lo)
    ).count()
    _dd.release(sh)
    out["simhash_pairs"] = {
        "s": el, "runs": sh_runs, "docs_per_s": int(n_docs / el),
        "n_pairs": n_sh_pairs, "n_candidates": sh_cands,
        "dropped_buckets": sh_dropped,
        "exact_recall": round(sh_exact / max(truth["n_exact"], 1), 4),
        "exact_recall_meets_bar": sh_exact == truth["n_exact"],
        "near_found": sh_near,
    }
    _gc()
    _ck()

    # --- embedding near-dup at scale (VERDICT r05 item 5): a planted
    # 1M-vector corpus (n_docs/5, dim 64).  Exact-duplicate vectors
    # collide in EVERY hyperplane band and verify at cosine 1.0, so
    # that slice is a hard 1.0 bar; near dups (one coordinate
    # replaced, cosine ~0.98) are LSH-probabilistic and reported.
    # 8 bands x 20 planes keeps random-pair collisions ~1e-5 while
    # detecting cosine-0.98 pairs with p ~ 0.95.
    from trck_spark.benchdata import ensure_embeddings_dataset

    n_vecs = max(n_docs // 5, 1_000)
    t0 = _t.time()
    etruth = ensure_embeddings_dataset(spark, path, n_vecs=n_vecs)
    out["emb_gen_s"] = round(_t.time() - t0, 1)
    e_near_lo, e_orig_hi = etruth["near_lo"], etruth["orig_hi"]
    ep_runs, el, ep, n_ep = _timed(
        "embedding",
        lambda: _dd.embedding_near_dup_pairs(
            spark, path, threshold=0.9, n_bands=8, band_planes=20,
            log_dropped=True,
        ),
        lambda f: f.count(),
    )
    ep_cands = ep._trck_candidates.count()
    ep_dropped = (
        ep._trck_dropped_buckets.count()
        if ep._trck_dropped_buckets is not None else 0
    )
    ep_exact = ep.filter(
        (F.col("b") >= e_orig_hi) & (F.col("b") < e_near_lo)
        & (F.col("a") == F.col("b") - e_orig_hi)
    ).count()
    ep_near = ep.filter(
        (F.col("b") >= e_near_lo)
        & (F.col("a") == F.col("b") - e_near_lo)
    ).count()
    _dd.release(ep)
    out["embedding_near_dup_pairs"] = {
        "n_vecs": n_vecs, "s": el, "runs": ep_runs,
        "vecs_per_s": int(n_vecs / el),
        "n_pairs": n_ep, "n_candidates": ep_cands,
        "dropped_buckets": ep_dropped,
        "exact_recall": round(ep_exact / max(etruth["n_exact"], 1), 4),
        "exact_recall_meets_bar": ep_exact == etruth["n_exact"],
        "near_recall": round(ep_near / max(etruth["n_near"], 1), 4),
    }
    _gc()
    _ck()

    cl_runs, el, cl, agg = _timed(
        "clusters",
        lambda: _dd.dedup_clusters(spark, path, threshold=0.2),
        lambda f: f.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                (F.col("cluster_size") > 1).cast("long")
            ).alias("dup_docs"),
        ).collect()[0],
    )
    _dd.release(cl)
    out["dedup_clusters"] = {
        "s": el, "runs": cl_runs, "docs_per_s": int(n_docs / el),
        "rows": agg["rows"],
        "docs_in_dup_clusters": agg["dup_docs"],
        # exact path: every planted duplicate must be clustered with
        # its base -> base+dup docs all sit in size>1 clusters
        "expected_min_dup_docs": truth["n_duplicates"],
    }
    _gc()
    _ck()

    ap_runs, el, ap, n_surv = _timed(
        "apply",
        lambda: _dd.dedup_apply(spark, path, threshold=0.2),
        lambda f: f.count(),
    )
    _dd.release(ap)
    expected = n_docs - truth["n_duplicates"]
    out["dedup_apply"] = {
        "s": el, "runs": ap_runs, "docs_per_s": int(n_docs / el),
        "survivors": n_surv, "expected_survivors": expected,
        "survivors_match": n_surv == expected,
    }
    _gc()
    _ck()

    # minhash runs LAST of the pair blocks (cheapest-first order,
    # VERDICT r10 item 2/5): it is the most expensive operator, and a
    # driver kill landing mid-family should cost the artifact ONE row,
    # not every row behind it
    mh_runs, el, pairs, n_pairs = _timed(
        "minhash",
        lambda: _dd.minhash_lsh_pairs(
            spark, path, threshold=0.2, log_dropped=True
        ),
        lambda f: f.count(),
    )
    # untimed diagnostics on the same lineage
    n_cands = pairs._trck_candidates.count()
    dropped = pairs._trck_dropped_buckets
    n_dropped = dropped.count() if dropped is not None else 0
    found_near = pairs.filter(
        (F.col("b") >= near_lo) & (F.col("a") == F.col("b") - near_lo)
    ).count()
    found_exact = pairs.filter(
        (F.col("b") >= orig_hi) & (F.col("b") < near_lo)
        & (F.col("a") == F.col("b") - orig_hi)
    ).count()
    _dd.release(pairs)
    # The recall BAR is banding theory minus 3 sigma (VERDICT r05
    # item 4): the planted near pairs perturb 9 of 28 3-gram shingles
    # per side (generator positions 7/17/27), so J = 19/37 exactly, and
    # 32x4 banding detects with p = 1 - (1 - J^4)^32 ~= 0.9003 — the
    # measured 0.8999 of round 5 was theory, not a defect.  The bar is
    # the binomial 3-sigma floor under that p at n_near trials; a fixed
    # "0.9" bar was the round-4 wording accident this replaces.
    import math

    n_words, pert_pos = 30, (7, 17, 27)  # ensure_docs_dataset defaults
    n_sh = n_words - 2
    pert = {
        s for p in pert_pos for s in range(p - 2, p + 1)
        if 0 <= s <= n_words - 3
    }
    j_planted = (n_sh - len(pert)) / (n_sh + len(pert))
    p_theory = 1 - (1 - j_planted ** _dd.ROWS_PER_BAND) ** _dd.N_BANDS
    bar = p_theory - 3 * math.sqrt(
        p_theory * (1 - p_theory) / max(truth["n_near"], 1)
    )
    near_recall = round(found_near / max(truth["n_near"], 1), 4)
    out["minhash_lsh_pairs"] = {
        "s": el, "runs": mh_runs, "docs_per_s": int(n_docs / el),
        "n_pairs": n_pairs, "n_candidates": n_cands,
        "dropped_buckets": n_dropped,
        "near_recall": near_recall,
        "near_recall_theory": round(p_theory, 4),
        "near_recall_bar": round(bar, 4),
        "near_recall_meets_bar": near_recall >= round(bar, 4),
        "exact_recall": round(found_exact / max(truth["n_exact"], 1), 4),
    }
    _gc()
    _ck()

    # daily-ingestion story at the same scale: materialize the original
    # corpus as a FingerprintStore once, then classify the incoming
    # batch (the planted exact + near duplicates) against the ARTIFACT.
    # Ground truth: every exact dup hits the corpus (corpus_dup =
    # n_exact); near dups have distinct doc-unique texts (kept =
    # n_near, batch_dup = 0).
    import shutil
    import tempfile

    docs = spark.read.parquet(f"{path}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < truth["orig_hi"])
    batch = docs.filter(F.col("doc_id") >= truth["orig_hi"])
    write_runs: list[float] = []
    apply_runs: list[float] = []
    by: dict = {}
    for i in range(n_runs):
        if i:
            _settle("between fingerprint-store runs", max_wait=120)
        store_path = tempfile.mkdtemp(prefix="trck_scale_fpstore_")
        try:
            t0 = _t.time()
            _dd.write_fingerprint_store(
                _dd.spread_input(spark, corpus), store_path
            )
            write_runs.append(round(_t.time() - t0, 1))
            t0 = _t.time()
            cls = _dd.incremental_dedup_apply(
                spark, _dd.spread_input(spark, batch), store_path
            )
            agg = (
                cls.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            apply_runs.append(round(_t.time() - t0, 1))
            by = {r["status"]: r["n"] for r in agg}
            print(
                f"# pair fpstore run {i + 1}/{n_runs}: write "
                f"{write_runs[-1]}s apply {apply_runs[-1]}s",
                file=sys.stderr,
            )
        finally:
            try:
                _dd.drop_fingerprint_store(spark, store_path)
            except Exception:
                pass
            shutil.rmtree(store_path, ignore_errors=True)
    write_s = _stats.median(write_runs)
    apply_s = _stats.median(apply_runs)
    out["fingerprint_store"] = {
        "corpus_docs": truth["orig_hi"],
        "batch_docs": n_docs - truth["orig_hi"],
        "write_s": round(write_s, 1),
        "apply_s": round(apply_s, 1),
        "write_runs": write_runs,
        "apply_runs": apply_runs,
        "batch_docs_per_s": int(
            (n_docs - truth["orig_hi"]) / apply_s
        ),
        "status_counts": by,
        "counts_match": (
            by.get("corpus_dup", 0) == truth["n_exact"]
            and by.get("kept", 0) == truth["n_near"]
            and by.get("batch_dup", 0) == 0
        ),
    }
    _gc()
    _ck()
    return out


def _run_child(cmd, env, timeout, block=None):
    """Run a child with PROCESS-GROUP cleanup and a captured output
    tail; returns (proc, tail_text).

    A plain timeout= kills only the direct python child and orphans the
    py4j-launched JVM, which keeps burning 32 threads on whatever 160M
    job it was mid-flight in — round-6 calibration measured a later
    gate run 40% slow from exactly such an orphan.  start_new_session
    puts the child (and its JVM) in a fresh process group; the group is
    killed on timeout AND after any exit — a child that CRASHES (the
    round-6 flat rc=1) also orphans its JVM, and that orphan is what
    blew through the 180 s settle-wait and contaminated the sf0.1 block
    that followed (VERDICT r06 item 2).

    Output: the child's stdout/stderr are teed live to our stderr (the
    driver log) while the last ~80 lines are retained, so a nonzero rc
    carries its traceback into the artifact instead of a bare return
    code."""
    import collections
    import signal
    import threading

    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True, text=True, errors="replace",
    )
    # the parent's SIGTERM handler kills this group before emitting the
    # contract line, so a driver kill can't orphan a 32-thread JVM into
    # whatever the driver runs next
    _ACTIVE_CHILD["pid"] = proc.pid
    _ACTIVE_CHILD["block"] = block
    tail: "collections.deque[str]" = collections.deque(maxlen=80)

    def _tee():
        for line in proc.stdout:
            sys.stderr.write(line)
            tail.append(line)
        proc.stdout.close()

    t = threading.Thread(target=_tee, daemon=True)
    t.start()
    try:
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"# child timed out after {timeout}s (tree killed)",
              file=sys.stderr)
    finally:
        # reap the WHOLE group unconditionally: on clean exit the group
        # is already empty and this is a no-op; on crash it kills the
        # orphaned JVM before it can contaminate the next timed block
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()
        t.join(timeout=10)
        _ACTIVE_CHILD["pid"] = None
        _ACTIVE_CHILD["block"] = None
    return proc, "".join(tail)[-2048:]


_ACTIVE_CHILD: dict = {"pid": None, "block": None}


def _settle(label: str, max_wait: float = 300.0) -> None:
    """Wait for the 1-min load average to drop below half the CPU
    budget before the next timed block.  A finished (or crashed) 160M
    child leaves the run queue draining for minutes; starting the next
    block into that tail inflated sub-second queries 2-4x (round-6
    final run: trck family 0.5-0.8 s on settled runs vs 1.3-2.8 s on
    the one that started hot).  Bounded, and the outcome is logged so
    a slow artifact is attributable."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    t0 = time.time()
    while os.getloadavg()[0] > cpus / 2 and time.time() - t0 < max_wait:
        time.sleep(5)
    print(
        f"# settle ({label}): {time.time() - t0:.0f}s, "
        f"loadavg {os.getloadavg()[0]:.1f}",
        file=sys.stderr,
    )


def _log_peak_rss(label: str) -> None:
    """Log this process's and its reaped children's peak RSS — a child
    that dies rc=1 with no output is most plausibly memory pressure,
    and this one line distinguishes OOM from a bug (VERDICT r06
    item 2)."""
    try:
        import resource

        self_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        kids_mb = (
            resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss // 1024
        )
        print(
            f"# peak rss ({label}): self {self_mb} MB, "
            f"children {kids_mb} MB",
            file=sys.stderr,
        )
    except Exception:
        pass


def _gate_subprocess() -> dict | None:
    """Run the gate family as budget-aware fresh-JVM children and
    return the assembled BENCH_GATE.json contents.

    Round-10 protocol (VERDICT r09 item 1): BENCH_GATE.json is written
    as a status stub IMMEDIATELY (replacing the r09 delete-up-front,
    which left the tree artifact-less when the driver's timeout killed
    the gate child), every child checkpoints it after every completed
    block, the pair-scale family runs as its own LAST child so its
    death cannot destroy the gate bars, and each child's timeout is
    sized from the remaining total budget — a block that does not fit
    is SKIPPED with a disclosed marker, never allowed to run the
    process into the driver's kill."""
    out_path = os.path.join(_REPO, "BENCH_GATE.json")
    _atomic_write_json(out_path, {
        "status": "running",
        "budget_s": _BUDGET_S,
        "budget_spent_at_start_s": round(time.time() - _T0, 1),
    })
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    skipped: dict = {}
    me = os.path.abspath(__file__)

    def _left():
        return _remaining() - _FINAL_RESERVE_S

    def _patch(patch: dict):
        gate = _read_json(out_path) or {}
        gate.update(patch)
        _atomic_write_json(out_path, gate)
        return gate

    # ---- prepare child (throwaway JVM builds every dataset/store
    # cache so the measuring children open warm caches with clean
    # heaps; a prepare failure is not fatal — the gate child rebuilds
    # lazily and pays the contamination rather than losing the round) --
    rem = _left()
    if rem < 900:
        skipped["prepare"] = f"budget: {rem:.0f}s left"
        print(f"# prepare SKIPPED ({skipped['prepare']})", file=sys.stderr)
    else:
        penv = dict(env)
        if rem < 3300 * _CORE_SCALE:
            # the pair family will be degraded/skipped below — don't
            # spend prepare time generating its doc corpus
            penv["SPARK_GRAFT_PAIR_DOCS"] = "0"
        prep, _pt = _run_child(
            [sys.executable, me, "--prepare"],
            env=penv, timeout=max(300, min(4200, rem - 900)),
            block="prepare",
        )
        if prep.returncode != 0:
            print(
                f"# prepare subprocess rc={prep.returncode} (gate child "
                "will build caches in-JVM; timings may degrade)",
                file=sys.stderr,
            )
        _settle("after prepare child")

    # ---- gate child (baseline + fsm-path + streaming; checkpoints
    # internally after every block) ----
    rem = _left()
    if rem < 420:
        skipped["gate"] = f"budget: {rem:.0f}s left"
        print(f"# gate SKIPPED ({skipped['gate']})", file=sys.stderr)
        return _patch({"status": "skipped_budget", "skipped": skipped})
    proc, gate_tail = _run_child(
        [sys.executable, me, "--gate", "--out", out_path],
        env=env, timeout=max(420, min(5400, rem - 60)),
        block="gate",
    )
    if proc.returncode != 0:
        print(f"# gate subprocess rc={proc.returncode}", file=sys.stderr)
        # the artifact keeps whatever blocks the child checkpointed;
        # annotate rather than replace (r09 lost measured bars here)
        _patch({
            "gate_error": f"gate subprocess exited rc={proc.returncode}",
            "gate_error_detail": gate_tail,
        })

    # ---- flat child (own fresh 48g JVM, see run_gate_suite note) ----
    gate_now = _read_json(out_path) or {}
    rem = _left()
    if rem < 420:
        skipped["flat"] = f"budget: {rem:.0f}s left"
        print(f"# flat SKIPPED ({skipped['flat']})", file=sys.stderr)
    elif "total" not in gate_now:
        skipped["flat"] = "gate baseline incomplete (no total row)"
        print(f"# flat SKIPPED ({skipped['flat']})", file=sys.stderr)
    else:
        _settle("before flat child")
        flat, flat_tail = _run_child(
            [sys.executable, me, "--flat", "--out", out_path],
            env=env, timeout=max(420, min(2700, rem - 60)),
            block="flat",
        )
        if flat.returncode != 0:
            print(f"# flat subprocess rc={flat.returncode}",
                  file=sys.stderr)
            _patch({
                "flat_error":
                    f"flat subprocess exited rc={flat.returncode}",
                # the attributable failure, not a bare return code
                # (VERDICT r06 item 2): last ~2 kB of child output
                "flat_error_detail": flat_tail,
            })

    # ---- pair-scale child, LAST (most expensive, least gating) ----
    n_pair = _pair_docs()
    rem = _left()
    if n_pair > 0:
        if rem < 900 * _CORE_SCALE + 180:
            skipped["pair_scale"] = f"budget: {rem:.0f}s left"
            print(f"# pair-scale SKIPPED ({skipped['pair_scale']})",
                  file=sys.stderr)
            # the artifact always carries the key, even on a skip
            _patch({"pair_scale": {
                "status": "skipped_budget",
                "reason": skipped["pair_scale"],
            }})
        else:
            # degrade before skipping: ask for the r08-mandated
            # median-of-3 whenever a first full pass plausibly fits
            # (the child additionally stops adding runs PER OPERATOR
            # when its remaining budget can't hold another run — see
            # run_pair_scale_bench._timed — so asking for 3 can no
            # longer blow the budget the way the r11 rem>3000 gate
            # assumed; r11 left 3-run medians on the table at
            # rem~2600, VERDICT item 7)
            want = int(os.environ.get("TRCK_SPARK_PAIR_RUNS", "3"))
            runs = min(want, 3 if rem > 1500 else 1)
            penv = dict(env)
            penv["TRCK_SPARK_PAIR_RUNS"] = str(runs)
            # the child budgets its own adaptive degrade from what the
            # parent can actually give it
            penv["TRCK_SPARK_BENCH_BUDGET_S"] = str(
                max(600, int(rem - 90))
            )
            _settle("before pair child")
            print(f"# pair-scale child: {runs} run(s), "
                  f"{rem:.0f}s budget left", file=sys.stderr)
            # stub BEFORE launch: a kill that lands on this child can
            # never again leave the artifact with no pair_scale key at
            # all (VERDICT r10 item 2) — the term handler upgrades
            # this to status=killed, the child to complete/error
            gate_stub = _read_json(out_path) or {}
            gate_stub["pair_scale"] = {
                "status": "running",
                "protocol_runs": runs,
                "degraded": runs < want,
            }
            _atomic_write_json(out_path, gate_stub)
            pair, pair_tail = _run_child(
                [sys.executable, me, "--pair", "--out", out_path],
                env=penv, timeout=max(600, rem - 60),
                block="pair",
            )
            if pair.returncode != 0:
                print(f"# pair subprocess rc={pair.returncode}",
                      file=sys.stderr)
                gate = _read_json(out_path) or {}
                ps = gate.get("pair_scale") or {}
                ps.setdefault(
                    "error",
                    f"pair subprocess exited rc={pair.returncode}",
                )
                ps["error_detail"] = pair_tail
                if ps.get("status") in (None, "running"):
                    ps["status"] = "error"
                gate["pair_scale"] = ps
                _atomic_write_json(out_path, gate)

    gate = _read_json(out_path)
    if gate is None:
        print("# gate result unreadable", file=sys.stderr)
        return None
    if skipped:
        gate["skipped"] = skipped
    if gate.get("status") in ("running", "partial"):
        gate["status"] = "partial"
    elif not skipped and "gate_error" not in gate:
        gate["status"] = "complete"
    _atomic_write_json(out_path, gate)
    return gate


def _gate_summary(gate: dict | None) -> dict | None:
    """Compact per-query view for the one-line contract output."""
    if not gate:
        return None
    if "error" in gate:
        return {"error": gate["error"]}
    s: dict = {"events": gate.get("events"), "detail": "BENCH_GATE.json"}
    marg = gate.get("marginal") or {}
    for name in BASELINE_DEFS:
        g = gate.get(name) or {}
        m = marg.get(name) or {}
        s[name] = {
            "store_s": g.get("spark_store_s"),
            "oracle_s": g.get("oracle_s"),
            "ratio_store": g.get("ratio_store"),
            "ratio_store_median": g.get("ratio_store_median"),
            "marginal_ratio": m.get("marginal_ratio"),
            "marginal_ratio_median": m.get("marginal_ratio_median"),
            "marginal_ratio_mean": m.get("marginal_ratio_mean"),
            "marginal_ratio_mean_ci95": m.get("marginal_ratio_mean_ci95"),
            "match": g.get("match"),
        }
    tot = gate.get("total") or {}
    s["total_ratio_store"] = tot.get("ratio_store")
    s["total_ratio_store_median"] = tot.get("ratio_store_median")
    for k in ("b1_fsm_path", "b2_fsm_path", "streaming",
              "streaming_window", "streaming_uniques"):
        sub = gate.get(k) or {}
        s[k + "_eps"] = sub.get("events_per_sec")
        if "events_per_sec_median" in sub:
            s[k + "_eps_median"] = sub["events_per_sec_median"]
    sw = gate.get("streaming_window") or {}
    if "clicks_match" in sw:
        s["streaming_window_match"] = sw["clicks_match"]
    ps = gate.get("pair_scale") or {}
    if ps:
        if "error" in ps:
            s["pair_scale"] = {"error": ps["error"]}
        else:
            s["pair_scale"] = {
                "n_docs": ps.get("n_docs"),
                "minhash_s": (ps.get("minhash_lsh_pairs") or {}).get("s"),
                "clusters_s": (ps.get("dedup_clusters") or {}).get("s"),
                "apply_s": (ps.get("dedup_apply") or {}).get("s"),
                "near_recall": (ps.get("minhash_lsh_pairs") or {}).get(
                    "near_recall"
                ),
                "near_recall_bar": (
                    ps.get("minhash_lsh_pairs") or {}
                ).get("near_recall_bar"),
                "near_recall_meets_bar": (
                    ps.get("minhash_lsh_pairs") or {}
                ).get("near_recall_meets_bar"),
                "simhash_s": (ps.get("simhash_pairs") or {}).get("s"),
                "simhash_exact_recall": (
                    ps.get("simhash_pairs") or {}
                ).get("exact_recall"),
                "embedding_s": (
                    ps.get("embedding_near_dup_pairs") or {}
                ).get("s"),
                "embedding_exact_recall": (
                    ps.get("embedding_near_dup_pairs") or {}
                ).get("exact_recall"),
                "survivors_match": (ps.get("dedup_apply") or {}).get(
                    "survivors_match"
                ),
                "fpstore_apply_s": (
                    ps.get("fingerprint_store") or {}
                ).get("apply_s"),
                "fpstore_counts_match": (
                    ps.get("fingerprint_store") or {}
                ).get("counts_match"),
            }
    return s


def _gate_bars(gate: dict | None) -> dict:
    """The four declared pass/fail bars as booleans — the ONLY gate
    content allowed on the stdout contract line.  Round 6's line
    embedded the full ~2.5 kB gate summary and outgrew the driver's
    tail capture (BENCH_r06 `parsed: null`, second occurrence after
    round 3); the full numbers live in BENCH_GATE.json and the
    per-query sf map in BENCH_SF.json, both committed.

    Bars (declared in COVERAGE.md): B1 = median wallclock <= 2x OR
    marginal tail-mean <= 1.5x — the marginal form existed because the
    wallclock was fixed-cost-dominated; with the store rollup answering
    B1 in O(1) the wallclock bar is met outright and the marginal is
    honestly non-monotone (an O(1) path has no per-event slope).
    B2/sessions/attribution = steady-state-median wallclock <= 2x."""
    if not gate:
        return {"error": "gate did not run"}
    if "error" in gate:
        return {"error": gate["error"]}
    marg = gate.get("marginal") or {}

    def _le(x, bar):
        return x is not None and x <= bar

    b1m = (marg.get("b1_count_foreach") or {}).get("marginal_ratio_mean")
    bars = {
        "b1": _le(
            (gate.get("b1_count_foreach") or {}).get(
                "ratio_store_median"
            ),
            2.0,
        )
        or _le(b1m, 1.5),
        "b2": _le(
            (gate.get("b2_funnel") or {}).get("ratio_store_median"), 2.0
        ),
        "sessions": _le(
            (gate.get("sessions") or {}).get("ratio_store_median"), 2.0
        ),
        "attribution": _le(
            (gate.get("attribution") or {}).get("ratio_store_median"), 2.0
        ),
        # HLL uniques through the segmented store: zero-scan tier
        # engaged AND estimates inside the sketch envelope (the wallclock
        # is O(manifest), so a <=2x ratio vs the oracle's full-scan
        # count-distinct is implied and also recorded in BENCH_GATE)
        "hll": bool(
            (gate.get("b_hll_store_segmented") or {}).get("zero_scan")
        )
        and (gate.get("b_hll_store_segmented") or {}).get("match")
        is True,
        # ts-bounded uniques: a VALUE bar (sketch envelope) plus the
        # decomposition proof (covered parts answered from sketches,
        # only the newest segment scanned); the wallclock ratio is
        # recorded, not gated — it is proportional to the boundary
        # slice, which this bench's 3-segment geometry makes
        # adversarially thick (1/3 of all data)
        "hll_ts": (gate.get("b_hll_store_ts") or {}).get("match") is True
        and (gate.get("b_hll_store_ts") or {}).get("covered_parts") == 2,
        # production-cadence geometry (thin newest segment over deep
        # covered history — r10): value bar + decomposition proof +
        # the design-point wallclock claim (boundary ~2% of history,
        # so the engine must beat the oracle's full rescan outright)
        "hll_ts_thin": (
            (gate.get("b_hll_store_ts_thin") or {}).get("match") is True
            and (gate.get("b_hll_store_ts_thin") or {}).get(
                "covered_parts"
            ) == 3
            and _le(
                (gate.get("b_hll_store_ts_thin") or {}).get(
                    "ratio_store_median"
                ),
                1.0,
            )
        ),
    }
    matches = [
        (gate.get(n) or {}).get("match") for n in BASELINE_DEFS
    ]
    out = {
        "detail": "BENCH_GATE.json",
        "bars": bars,
        "match_all": all(m is True for m in matches),
    }
    # disclose partial/degraded runs on the contract line (r10 budget
    # protocol: blocks may be skipped, never silently absent)
    status = gate.get("status")
    if status and status != "complete":
        out["status"] = status
    if gate.get("skipped"):
        out["skipped"] = sorted(gate["skipped"])
    return out


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


def run_sf_block(sf_dir: str, out_path: str) -> None:
    """The sf0.1 per-query block — the contract line's core data — in
    its own library-default-heap JVM, checkpointing ``out_path`` after
    EVERY query so a kill at any point leaves the completed timings in
    the artifact (VERDICT r09 item 1: this block never ran in round 9
    because it was ordered after the gate family; it now runs FIRST)."""
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
    # The round-5 registry merged same-key gate rows (text_metrics,
    # ann_cosine_methods, split_pack) so the driver's 50-row
    # correctness budget covers every operator each round.  The bench
    # keeps timing the INDIVIDUAL operators so per-query numbers stay
    # comparable across BENCH_r* rounds.
    from trck_spark.pipeline import similarity as _sim
    from trck_spark.pipeline import text as _txt

    queries["ann_cosine_topk"] = (
        lambda s, d: _sim.cosine_topk(s, d, k=5, n_queries=5)
    )
    queries["text_quality"] = lambda s, d: _txt.text_quality(s, d)
    queries["repetition_stats"] = (
        lambda s, d: _txt.repetition_stats(s, d)
    )
    queries["pii_stats"] = lambda s, d: _txt.pii_stats(s, d)
    queries["lm_score"] = lambda s, d: _txt.lm_score(s, d)
    queries["hash_split"] = lambda s, d: _cur.hash_split(s, d)
    queries["sequence_pack"] = lambda s, d: _cur.sequence_pack(s, d)
    # round-9 registry merge folded the ts-bounded store counter into
    # the tagged trck_count_by_type_store row; the bench keeps timing
    # the constituent plan individually (comparable across BENCH_r*)
    from trck_spark import queries as _tq

    queries["trck_count_by_type_store_ts"] = (
        _tq.q_trck_count_by_type_store_ts
    )

    def _hll_store_sketch(s, d):
        # the SKETCH answer through the segmented store (zero Spark
        # work — engine.TrckLocalResultSet); the registry row's
        # exact-count check scan is the oracle's side, not the
        # engine's, so the bench times the sketch surface alone
        from trck_spark.engine import TrckSparkEngine

        rs = TrckSparkEngine(s).run(
            _tq._segmented_events_store(s, d), _tq.PROG_UNIQUES_HLL,
            uuid_col="uuid", ts_col="timestamp", seq_col="event_id",
        )
        out = rs.collect_json()
        return s.createDataFrame(
            [(r["%t"], r.get("^uniq", "")) for r in out],
            "t string, uniq_hex string",
        )

    queries["trck_uniques_hll_store"] = _hll_store_sketch

    def _hll_store_sketch_ts(s, d):
        # time-bounded uniques through the segmented store: the covered
        # middle segment answers from its manifest sketch, ONLY the two
        # boundary segments scan, merged by register max
        # (engine._run_ts_scoped_hll)
        from trck_spark.engine import TrckSparkEngine

        rs = TrckSparkEngine(s).run(
            _tq._segmented_events_store(s, d), _tq.PROG_UNIQUES_HLL_TS,
            uuid_col="uuid", ts_col="timestamp", seq_col="event_id",
        )
        out = rs.collect_json()
        return s.createDataFrame(
            [(r["%t"], r.get("^uniq", "")) for r in out],
            "t string, uniq_hex string",
        )

    queries["trck_uniques_hll_store_ts"] = _hll_store_sketch_ts
    bench_names = [
        "trck_count_by_type",   # B1: implicit foreach counter
        "trck_funnel",          # B2: windowed funnel (FSM)
        "trck_sessions",        # FSM sessionization
        "trck_attribution",     # FSM 7d attribution window
        "lineitem_pricing",     # relational agg
        "revenue_by_segment",   # broadcast join + agg
    ]
    for extra in ("trck_count_by_type_store_ts", "trck_uniques_hll_store",
                  "trck_uniques_hll_store_ts",
                  "trck_sessions_by_type",
                  "dedup_exact",
                  "ngram_jaccard_pairs", "ann_cosine_topk",
                  "minhash_lsh_pairs", "text_quality",
                  "embedding_near_dup_pairs", "video_frame_sample",
                  "dedup_clusters", "quota_sample",
                  "vocab_topk", "contamination_check",
                  "trck_clicks_by_user", "mixture_sample",
                  "ngram_containment_pairs", "repetition_stats",
                  "hash_split", "sequence_pack", "pii_stats", "lm_score",
                  "tfidf_topterms", "dup_span_stats", "semantic_dedup"):
        if extra in queries:
            bench_names.append(extra)

    timings: dict[str, float] = {}
    # warm the JVM, codegen, python workers and parquet footers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    queries["trck_count_clicks"](spark, sf_dir).count()

    from trck_spark.pipeline.dedup import release

    # VERDICT r07 item 2: best-of-2 cannot adjudicate round-over-round
    # drift on the slow pair family (embedding 2.74->3.19 s, containment
    # 1.63->2.06 s looked like regressions but had no statistic behind
    # them).  The slowest queries get the steady-state MEDIAN protocol
    # (plateau + settle, run lists committed to BENCH_SF.json); the
    # sub-second rest keep best-of-2 with both runs recorded.
    # trck_count_by_type_store_ts joins the median family in round 10:
    # its r09 point estimate (0.456 -> 1.235 s) was the one sf0.1 move
    # outside the cross-boot drift band and needs a statistic behind it
    # (VERDICT r09 item 2).
    MEDIAN_QUERIES = {
        "embedding_near_dup_pairs", "ngram_containment_pairs",
        "dedup_clusters", "ngram_jaccard_pairs", "minhash_lsh_pairs",
        "contamination_check", "tfidf_topterms", "trck_funnel",
        "trck_count_by_type_store_ts",
    }
    run_lists: dict[str, list] = {}
    sf_stats: dict[str, dict] = {}

    detail: dict = {
        "metric": "bench_total", "unit": "sec", "sf": float(sf),
        "ts_dtype": ts_dtype, "status": "partial",
        "queries": timings,
        "sf_protocol": {
            "statistic": "steady-state median for the slow family, "
            "best-of-2 for the sub-second rest; full run lists below",
            "median_queries": sorted(MEDIAN_QUERIES),
        },
        "sf_runs": run_lists,
        "sf_stats": sf_stats,
    }

    def ckpt():
        detail["value"] = round(sum(timings.values()), 3)
        _atomic_write_json(out_path, detail)

    for name in bench_names:
        fn = queries[name]
        box: dict = {}

        def one(fn=fn, box=box):
            t0 = time.time()
            df = fn(spark, sf_dir)
            box["n"] = df.count()
            box["df"] = df
            return time.time() - t0

        if name in MEDIAN_QUERIES:
            best, runs, med, mean, tail = _steady_state(
                one, max_runs=6, budget_s=25.0, settle_runs=2
            )
            timings[name] = med
            run_lists[name] = runs
            sf_stats[name] = {
                "best": round(best, 3), "median": med, "mean": mean,
                "median_ci": _median_ci(tail),
            }
        else:
            r1, r2 = one(), one()
            timings[name] = round(min(r1, r2), 3)
            run_lists[name] = [round(r1, 3), round(r2, 3)]
        # drop cached intermediates (persist lifetime is caller-owned;
        # Spark's CacheManager matches canonical plans, so releasing the
        # last invocation's frames releases the shared entries)
        release(box.get("df"))
        print(
            f"# {name}: {box.get('n')} rows in {timings[name]}s "
            f"({'median' if name in MEDIAN_QUERIES else 'best-of-2'} "
            f"of {run_lists[name]})",
            file=sys.stderr,
        )
        ckpt()

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
    detail["trails_per_sec"] = round(n_trails / b1, 1)
    detail["events_per_sec"] = round(n_events / b1, 1)
    detail["status"] = "sf_complete"
    ckpt()
    _log_peak_rss("sf child")


# the ten driver-registered correctness views (TESTDATA.md)
_SF_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _sf_bench_oracles() -> dict:
    """DuckDB timing oracles for the bench-only sf rows (VERDICT r10
    item 4: 9 of 32 sf rows carried ``oracle_s: null``).  These rows
    are constituents of MERGED registry rows (text_metrics /
    split_pack / ann_cosine_methods) or the ts slices of tagged store
    rows — their VALUES are already pinned by the registry twins and
    stress tests, so these oracles exist for the same-boot ratio
    only."""
    out: dict = {}
    try:
        from trck_spark.pipeline.text import (
            lm_score_oracle_sql,
            pii_stats_oracle_sql,
            repetition_stats_oracle_sql,
            text_quality_oracle_sql,
        )

        out["text_quality"] = text_quality_oracle_sql()
        out["repetition_stats"] = repetition_stats_oracle_sql()
        out["pii_stats"] = pii_stats_oracle_sql()
        out["lm_score"] = lm_score_oracle_sql()
    except ImportError:
        pass
    ts_pred = (
        "epoch_ns(ts) // 1000000000 >= 1704500000 "
        "AND epoch_ns(ts) // 1000000000 < 1706200000"
    )
    out["trck_count_by_type_store_ts"] = (
        "SELECT event_type AS t, "
        f"count(*) FILTER ({ts_pred})::BIGINT AS n "
        "FROM events GROUP BY event_type ORDER BY t"
    )
    out["trck_uniques_hll_store_ts"] = (
        "SELECT event_type AS t, "
        f"count(DISTINCT CASE WHEN {ts_pred} THEN user_id END)::BIGINT "
        "AS u FROM events GROUP BY event_type ORDER BY t"
    )
    # hash_split / sequence_pack: the two halves of the split_pack
    # merged oracle, verbatim
    out["hash_split"] = (
        "SELECT doc_id, bucket, "
        "CASE WHEN bucket < 98 THEN 'train' "
        "WHEN bucket < 99 THEN 'val' ELSE 'test' END AS split "
        "FROM (SELECT doc_id, "
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 "
        "AS bucket FROM documents) t ORDER BY doc_id"
    )
    out["sequence_pack"] = r"""
WITH docs AS (
  SELECT doc_id,
         len(string_split(
           regexp_replace(lower(text), '\s+', ' ', 'g'), ' '))::BIGINT
           AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard
  FROM documents
),
cums AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard
                             ORDER BY md5(doc_id::VARCHAR), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM docs
)
SELECT doc_id, shard, (cum - n_tokens)::BIGINT AS start_offset, n_tokens,
       floor((cum - n_tokens) / 512.0)::BIGINT AS bin_first,
       floor((cum - 1) / 512.0)::BIGINT AS bin_last
FROM cums
ORDER BY shard, start_offset, doc_id
"""
    # ann_cosine_topk: the 'exact' branch of the ann_cosine_methods
    # merged oracle, verbatim
    out["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS qid, [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings WHERE vec_id < 5
),
d AS (
  SELECT vec_id AS did, [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
s AS (
  SELECT qid, did,
         list_sum([q.v[i] * d.v[i] for i in generate_series(1, len(q.v))])::DOUBLE
         / (sqrt(list_sum([q.v[i] * q.v[i] for i in generate_series(1, len(q.v))])::DOUBLE)
            * sqrt(list_sum([d.v[i] * d.v[i] for i in generate_series(1, len(d.v))])::DOUBLE))
         AS cos
  FROM q, d WHERE qid <> did
)
SELECT qid, did, floor(cos * 1000000)::BIGINT AS score_e6
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did) AS rn
      FROM s)
WHERE rn <= 5 ORDER BY qid, score_e6 DESC, did
"""
    return out


def run_sf_oracle_block(sf_dir: str, jsonl_path: str) -> None:
    """Time the DuckDB oracle for every sf query that has one, in the
    SAME boot as the Spark timings (VERDICT r09 item 4: three rounds of
    cross-boot drift forensics because the sf block measured only the
    engine; the gate block never needed adjudication because it measures
    both engines minutes apart).  Results stream to ``jsonl_path`` one
    line per query so a kill keeps the completed rows; the parent
    merges them into BENCH_SF.json as per-query oracle_s/ratio.

    Per-query cap via duckdb's interrupt (a pair-family oracle that is
    cheap at the sf0.01 correctness scale can be minutes at sf0.1) —
    an interrupted query records a disclosed timeout, not a stall."""
    import threading

    import duckdb

    import __spark_entry__ as entry_mod

    oracles = dict(entry_mod.oracle_sql())
    oracles.update(_sf_bench_oracles())
    sf = _read_json(os.path.join(_REPO, "BENCH_SF.json")) or {}
    names = list((sf.get("queries") or {}).keys()) or sorted(oracles)
    con = duckdb.connect()
    for t in _SF_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    cap = float(os.environ.get("TRCK_SPARK_SF_ORACLE_CAP_S", "90"))
    with open(jsonl_path, "w") as f:
        for name in names:
            sql = oracles.get(name)
            if not sql:
                f.write(json.dumps({
                    "name": name, "oracle_s": None,
                    "note": "no oracle (bench-only surface)",
                }) + "\n")
                f.flush()
                continue
            row: dict = {"name": name}
            timer = threading.Timer(cap, con.interrupt)
            timer.start()
            try:
                t0 = time.time()
                con.execute(sql).fetchall()
                r1 = time.time() - t0
                t0 = time.time()
                con.execute(sql).fetchall()
                r2 = time.time() - t0
                row["oracle_s"] = round(min(r1, r2), 3)
                row["oracle_runs"] = [round(r1, 3), round(r2, 3)]
            except Exception as e:
                row["oracle_s"] = None
                row["error"] = f"{type(e).__name__}: {e}"
            finally:
                timer.cancel()
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(f"# sf oracle {name}: {row.get('oracle_s')}s",
                  file=sys.stderr)


def _merge_sf_oracle(jsonl_path: str) -> None:
    """Fold the oracle child's per-query timings into BENCH_SF.json as
    oracle_s + ratio next to each Spark timing."""
    sf_path = os.path.join(_REPO, "BENCH_SF.json")
    sf = _read_json(sf_path)
    if not sf:
        return
    rows: dict = {}
    try:
        with open(jsonl_path) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    r = json.loads(ln)
                    rows[r["name"]] = r
    except (OSError, ValueError):
        return
    per_query: dict = {}
    for name, spark_s in (sf.get("queries") or {}).items():
        r = rows.get(name)
        if not r:
            continue
        entry = {k: r[k] for k in ("oracle_s", "oracle_runs", "error",
                                   "note") if k in r}
        if r.get("oracle_s"):
            entry["ratio"] = round(spark_s / r["oracle_s"], 2)
        per_query[name] = entry
    sf["sf_oracle"] = {
        "protocol": "DuckDB best-of-2 per query over the same sf "
                    "parquet, measured in the same boot (drift "
                    "normalization — VERDICT r09 item 4; per-query "
                    f"interrupt cap {os.environ.get('TRCK_SPARK_SF_ORACLE_CAP_S', '90')}s)",
        "per_query": per_query,
    }
    _atomic_write_json(sf_path, sf)


def _contract_from_artifacts(blocks: dict, with_gate: bool) -> dict:
    """Assemble the stdout contract line purely from the checkpointed
    artifacts — callable at any time, including from the SIGTERM
    handler, so the driver always gets a parseable line."""
    sf = _read_json(os.path.join(_REPO, "BENCH_SF.json")) or {}
    result = {
        "metric": "bench_total",
        "value": sf.get("value"),
        "unit": "sec",
        "queries": sf.get("queries") or {},
        "sf": sf.get("sf"),
        "trails_per_sec": sf.get("trails_per_sec"),
        "events_per_sec": sf.get("events_per_sec"),
        "ts_dtype": sf.get("ts_dtype"),
        "detail": "BENCH_SF.json",
    }
    if with_gate:
        gate = _read_json(os.path.join(_REPO, "BENCH_GATE.json"))
        result["gate"] = _gate_bars(gate)
    result["blocks"] = blocks
    return result


def _install_term_handler(blocks: dict, with_gate: bool) -> None:
    """On SIGTERM (the driver's timeout sends TERM first), kill the
    active child group, emit the contract line from the checkpointed
    artifacts, and exit — the round's signal survives the kill."""
    import signal

    def _h(signum, frame):
        print("# SIGTERM — emitting contract from checkpointed "
              "artifacts", file=sys.stderr)
        pid = _ACTIVE_CHILD.get("pid")
        if pid:
            try:
                os.killpg(os.getpgid(pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        blocks["killed"] = "sigterm"
        # stamp the IN-FLIGHT block so the artifact says what died
        # instead of omitting it silently (VERDICT r10 item 2: the r10
        # pair child vanished with no pair_scale key and no marker)
        in_flight = _ACTIVE_CHILD.get("block")
        if in_flight:
            blocks["killed_in_flight"] = in_flight
            try:
                gate_path = os.path.join(_REPO, "BENCH_GATE.json")
                gate = _read_json(gate_path)
                if gate is not None:
                    if in_flight == "pair":
                        ps = gate.get("pair_scale") or {}
                        ps["status"] = "killed"
                        gate["pair_scale"] = ps
                    else:
                        gate["killed_in_flight"] = in_flight
                    _atomic_write_json(gate_path, gate)
            except Exception:
                pass
        try:
            print(json.dumps(_contract_from_artifacts(blocks, with_gate)))
            sys.stdout.flush()
        except Exception:
            pass
        os._exit(0)

    signal.signal(signal.SIGTERM, _h)


def main() -> None:
    me = os.path.abspath(__file__)
    if "--prepare" in sys.argv:
        # Build every dataset/store cache in a THROWAWAY JVM so the
        # measuring gate child opens warm caches with a clean heap.
        # Round 9 measured the cost of not doing this: a gate child
        # that had just built the 160M stores (incl. the write-time
        # sketch pass over ~160M pairs) ran the window-sort-heavy
        # attribution bar at 24.7s vs 4.4-4.8s in a fresh JVM on the
        # same cached store — the round-6 "flat block inherits a
        # fragmented heap" contamination, now on the gate side.
        from trck_spark.session import get_spark

        spark = get_spark("trck_spark_prepare")
        spark.sparkContext.setLogLevel("ERROR")
        _open_perf(spark, GATE_EVENTS)
        _open_perf_segmented(spark, GATE_EVENTS)
        _open_perf_segmented_thin(spark, GATE_EVENTS)
        _open_perf(spark, 20_000_000)  # gate lo-side + fsm benches
        if _stream_events() != 20_000_000:
            _open_perf(spark, _stream_events())  # low-core streaming
        n_pair = _pair_docs()
        if n_pair > 0:
            from trck_spark.benchdata import (
                ensure_docs_dataset,
                ensure_embeddings_dataset,
            )

            docs_path = os.path.join(_CACHE_DIR, f"docs_{n_pair}")
            ensure_docs_dataset(spark, docs_path, n_docs=n_pair)
            ensure_embeddings_dataset(
                spark, docs_path, n_vecs=max(n_pair // 5, 1_000)
            )
        _log_peak_rss("prepare child")
        return

    if "--gate" in sys.argv:
        out_path = None
        if "--out" in sys.argv:
            out_path = sys.argv[sys.argv.index("--out") + 1]
        gate = run_gate_suite(out_path)
        if out_path is None:
            print(json.dumps(gate, indent=1, default=str))
        _log_peak_rss("gate child")
        return

    if "--flat" in sys.argv:
        # flat-layout block in a fresh JVM: patch the gate artifact.
        # Any failure must leave a traceback on stderr (the parent tees
        # it into flat_error_detail) plus the peak-RSS line — round 6's
        # flat child died rc=1 with zero diagnostics.
        out_path = sys.argv[sys.argv.index("--out") + 1]
        try:
            with open(out_path) as f:
                gate = json.load(f)
            from trck_spark.session import get_spark

            spark = get_spark("trck_spark_flat")
            spark.sparkContext.setLogLevel("ERROR")
            gate.pop("flat_error", None)
            gate.pop("flat_error_detail", None)
            run_flat_block(spark, gate)
            _atomic_write_json(out_path, gate)
        except BaseException:
            import traceback

            traceback.print_exc(file=sys.stderr)
            _log_peak_rss("flat child (failed)")
            raise
        _log_peak_rss("flat child")
        return

    if "--pair" in sys.argv:
        # pair-scale family in its own fresh 48g JVM, patching
        # BENCH_GATE.json per-operator (VERDICT r09 item 1b: its death
        # must never take the gate bars with it)
        out_path = sys.argv[sys.argv.index("--out") + 1]
        from trck_spark.session import get_spark

        spark = get_spark("trck_spark_pair")
        spark.sparkContext.setLogLevel("ERROR")

        def ckpt_pair(ps: dict):
            gate = _read_json(out_path) or {}
            gate["pair_scale"] = ps
            _atomic_write_json(out_path, gate)

        n_pair = _pair_docs()
        try:
            ps = run_pair_scale_bench(spark, n_pair, ckpt=ckpt_pair)
            ps["status"] = "complete"
            ckpt_pair(ps)
        except BaseException as e:
            import traceback

            traceback.print_exc(file=sys.stderr)
            gate = _read_json(out_path) or {}
            ps = gate.get("pair_scale") or {}
            ps["error"] = f"{type(e).__name__}: {e}"
            ckpt_pair(ps)
            _log_peak_rss("pair child (failed)")
            raise
        _log_peak_rss("pair child")
        return

    if "--sf" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        run_sf_block(sf_dir, out_path)
        return

    if "--sforacle" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        run_sf_oracle_block(sf_dir, out_path)
        return

    # ----------------------------------------------------- parent
    # Pure orchestrator: every measurement runs in a fresh-JVM child
    # with a budget-derived timeout; every artifact is checkpointed by
    # the child that owns it; the contract line is assembled from the
    # artifacts at the end (or from the SIGTERM handler), so no kill
    # point can erase the round's signal (VERDICT r09 item 1).
    # Block order is cheapest-and-most-gating first: sf contract data,
    # its same-boot oracle ratios, then the 160M gate family with the
    # pair-scale block last.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with_gate = os.environ.get("SPARK_GRAFT_SKIP_BASELINE") != "1"
    blocks: dict = {}
    sf_path = os.path.join(_REPO, "BENCH_SF.json")
    _atomic_write_json(sf_path, {"status": "running"})
    _install_term_handler(blocks, with_gate)
    print(f"# bench budget: {_BUDGET_S:.0f}s total", file=sys.stderr)

    env = dict(os.environ)
    sfp, sf_tail = _run_child(
        [sys.executable, me, "--sf", "--out", sf_path],
        env=env,
        timeout=max(420, min(2400, _remaining() - _FINAL_RESERVE_S - 60)),
        block="sf",
    )
    blocks["sf"] = "ok" if sfp.returncode == 0 else f"rc={sfp.returncode}"
    if sfp.returncode != 0:
        print(f"# sf subprocess rc={sfp.returncode}", file=sys.stderr)

    # same-boot DuckDB ratios for the sf block (VERDICT r09 item 4)
    rem = _remaining() - _FINAL_RESERVE_S
    if rem > 300:
        jsonl = os.path.join(_CACHE_DIR, "sf_oracle.jsonl")
        os.makedirs(_CACHE_DIR, exist_ok=True)
        orp, _ot = _run_child(
            [sys.executable, me, "--sforacle", "--out", jsonl],
            env=env, timeout=max(240, min(900, rem - 60)),
            block="sf_oracle",
        )
        _merge_sf_oracle(jsonl)
        blocks["sf_oracle"] = (
            "ok" if orp.returncode == 0 else f"rc={orp.returncode}"
        )
    else:
        blocks["sf_oracle"] = f"skipped: {rem:.0f}s left"
        print(f"# sf oracle SKIPPED ({blocks['sf_oracle']})",
              file=sys.stderr)

    baseline = None
    if with_gate:
        rem = _remaining() - _FINAL_RESERVE_S
        if rem > 420:
            try:
                baseline = _gate_subprocess()
            except Exception as e:
                baseline = {"error": f"{type(e).__name__}: {e}"}
                print(f"# baseline gate failed: {e}", file=sys.stderr)
            blocks["gate"] = (baseline or {}).get("status") or (
                "error" if baseline and "error" in baseline else "missing"
            )
            if baseline and baseline.get("skipped"):
                blocks["gate_skipped"] = sorted(baseline["skipped"])
        else:
            blocks["gate"] = f"skipped: {rem:.0f}s left"
            print(f"# gate family SKIPPED ({blocks['gate']})",
                  file=sys.stderr)

    # fold the compact gate summary into BENCH_SF.json (committed
    # artifact of record for the sf side)
    sf_detail = _read_json(sf_path)
    if sf_detail is not None and baseline is not None:
        sf_detail["gate"] = _gate_summary(baseline)
        _atomic_write_json(sf_path, sf_detail)

    result = _contract_from_artifacts(blocks, with_gate)
    line = json.dumps(result)
    print(line)
    print(f"# contract line: {len(line)} bytes; budget spent "
          f"{time.time() - _T0:.0f}s of {_BUDGET_S:.0f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
