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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from trck_spark.session import get_spark

    spark = get_spark("trck_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    bench_names = [
        "trck_count_by_type",   # B1: implicit foreach counter
        "trck_funnel",          # B2: windowed funnel (FSM)
        "trck_sessions",        # FSM sessionization
        "trck_attribution",     # FSM 7d attribution window
        "lineitem_pricing",     # relational agg
        "revenue_by_segment",   # broadcast join + agg
    ]
    for extra in ("dedup_exact", "ngram_jaccard_pairs", "ann_cosine_topk",
                  "minhash_lsh_pairs", "text_quality"):
        if extra in queries:
            bench_names.append(extra)

    timings: dict[str, float] = {}
    # warm the JVM, codegen, python workers and parquet footers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    queries["trck_count_clicks"](spark, sf_dir).count()

    for name in bench_names:
        fn = queries[name]
        best = None
        n = 0
        for _ in range(2):  # steady-state: best of two runs
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
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

    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "trails_per_sec": round(n_trails / b1, 1),
                "events_per_sec": round(n_events / b1, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
