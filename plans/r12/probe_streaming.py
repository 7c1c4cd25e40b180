"""Same-boot streaming probe for the r12 secondary-grouping change.

Runs bench.py's own streaming benches (identical methodology: 3 runs,
medians, value checks) twice each: TRCK_SPARK_STREAM_BUCKETS=0
(per-trail grouping — the r11 granularity) vs the default bucket
count, so the bucketing delta is isolated on one boot.

Usage: python plans/r12/probe_streaming.py [uniques|plain|window]...
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import bench  # noqa: E402
from trck_spark.session import get_spark  # noqa: E402

which = sys.argv[1:] or ["uniques"]
spark = get_spark("trck_spark_stream_probe")
spark.sparkContext.setLogLevel("ERROR")
bench._open_perf(spark, 20_000_000)  # build/open the cached dataset

BENCHES = {
    "uniques": bench.run_streaming_uniques_bench,
    "plain": bench.run_streaming_bench,
    "window": bench.run_streaming_window_bench,
}

out = {}
for name in which:
    fn = BENCHES[name]
    for mode, env in (("per_trail", "0"), ("bucketed", "")):
        if env:
            os.environ["TRCK_SPARK_STREAM_BUCKETS"] = env
        else:
            os.environ.pop("TRCK_SPARK_STREAM_BUCKETS", None)
        r = fn(spark)
        out[f"{name}_{mode}"] = r
        print(f"## {name} {mode}: {json.dumps(r)}", flush=True)
print(json.dumps(out, indent=1))
