"""Capture the ts-bounded uniques BOUNDARY-scan physical plan.

The `trck_uniques_hll_store_ts` / `b_hll_store_ts` rows run through
engine._run_ts_scoped_hll, whose boundary scan is an engine-internal
DataFrame (not the declared query's DataFrame), so capture_plans.py
can't see it.  This script runs the sf ts-bounded uniques program over
the segmented sf store, then explains every DataFrame the engine left
in the manifest's prepared-plan cache (r10: the groupBy(code, reg)
"jvm_rr" aggregation; r11: the exchange-free "rr_fold" mapInPandas
fold over the slice-complement ranges) and records the _ts_scope
diagnostics (boundary_plan, covered parts, slices covered).

Usage: python plans/r12/capture_ts_boundary.py <suffix>
Writes plans/r12/ts_uniques_boundary_<suffix>.txt
"""
import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.dirname(os.path.abspath(__file__))

from trck_spark import queries as tq
from trck_spark.engine import TrckSparkEngine
from trck_spark.session import get_spark

spark = get_spark("ts_boundary_plan_capture")
spark.sparkContext.setLogLevel("ERROR")

store = tq._segmented_events_store(spark, sf_dir)
engine = TrckSparkEngine(spark)
rs = engine.run(
    store, tq.PROG_UNIQUES_HLL_TS,
    uuid_col="uuid", ts_col="timestamp", seq_col="event_id",
)
out = rs.collect_json()
scope = dict(getattr(rs, "_ts_scope", {}) or {})
scope.pop("boundary_files", None)  # long, content-free for the plan

buf = io.StringIO()
pcache = store._trailstore_manifest.get("_ts_hll_plan_cache", {})
for ck, df in sorted(pcache.items(), key=lambda kv: str(kv[0])):
    print(f"== boundary plan for scope key {ck} ==", file=buf)
    if df is None:
        print("(no scan: boundary fully covered by sidecar slices)",
              file=buf)
        continue
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")

path = os.path.join(out_dir, f"ts_uniques_boundary_{suffix}.txt")
with open(path, "w") as f:
    f.write(
        f"# ts-bounded uniques boundary scan  sf_dir: {sf_dir}  "
        f"suffix: {suffix}\n# _ts_scope: {scope}\n# rows: {len(out)}\n"
    )
    f.write(buf.getvalue())
print(f"wrote {path}: scope={scope}")
