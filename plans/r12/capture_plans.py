"""Capture .explain("formatted") for every declared query.

Usage: python plans/r12/capture_plans.py <suffix> [only,names]
Writes plans/r12/<query>_<suffix>.txt for each declared query.
explain() only plans — nothing executes except store/cache builds a
query performs while constructing its DataFrame.
"""
import io
import os
import sys
import contextlib
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.dirname(os.path.abspath(__file__))

import __spark_entry__ as entry
from trck_spark.session import get_spark

spark = get_spark("plan_capture")
spark.sparkContext.setLogLevel("ERROR")

for name, fn in sorted(entry.queries().items()):
    if only and name not in only:
        continue
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    try:
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
    except Exception:
        text = "CAPTURE ERROR\n" + traceback.format_exc()
    with open(path, "w") as f:
        f.write(f"# query: {name}  sf_dir: {sf_dir}  suffix: {suffix}\n")
        f.write(text)
    print(f"{name}: {len(text)} bytes")
print("done")
