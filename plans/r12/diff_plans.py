"""Normalized diff of <q>_before.txt vs <q>_after.txt plan captures.

Strips expression IDs (#123), plan_id= numbers, temp/cache names and
path hashes so two captures of the SAME physical plan compare equal.
Prints per-query CHANGED/IDENTICAL and exits nonzero if any declared
query's plan changed.
"""
import glob
import os
import re
import sys

out_dir = os.path.dirname(os.path.abspath(__file__))


def norm(text: str) -> str:
    t = re.sub(r"#\d+[A-Za-z]*", "#N", text)
    t = re.sub(r"plan_id=\d+", "plan_id=N", t)
    t = re.sub(r"\[plan_id=N\]", "", t)
    t = re.sub(r"(store_cache|trck_store|tmp)[/_][0-9a-f]{6,}",
               r"\1_HASH", t)
    t = re.sub(r"[0-9a-f]{12,}", "HASH", t)
    t = re.sub(r"suffix: \w+", "suffix: X", t)
    t = re.sub(r"Statistics\([^)]*\)", "Statistics(X)", t)
    t = re.sub(r"cachedName=[^\s,)]+", "cachedName=X", t)
    t = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", t)
    t = re.sub(r"trck_fpstore_\w+", "trck_fpstore_X", t)
    return t


changed = []
for bf in sorted(glob.glob(os.path.join(out_dir, "*_before.txt"))):
    q = os.path.basename(bf)[: -len("_before.txt")]
    af = os.path.join(out_dir, f"{q}_after.txt")
    if not os.path.exists(af):
        print(f"{q}: MISSING after capture")
        changed.append(q)
        continue
    with open(bf) as f:
        b = norm(f.read())
    with open(af) as f:
        a = norm(f.read())
    status = "IDENTICAL" if a == b else "CHANGED"
    if a != b:
        changed.append(q)
    print(f"{q}: {status}")
print(f"\n{len(changed)} changed: {changed}")
sys.exit(1 if changed else 0)
