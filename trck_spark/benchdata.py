"""Perftest1-shaped benchmark dataset (reference test/perf/perftest1_db.py:9-12
and perftest1.tr:1-5: 100k cookies x 200 events, advertisable_eid = j % seg,
segment_eid = (i+1) % 100 + 1), extended with an event_type column and
session-gapped timestamps so the funnel/sessions/attribution shapes are
non-degenerate at 20M events.

The dataset is deterministic (pure integer arithmetic over the row id), so
the DuckDB oracle reads the exact same parquet files Spark reads and the
baseline comparison is apples-to-apples.
"""

from __future__ import annotations

import json
import os

GEN_VERSION = 3
N_COOKIES = 100_000
N_EVENTS = 200

# 12-slot weighted lookup: view 25%, open 25%, scroll 25%, click/purchase/
# close ~8% each — rare-ish clicks keep funnel/attribution non-trivial.
EVENT_TYPES = [
    "view", "view", "view",
    "click",
    "purchase",
    "open", "open", "open",
    "scroll", "scroll", "scroll",
    "close",
]


def ensure_perf_dataset(spark, path: str, n_cookies: int = N_COOKIES,
                        n_events: int = N_EVENTS) -> str:
    """Generate (once, cached by a _GEN.json marker) the perf dataset at
    `path` and return the path. Columns: uuid, timestamp (epoch s), seq,
    event_type, advertisable_eid, segment_eid."""
    marker = os.path.join(path, "_GEN.json")
    want = {"v": GEN_VERSION, "n_cookies": n_cookies, "n_events": n_events}
    try:
        with open(marker) as f:
            if json.load(f) == want:
                return path
    except (OSError, ValueError):
        pass

    from pyspark.sql import functions as F

    i = F.col("i")
    j = F.col("j")
    seg = ((i + 1) % 100) + 1
    # per-trail timestamps step 120 s, with a 1-hour jump every 10 events
    # (phase-shifted by trail) -> ~20 distinct 30-minute sessions per trail
    ts = (
        F.lit(1_000_000)
        + j * 120
        + F.floor((j + (i % 10)) / 10).cast("long") * 3600
    )
    type_idx = ((i + j * 5 + F.floor(j / 7).cast("long")) % 12 + 1).cast("int")
    df = (
        spark.range(n_cookies * n_events)
        .select(
            (F.col("id") / n_events).cast("long").alias("i"),
            (F.col("id") % n_events).cast("long").alias("j"),
        )
        .select(
            F.concat(F.lit("u"), i).alias("uuid"),
            ts.alias("timestamp"),
            j.alias("seq"),
            F.element_at(
                F.array(*[F.lit(t) for t in EVENT_TYPES]), type_idx
            ).alias("event_type"),
            (j % seg).cast("string").alias("advertisable_eid"),
            seg.cast("string").alias("segment_eid"),
        )
    )
    (
        df.repartition(32, "uuid")
        .sortWithinPartitions("uuid", "timestamp", "seq")
        .write.mode("overwrite")
        .parquet(path)
    )
    with open(marker, "w") as f:
        json.dump(want, f)
    return path
