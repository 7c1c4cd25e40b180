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


# ------------------------------------------------ dedup-scale documents

DOCS_GEN_VERSION = 1


def ensure_docs_dataset(spark, path: str, n_docs: int = 5_000_000,
                        n_words: int = 30, vocab: int = 30_000,
                        exact_frac: float = 0.02,
                        near_frac: float = 0.10,
                        boiler_mod: int = 100) -> dict:
    """Generate (once, marker-cached) a documents.parquet corpus at
    ``path`` sized for the dedup pair-family scale bench, and return
    its planted ground truth.

    Layout (all boundaries deterministic in doc_id):
      - [0, orig_hi):       originals — words are pure hash functions
                            of (base_id, position) over a ``vocab``-word
                            vocabulary, so cross-doc shingle collisions
                            are negligible.
      - [orig_hi, near_lo): EXACT duplicates of base = id - orig_hi
                            (byte-identical text; collapses in every
                            dedup operator and makes LSH buckets carry
                            real duplicate mass).
      - [near_lo, n_docs):  NEAR duplicates of base = id - near_lo —
                            words at positions 7/17/27 replaced with a
                            doc-unique word, perturbing <= 9 of the
                            n_words-2 3-gram shingles per side
                            (Jaccard ~0.5 at n_words=30: far above the
                            0.2 bench threshold, so every planted pair
                            is a must-find edge).
      - Boilerplate: docs whose BASE id % boiler_mod == 37 start with
        the same 3 words — a hot-shingle flood (df ~ n_docs/boiler_mod)
        that the inverted-index df-cap must drop and LSH banding must
        shrug off, at scale.

    Ground truth returned: n_exact / n_near planted duplicates,
    expected non-survivor count (n_exact + n_near: every duplicate
    cluster keeps exactly its minimum id = the base), and the planted
    near-pair count.  The generator is pure Catalyst over spark.range —
    no driver-side data, no Python UDF — so 5M docs materialize in
    seconds and the same recipe would scale out on a real cluster.
    """
    n_exact = int(n_docs * exact_frac)
    n_near = int(n_docs * near_frac)
    orig_hi = n_docs - n_exact - n_near
    near_lo = n_docs - n_near
    truth = {
        "n_docs": n_docs, "n_exact": n_exact, "n_near": n_near,
        "orig_hi": orig_hi, "near_lo": near_lo,
        "n_duplicates": n_exact + n_near,
    }
    marker = os.path.join(path, "_GEN.json")
    want = {"v": DOCS_GEN_VERSION, "n_docs": n_docs, "n_words": n_words,
            "vocab": vocab, "exact_frac": exact_frac,
            "near_frac": near_frac, "boiler_mod": boiler_mod}
    try:
        with open(marker) as f:
            if json.load(f) == want:
                return truth
    except (OSError, ValueError):
        pass

    from pyspark.sql import functions as F

    base = (
        f"CASE WHEN id >= {near_lo} THEN id - {near_lo} "
        f"WHEN id >= {orig_hi} THEN id - {orig_hi} ELSE id END"
    )
    word = (
        f"CASE WHEN id >= {near_lo} AND j IN (7, 17, 27) "
        f"THEN concat('p', pmod(xxhash64(id * 31 + j + 1000000000), "
        f"{vocab})) "
        f"WHEN ({base}) % {boiler_mod} = 37 AND j < 3 "
        f"THEN concat('b', j) "
        f"ELSE concat('w', pmod(xxhash64(({base}) * 31 + j), {vocab})) "
        f"END"
    )
    text = (
        f"concat_ws(' ', transform(sequence(0, {n_words - 1}), "
        f"j -> {word}))"
    )
    df = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.expr(text).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(4))).alias("source"),
    )
    df = df.withColumn("n_chars", F.length("text"))
    df.write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    with open(marker, "w") as f:
        json.dump(want, f)
    return truth


# ---------------------------------------------- dedup-scale embeddings

EMB_GEN_VERSION = 1


def ensure_embeddings_dataset(spark, path: str, n_vecs: int = 1_000_000,
                              dim: int = 64,
                              exact_frac: float = 0.02,
                              near_frac: float = 0.10) -> dict:
    """Generate (once, marker-cached) an embeddings.parquet table at
    ``path`` sized for the embedding near-dup scale bench, and return
    its planted ground truth.  Same id layout as the documents
    generator:

      - [0, orig_hi):       originals — coordinates are hash functions
                            of (base_id, j) uniform in [-1, 1]; at
                            dim=64 the expected cosine of two random
                            vectors is ~0 (never near the threshold).
      - [orig_hi, near_lo): EXACT duplicates of base = id - orig_hi
                            (identical vector, cosine 1: must collide
                            in EVERY LSH band, so found-recall on this
                            slice is a hard 1.0 bar).
      - [near_lo, n_vecs):  NEAR duplicates — coordinate j = 0 replaced
                            with an independent hash value (expected
                            cosine ~ (dim-1)/dim ~= 0.98 at dim=64:
                            far above a 0.9 verification threshold;
                            LSH-band detection is probabilistic, so
                            this slice reports recall, not a bar).

    Pure Catalyst over spark.range — no driver data, no Python UDF —
    and deterministic, so reruns and the quantized verification are
    bit-stable."""
    n_exact = int(n_vecs * exact_frac)
    n_near = int(n_vecs * near_frac)
    orig_hi = n_vecs - n_exact - n_near
    near_lo = n_vecs - n_near
    truth = {
        "n_vecs": n_vecs, "dim": dim, "n_exact": n_exact,
        "n_near": n_near, "orig_hi": orig_hi, "near_lo": near_lo,
    }
    marker = os.path.join(path, "_GEN_EMB.json")
    want = {"v": EMB_GEN_VERSION, "n_vecs": n_vecs, "dim": dim,
            "exact_frac": exact_frac, "near_frac": near_frac}
    try:
        with open(marker) as f:
            if json.load(f) == want:
                return truth
    except (OSError, ValueError):
        pass

    from pyspark.sql import functions as F

    base = (
        f"CASE WHEN id >= {near_lo} THEN id - {near_lo} "
        f"WHEN id >= {orig_hi} THEN id - {orig_hi} ELSE id END"
    )
    # uniform in [-1, 1] with 1e-6 resolution (exact under the int64
    # quantization the embedding operators verify with)
    coord = (
        f"CASE WHEN id >= {near_lo} AND j = 0 "
        f"THEN (pmod(xxhash64(id * 127 + 3000000000), 2000001) "
        f"- 1000000) / 1e6 "
        f"ELSE (pmod(xxhash64(({base}) * 131 + j), 2000001) "
        f"- 1000000) / 1e6 END"
    )
    vec = (
        f"transform(sequence(0, {dim - 1}), "
        f"j -> cast(({coord}) AS float))"
    )
    df = spark.range(0, n_vecs, 1, 64).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )
    df.write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )
    with open(marker, "w") as f:
        json.dump(want, f)
    return truth
