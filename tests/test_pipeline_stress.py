"""Scale smoke for the dedup family: 100k synthetic documents (20x the
sf0.1 bench corpus) with planted near-duplicate pairs.  Verifies the
banded MinHash pipeline still finds the planted pairs (recall) and that
candidate volume stays bounded (the LSH shape holds, no all-pairs
blowup) at a size where an O(n^2) regression would time out the suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_DOCS = 100_000
N_PLANTED = 300
VOCAB = 50_000
WORDS_PER_DOC = 40


@pytest.fixture(scope="module")
def stress_dir(tmp_path_factory):
    rng = np.random.RandomState(7)
    words = np.array([f"w{i}" for i in range(VOCAB)])
    base = rng.randint(0, VOCAB, size=(N_DOCS, WORDS_PER_DOC))
    # plant near-dups: doc N_DOCS-N_PLANTED+i is doc i with 4 of 40
    # words mutated (~0.72 shingle Jaccard, far above threshold 0.2)
    for i in range(N_PLANTED):
        src = base[i].copy()
        pos = rng.choice(WORDS_PER_DOC, size=4, replace=False)
        src[pos] = rng.randint(0, VOCAB, size=4)
        base[N_DOCS - N_PLANTED + i] = src
    texts = [" ".join(words[row]) for row in base]
    d = tmp_path_factory.mktemp("stress")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * N_DOCS),
                "source": pa.array(
                    [f"src{i % 20}" for i in range(N_DOCS)]
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_minhash_100k_planted_recall(spark, stress_dir):
    from trck_spark.pipeline.dedup import minhash_lsh_pairs

    rows = minhash_lsh_pairs(spark, stress_dir, threshold=0.2).collect()
    found = {(r["a"], r["b"]) for r in rows}
    planted = {
        (i, N_DOCS - N_PLANTED + i) for i in range(N_PLANTED)
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"planted-pair recall {recall}"
    # random 40-word docs over a 50k vocab share no shingles; output
    # must stay within planted + a small accidental margin, NOT O(n^2)
    assert len(found) <= len(planted) * 2


def test_exact_dedup_100k(spark, stress_dir):
    from trck_spark.pipeline.dedup import exact_dedup

    out = exact_dedup(spark, stress_dir)
    n = out.count()
    # planted near-dups are not byte-identical, so fingerprints are
    # (near-certainly) all distinct
    assert n == N_DOCS


def test_connected_components_giant_chain(spark):
    """Adversarial giant component: ONE cluster spanning 50% of 100k
    nodes, shaped as a maximal-diameter chain — the worst case for both
    convergence (diameter 50k) and the documented pointer-jumping skew
    (every member ultimately joins on the root label; AQE skew-join is
    on in the session).  Label depth under propagate+jump follows
    d_{k+1} = 2(d_k + 1), so rounds must stay <= ceil(log2(diameter)) + 2
    — a regression to propagation-only would need ~50k rounds and trips
    max_iters instead."""
    import math
    import time

    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import connected_components

    n, k = 100_000, 50_000
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    e = spark.range(k - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    t0 = time.time()
    labels, rounds = connected_components(nodes, sym, max_iters=25)
    in_giant = labels.filter(F.col("cluster_id") == 0).count()
    elapsed = time.time() - t0
    assert in_giant == k
    bound = math.ceil(math.log2(k)) + 2
    assert rounds <= bound, (rounds, bound)
    # singletons keep their own label
    strays = labels.filter(
        (F.col("doc_id") >= k) & (F.col("cluster_id") != F.col("doc_id"))
    ).count()
    assert strays == 0
    # wall-clock bound: O(log diameter) rounds of bounded joins — a
    # super-linear blowup (skew mishandling, lineage growth) trips this
    assert elapsed < 420, f"giant-component CC took {elapsed:.0f}s"


def test_dedup_clusters_100k_planted(spark, stress_dir):
    """The full keep/drop path at 100k docs: every planted near-dup pair
    must co-cluster, and the label set must cover the corpus."""
    from trck_spark.pipeline.dedup import dedup_clusters

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(spark, stress_dir, threshold=0.2).collect()
    }
    assert len(labels) == N_DOCS
    co = sum(
        labels[i] == labels[N_DOCS - N_PLANTED + i]
        for i in range(N_PLANTED)
    )
    # ngram edges are exact: every planted pair (J >= 0.52 >> 0.2) has an
    # edge, so co-clustering must be total
    assert co == N_PLANTED
