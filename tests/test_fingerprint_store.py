"""FingerprintStore: persisted corpus fingerprints + bloom front for
incremental dedup (round-3 verdict item 5).

The claims under test:
1. incremental_dedup_apply classifies against the ARTIFACT — after the
   corpus documents are deleted from disk, apply still runs, and its
   physical plan references no corpus document files (proof of
   no-rescan).
2. The bloom front never produces a false NEGATIVE: every true
   corpus_dup is still flagged (bloom false positives only cost a
   wasted exact-join probe, never a wrong answer).
3. The store round-trips through a fresh-session open (DDL re-register,
   no rewrite).
4. Store-backed classification == the single-pass incremental_dedup
   semantics on the same data.
"""

from __future__ import annotations

import os
import shutil

import pytest

pyspark = pytest.importorskip("pyspark")


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


@pytest.fixture(scope="module")
def fp_setup(spark, tmp_path_factory):
    from trck_spark.pipeline import dedup

    base = tmp_path_factory.mktemp("fpstore")
    corpus_path = str(base / "corpus.parquet")
    store_path = str(base / "store")
    corpus_rows = [
        (i, "src0", f"corpus document number {i} with shared words")
        for i in range(50)
    ]
    _write_docs(spark, corpus_path, corpus_rows)
    corpus_df = spark.read.parquet(corpus_path)
    dedup.write_fingerprint_store(corpus_df, store_path, n_buckets=4)
    # delete the corpus documents: everything after this point MUST run
    # off the artifact alone
    shutil.rmtree(corpus_path)
    return store_path, corpus_rows


def test_apply_without_corpus_documents(spark, fp_setup):
    from trck_spark.pipeline import dedup

    store_path, corpus_rows = fp_setup
    batch = spark.createDataFrame(
        [
            # true corpus dups (same text as corpus docs 3 and 7)
            (100, "src1", corpus_rows[3][2]),
            (101, "src1", corpus_rows[7][2]),
            # batch-internal dup pair
            (102, "src1", "a fresh incoming document"),
            (103, "src1", "a fresh incoming document"),
            # genuinely new
            (104, "src1", "another new document entirely"),
        ],
        "doc_id long, source string, text string",
    )
    out = dedup.incremental_dedup_apply(spark, batch, store_path)
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {
        100: "corpus_dup",
        101: "corpus_dup",
        102: "kept",
        103: "batch_dup",
        104: "kept",
    }
    # no-rescan proof: the plan scans the store artifact, never a
    # corpus document file
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "corpus.parquet" not in plan
    assert "fpstore" in plan or "store" in plan


def test_bloom_no_false_negatives(spark, fp_setup):
    """Every corpus fingerprint probed against the bloom passes (the
    defining bloom property); a batch of ALL corpus texts classifies
    100% corpus_dup."""
    from trck_spark.pipeline import dedup

    store_path, corpus_rows = fp_setup
    batch = spark.createDataFrame(
        [(1000 + i, "src1", t) for i, (_i, _s, t) in enumerate(corpus_rows)],
        "doc_id long, source string, text string",
    )
    out = dedup.incremental_dedup_apply(spark, batch, store_path)
    statuses = {r["status"] for r in out.collect()}
    assert statuses == {"corpus_dup"}


def test_store_reopen_and_manifest(spark, fp_setup):
    from trck_spark.pipeline import dedup

    store_path, corpus_rows = fp_setup
    fp_df, manifest = dedup.open_fingerprint_store(spark, store_path)
    assert manifest["n_fp"] == fp_df.count() == 50
    assert manifest["bloom"]["k"] >= 1
    assert manifest["bloom"]["m"] >= 64
    # bloom sidecar word count is bounded by the bitmap size
    bloom = spark.read.parquet(os.path.join(store_path, "bloom"))
    assert bloom.count() <= manifest["bloom"]["m"] // 64 + 1


def test_store_matches_single_pass_operator(spark, tmp_path):
    """Same documents table -> store-backed apply equals the one-shot
    incremental_dedup classification row-for-row."""
    from pyspark.sql import functions as F

    from trck_spark.pipeline import dedup

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    rows = []
    for i in range(30):
        rows.append((i, "src0", f"corpus text {i % 20}"))  # corpus w/ dups
    for i in range(30, 60):
        rows.append((i, "src1", f"{'corpus' if i % 3 == 0 else 'new'} "
                                f"text {i % 25}"))
    _write_docs(spark, f"{sf_dir}/documents.parquet", rows)

    expect = {
        (r["doc_id"], r["fingerprint"]): r["status"]
        for r in dedup.incremental_dedup(spark, sf_dir).collect()
    }

    store_path = str(tmp_path / "store")
    corpus_docs = spark.read.parquet(
        f"{sf_dir}/documents.parquet"
    ).filter(F.col("source") == "src0")
    dedup.write_fingerprint_store(corpus_docs, store_path, n_buckets=4)
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("source") != "src0"
    )
    got = {
        (r["doc_id"], r["fingerprint"]): r["status"]
        for r in dedup.incremental_dedup_apply(
            spark, batch, store_path
        ).collect()
    }
    assert got == expect
