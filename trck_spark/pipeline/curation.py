"""Corpus curation operators: sampling, vocabulary, contamination.

These are the selection/auditing steps of a training-data pipeline that
sit between dedup and the final mix:

- quota_sample: deterministic stratified sampling (the "data mixing"
  step — N docs per source, reproducible across runs and engines);
- vocab_topk: global token frequency top-k (tokenizer/vocab audits);
- contamination_check: n-gram overlap of corpus documents against a
  held-out evaluation set (benchmark leak detection).

Scale notes (the 100 TB story):
- quota_sample's rank-filter compiles to Spark's WindowGroupLimit: each
  map task keeps at most N rows per stratum BEFORE the shuffle, so the
  exchange carries O(strata x N), not the corpus;
- vocab_topk is a partial-aggregated word count + TakeOrdered top-k (no
  global sort of the vocabulary);
- contamination_check broadcasts the evaluation shingle set (benchmark
  suites are tiny next to a corpus) — the corpus side is one streamed
  semi-join, no shuffle of corpus shingles.
"""

from __future__ import annotations

from trck_spark.pipeline.dedup import WORDS, spread_input


def quota_sample(spark, sf_dir: str, per_source: int = 10):
    """Deterministic per-source quota sample: the first ``per_source``
    documents of each source in md5(doc_id) order.

    Hash-rank order is the standard trick for reproducible sampling at
    scale: it is stable under reruns, engine-independent (the DuckDB
    oracle reproduces it exactly), and uncorrelated with ingestion order
    — unlike LIMIT, which samples whatever happened to arrive first.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = spread_input(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= per_source)
        .select("doc_id", "source", "rk")
        .orderBy("source", "rk")
    )


def mixture_sample(spark, sf_dir: str, rates: dict | None = None,
                   default_rate: float = 0.1):
    """Deterministic fractional-rate mixture sampling: keep a document
    iff its md5 hash-fraction falls below its source's rate.

    This is the other half of data mixing next to ``quota_sample``:
    quota gives exact per-stratum counts (needs a group-limit), rates
    give proportional thinning with NO shuffle at all — the filter is a
    pure map over the scan, so it composes with predicate pushdown and
    costs nothing extra at 100 TB.  Hash-based keep decisions are stable
    across runs, engines (the DuckDB oracle reproduces them exactly),
    and re-partitions — unlike rand()-based sampling.

    The hash fraction is the first 8 md5 hex chars of the doc_id as a
    32-bit integer; keep iff value < rate * 2^32 (integer threshold, no
    float comparison ambiguity).
    """
    from pyspark.sql import functions as F

    rates = rates if rates is not None else {}
    docs = spread_input(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "source")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    thr = F.lit(int(default_rate * (1 << 32)))
    for src, rate in sorted(rates.items()):
        thr = F.when(
            F.col("source") == src, F.lit(int(rate * (1 << 32)))
        ).otherwise(thr)
    return (
        docs.withColumn("h", h)
        .filter(F.col("h") < thr)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def vocab_topk(spark, sf_dir: str, k: int = 100):
    """Global top-k tokens by frequency (ties broken by token asc, so the
    result set is deterministic and oracle-comparable)."""
    from pyspark.sql import functions as F

    docs = spread_input(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    words = docs.select(
        F.explode(F.expr(WORDS)).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


def contamination_check(spark, sf_dir: str, n_eval: int = 100,
                        hash_mode: str = "xxhash64"):
    """Benchmark-contamination audit: for every corpus document
    (doc_id >= n_eval), the count and ratio of its word-3-gram shingles
    that also appear in the evaluation set (doc_id < n_eval).  Only
    contaminated documents (at least one shared shingle) are returned.

    The doc_id split stands in for a real benchmark table; swap the
    ``evl`` side for `spark.read.parquet(<benchmark>)` in production.
    Shingles are compared through fixed-width hash ids — engine-native
    xxhash64 by default, or 60-bit md5-derived ids under
    ``hash_mode='md5'`` so the DuckDB oracle reproduces the join
    exactly (collision mass negligible either way).
    """
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import _shingle_hashes

    sh = _shingle_hashes(spark, sf_dir, hash_mode=hash_mode).select(
        "doc_id", F.col("h64").alias("h")
    )
    evl = (
        sh.filter(F.col("doc_id") < n_eval)
        .select("h").distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = sh.filter(F.col("doc_id") >= n_eval)
    # ONE corpus pass: left-join the (bounded, broadcastable) eval
    # shingle set and count totals + hits in the same aggregation.
    # The previous two-branch form (totals agg + inner-join agg,
    # joined) shingled the corpus twice — at 100 TB that is two full
    # scans; at sf0.1 it was the round-2->4 wallclock regression.
    ratio = F.col("n_shared") / F.col("n_shingles")
    return (
        corpus.join(F.broadcast(evl), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_shared"),
        )
        .filter(F.col("n_shared") > 0)
        .select(
            "doc_id",
            "n_shared",
            "n_shingles",
            F.floor(ratio * 1000000).cast("long").alias("overlap_e6"),
        )
        .orderBy("doc_id")
    )


def hash_split(spark, sf_dir: str, val_pct: int = 1, test_pct: int = 1):
    """Deterministic train/val/test assignment by document-id hash.

    The standard reproducible-split trick for training corpora: bucket =
    first 8 md5 hex chars of doc_id mod 100; the top ``test_pct`` buckets
    are test, the next ``val_pct`` are val, the rest train.  Properties a
    100 TB pipeline needs and rand() splits lack: stable under reruns,
    partitioning, and incremental ingestion (a document's split never
    changes when new data arrives); engine-independent (the DuckDB
    oracle reproduces every assignment); and a pure map over the scan —
    zero shuffle, composes with predicate pushdown.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    train_hi = 100 - val_pct - test_pct
    split = (
        F.when(F.col("bucket") < train_hi, F.lit("train"))
        .when(F.col("bucket") < train_hi + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("bucket", bucket)
        .select("doc_id", "bucket", split.alias("split"))
        .orderBy("doc_id")
    )


def sequence_pack(spark, sf_dir: str, budget: int = 512,
                  n_shards: int = 8):
    """Training-sequence packing plan: place every document's tokens at a
    deterministic offset inside fixed-``budget`` training sequences.

    The concat-and-cut packing GPT-style training uses: per shard,
    documents are concatenated in hash order and the token stream is cut
    every ``budget`` tokens (documents may straddle a cut — ``bin_first``
    /``bin_last`` give the span).  Emits per doc:
    (shard, start_offset, n_tokens, bin_first, bin_last).

    Scale shape: shard assignment is a pure map (md5 mod n_shards);
    offsets are ONE running-sum window per shard — a single exchange on
    shard id, each shard's cumsum streaming in sort order.  At 100 TB
    n_shards scales with the cluster (shards are independent), and the
    output is exactly the manifest a data loader needs to build packed
    sequences without a global sort of the corpus.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = "size(split(regexp_replace(lower(text), '\\\\s+', ' '), ' '))"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(toks).cast("long").alias("n_tokens"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long")
            % n_shards
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        docs.withColumn("cum", cum)
        .select(
            "doc_id",
            "shard",
            (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / budget)
            .cast("long").alias("bin_first"),
            F.floor((F.col("cum") - 1) / budget)
            .cast("long").alias("bin_last"),
        )
        .orderBy("shard", "start_offset", "doc_id")
    )
