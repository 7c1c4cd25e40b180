"""Streaming pipeline operators: exact dedup and windowed doc stats,
driven through a file stream (one parquet per micro-batch) and compared
against the equivalent batch computation on the same rows.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_batches(tmp_path):
    """Three micro-batches with duplicate texts within and across
    batches.  Timestamps advance so the watermark moves between
    batches."""
    d = tmp_path / "stream_in"
    d.mkdir()
    batches = [
        # (doc_id, ts_seconds, source, text)
        [
            (0, 100, "src0", "alpha beta gamma"),
            (1, 110, "src0", "delta epsilon zeta"),
            (2, 120, "src1", "alpha beta gamma"),  # in-batch dup of 0
        ],
        [
            (3, 700, "src0", "alpha beta gamma"),  # cross-batch dup of 0
            (4, 710, "src1", "eta theta iota"),
        ],
        [
            (5, 99999, "src1", "kappa lambda mu"),  # pushes watermark far
        ],
    ]
    rows = [r for b in batches for r in b]
    for i, b in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in b], pa.int64()),
                    "ts": pa.array(
                        [r[1] * 1_000_000 for r in b],
                        pa.timestamp("us"),
                    ),
                    "source": pa.array([r[2] for r in b]),
                    "text": pa.array([r[3] for r in b]),
                }
            ),
            str(d / f"b{i}.parquet"),
        )
        # FileStreamSource orders files by modification time, breaking
        # ties arbitrarily — under CPU load two writes can land in the
        # same ms, letting the watermark-flush file process before the
        # late-arrival file.  Pin strictly increasing mtimes.
        os.utime(str(d / f"b{i}.parquet"), (1_700_000_000 + i,
                                            1_700_000_000 + i))
    return d, rows


def _run_stream(spark, src_dir, transform, out_mode):
    sdf = (
        spark.readStream.schema(
            "doc_id long, ts timestamp, source string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    collected: list = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    q = (
        transform(sdf)
        .writeStream.foreachBatch(sink)
        .outputMode(out_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return collected


def test_streaming_session_features_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization must produce the same closed
    sessions as the batch operator: same (user, session_start) keys,
    same features.  Sessions close mid-stream on gaps and at the end
    via the event-time timeout once the sentinel advances the
    watermark."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from trck_spark.pipeline.streaming import streaming_session_features

    d = tmp_path / "sess_in"
    d.mkdir()
    batches = [
        # (user_id, ts_s, event_id, event_type)
        [
            (1, 100, 0, "view"),
            (1, 200, 1, "click"),
            (2, 150, 2, "purchase"),
        ],
        [
            (1, 3000, 3, "view"),      # gap 2800 -> new session for u1
            (2, 500, 4, "view"),       # continues u2's session
        ],
        [
            (999, 1_000_000, 5, "view"),  # sentinel: watermark flush
        ],
    ]
    for i, b in enumerate(batches):
        pq.write_table(
            pa.table({
                "user_id": pa.array([r[0] for r in b], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in b], pa.timestamp("us")
                ),
                "event_id": pa.array([r[2] for r in b], pa.int64()),
                "event_type": pa.array([r[3] for r in b]),
            }),
            str(d / f"b{i}.parquet"),
        )
        # pin strictly increasing mtimes: FileStreamSource orders by
        # modification time with arbitrary tie-break (see _write_batches)
        os.utime(str(d / f"b{i}.parquet"), (1_700_000_000 + i,
                                            1_700_000_000 + i))

    sdf = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    collected: list = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    q = (
        streaming_session_features(sdf, delay="10 seconds")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], r["n_clicks"],
            r["has_purchase"],
        )
        for r in collected
        if r["user_id"] != 999  # sentinel's own session may stay open
    }

    # batch reference: same gap rule over the same (non-sentinel) rows
    from trck_spark.pipeline.streaming import _epoch_s

    raw = spark.read.parquet(str(d)).filter(F.col("user_id") != 999)
    ev = raw.select(
        "user_id", _epoch_s(raw, "ts").alias("t"),
        "event_id", "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.withColumn(
        "new_sess",
        F.when(F.col("t") < F.lag("t").over(w) + 1800, 0).otherwise(1),
    ).withColumn(
        "sidx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    expect = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], r["n_clicks"],
            r["has_purchase"],
        )
        for r in (
            marked.groupBy("user_id", "sidx")
            .agg(
                F.min("t").alias("session_start"),
                F.count(F.lit(1)).alias("n_events"),
                (F.max("t") - F.min("t")).alias("duration_s"),
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                ).alias("n_clicks"),
                F.max(
                    F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)
                ).cast("boolean").alias("has_purchase"),
            )
            .collect()
        )
    }
    assert got == expect


def test_streaming_session_out_of_order(spark, tmp_path):
    """Cross-micro-batch late arrival within the watermark: a later
    batch delivers an event with t EARLIER than the open session's
    start.  The interval merge must extend the session downward
    (session_start moves to the late event) and a gap-separated late
    event must close as its own earlier session — matching batch
    semantics, not absorbing into the open session with an unchanged
    start (round-3 ADVICE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trck_spark.pipeline.streaming import streaming_session_features

    d = tmp_path / "sess_ooo"
    d.mkdir()
    batches = [
        # (user_id, ts_s, event_id, event_type)
        [(1, 5000, 0, "view"), (1, 5100, 1, "click")],
        # late arrivals: 4900 merges into the open session (start must
        # drop to 4900); 100 is >= gap older -> its own earlier session
        [(1, 4900, 2, "view"), (1, 100, 3, "purchase")],
        [(999, 1_000_000, 4, "view")],  # sentinel: watermark flush
    ]
    for i, b in enumerate(batches):
        pq.write_table(
            pa.table({
                "user_id": pa.array([r[0] for r in b], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in b], pa.timestamp("us")
                ),
                "event_id": pa.array([r[2] for r in b], pa.int64()),
                "event_type": pa.array([r[3] for r in b]),
            }),
            str(d / f"b{i}.parquet"),
        )
        # pin strictly increasing mtimes: FileStreamSource orders by
        # modification time with arbitrary tie-break (see _write_batches)
        os.utime(str(d / f"b{i}.parquet"), (1_700_000_000 + i,
                                            1_700_000_000 + i))
    sdf = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    collected: list = []

    q = (
        streaming_session_features(sdf, delay="2 hours")
        .writeStream.foreachBatch(
            lambda bdf, _bid: collected.extend(bdf.collect())
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], r["n_clicks"],
            r["has_purchase"],
        )
        for r in collected
        if r["user_id"] != 999
    }
    assert got == {
        (1, 100): (1, 0, 0, True),
        (1, 4900): (3, 200, 1, False),
    }


def test_streaming_exact_dedup(spark, tmp_path):
    from trck_spark.pipeline.streaming import streaming_exact_dedup

    src, rows = _write_batches(tmp_path)
    out = _run_stream(
        spark, src, lambda s: streaming_exact_dedup(s, delay="1 hour"),
        "append",
    )
    kept = {r["doc_id"] for r in out}
    # one of the in-batch dups {0, 2} survives (batch-internal pick is
    # not order-defined), doc 3 (dup within the 1h watermark horizon)
    # is dropped, everything else survives
    assert {1, 4, 5} <= kept
    assert len(kept & {0, 2}) == 1
    assert 3 not in kept
    assert len(out) == 4


def test_streaming_incremental_dedup(spark, tmp_path):
    """Stream-static incremental dedup: corpus dups (fingerprint in the
    persisted FingerprintStore) are dropped by the anti-join, burst
    dups within the stream by the watermark dedup; only genuinely new
    documents come out — and the corpus documents are never read (the
    store is built from a frame and the stream plan touches only the
    artifact)."""
    from trck_spark.pipeline.dedup import write_fingerprint_store
    from trck_spark.pipeline.streaming import streaming_incremental_dedup

    store_path = str(tmp_path / "fpstore")
    corpus = spark.createDataFrame(
        [(9000, "src0", "alpha beta gamma"),      # dup of stream docs 0/2/3
         (9001, "src0", "known corpus text")],
        "doc_id long, source string, text string",
    )
    write_fingerprint_store(corpus, store_path, n_buckets=2)

    src, rows = _write_batches(tmp_path)
    out = _run_stream(
        spark, src,
        lambda s: streaming_incremental_dedup(
            s, store_path, delay="1 hour"
        ),
        "append",
    )
    kept = {r["doc_id"] for r in out}
    # docs 0, 2, 3 are corpus dups (alpha beta gamma) -> dropped by the
    # static join; 1, 4, 5 are new and unique -> kept
    assert kept == {1, 4, 5}
    # emitted rows carry the fingerprint for downstream store refresh
    assert all(len(r["fingerprint"]) == 32 for r in out)


def test_streaming_doc_stats_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from trck_spark.pipeline.streaming import streaming_doc_stats

    src, rows = _write_batches(tmp_path)
    out = _run_stream(
        spark, src,
        lambda s: streaming_doc_stats(
            s, window="10 minutes", delay="10 minutes"
        ),
        "append",
    )
    # append mode emits only windows the final watermark passed — that's
    # every window except the last event's own
    got = {
        (r["win_start"], r["source"]): (
            r["n_docs"], r["n_chars"], r["n_tokens"]
        )
        for r in out
    }
    assert got, "watermark should have finalized at least one window"
    batch = (
        spark.read.parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
        )
        .collect()
    )
    expect = {
        (r["win"]["start"], r["source"]): (
            r["n_docs"], r["n_chars"], r["n_tokens"]
        )
        for r in batch
    }
    for k, v in got.items():
        assert expect[k] == v, (k, v, expect[k])
