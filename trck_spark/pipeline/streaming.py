"""Structured Streaming forms of the pipeline operators.

A training-data pipeline at scale is fed continuously (crawl output,
log deliveries), so the ingestion-side operators have streaming forms:

- streaming_exact_dedup: first-occurrence exact dedup over a document
  stream.  State is bounded by the event-time watermark
  (dropDuplicatesWithinWatermark): a fingerprint is remembered only for
  the watermark delay, which is the scale-correct semantics — unbounded
  cross-history dedup state on an infinite stream is an OOM by
  construction; historical dedup belongs to the batch operator
  (pipeline/dedup.py), streaming catches the near-term burst dups
  (re-crawls, retries, mirror floods) before they hit storage.
- streaming_doc_stats: per-(window, source) document/token counts with
  watermarked event-time windows — the continuous form of the text
  audit queries, emitting finalized windows only (append mode capable).

Both take an already-constructed streaming DataFrame and return a
transformed streaming DataFrame: sources and sinks stay the caller's
choice (`readStream.parquet`, Kafka, ...), as with the batch operators.
"""

from __future__ import annotations

from trck_spark.pipeline.dedup import NORM, WORDS


def streaming_exact_dedup(
    docs_sdf,
    ts_col: str = "ts",
    delay: str = "1 hour",
):
    """First-occurrence dedup on normalized-text fingerprints.

    Emits each document whose fingerprint was not seen within the
    watermark horizon; later copies inside the horizon are dropped.
    State per key is one fingerprint row, expired automatically when the
    event-time watermark passes it by ``delay``.
    """
    from pyspark.sql import functions as F

    return (
        docs_sdf.withColumn("fingerprint", F.md5(F.expr(NORM)))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_doc_stats(
    docs_sdf,
    ts_col: str = "ts",
    window: str = "10 minutes",
    delay: str = "10 minutes",
):
    """Watermarked per-(window, source) stream aggregation: documents,
    characters, and whitespace tokens.  In append output mode a window
    row is emitted exactly once, when the watermark passes its end."""
    from pyspark.sql import functions as F

    return (
        docs_sdf.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("win"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            F.sum(F.size(F.expr(WORDS))).alias("n_tokens"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "source",
            "n_docs",
            "n_chars",
            "n_tokens",
        )
    )
