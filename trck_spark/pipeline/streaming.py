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


def streaming_incremental_dedup(
    docs_sdf,
    store_path: str,
    ts_col: str = "ts",
    delay: str = "1 hour",
):
    """Continuous ingestion against a persisted corpus: the streaming
    form of ``dedup.incremental_dedup_apply``.

    Two dedup layers, both scale-bounded:
    1. STREAM-STATIC anti-join against the FingerprintStore's bucketed
       fingerprint table (``dedup.write_fingerprint_store``): documents
       whose fingerprint already exists in the corpus are dropped.  The
       static side is the materialized artifact — the corpus documents
       are never re-scanned, and the join is a per-micro-batch hash
       join against a fingerprint-bucketed table (only the batch side
       shuffles).  The bloom sidecar is a batch-side optimization; the
       stream path relies on the bucketed join alone (a bloom probe
       would need a per-fingerprint aggregation — extra stream state
       costing more than the hash join it would front).
    2. In-stream first-occurrence dedup within the watermark horizon
       (``dropDuplicatesWithinWatermark``) for burst duplicates —
       re-crawls and retries that arrive before any corpus refresh.

    The store is refreshed OUTSIDE the stream (rebuild or append via
    ``write_fingerprint_store``); a restarted stream picks up the new
    snapshot.  Emitted rows carry ``fingerprint`` so a downstream sink
    can append them to the store for the next refresh cycle.
    """
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import open_fingerprint_store

    spark = docs_sdf.sparkSession
    corpus, _manifest = open_fingerprint_store(spark, store_path)
    return (
        docs_sdf.withColumn("fingerprint", F.md5(F.expr(NORM)))
        .join(corpus, "fingerprint", "left_anti")
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def _epoch_s(df, ts_col: str):
    """Epoch-seconds column for either timestamp flavor: TIMESTAMP_NTZ
    (how parquet timestamp[us] reads) forbids a direct BIGINT cast, so
    it goes through a timezone-free timestampdiff."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"{ts_col})"
        ).cast("long")
    return F.col(ts_col).cast("long")


SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, n_events long, duration_s long, "
    "n_clicks long, has_purchase boolean"
)
# open-session accumulator: exists only while a session is open
SESSION_STATE_SCHEMA = (
    "start long, last long, n long, clicks long, purch int"
)


def streaming_session_features(
    events_sdf,
    user_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    type_col: str = "event_type",
    gap_s: int = 1800,
    delay: str = "10 seconds",
):
    """Continuous sessionization: the streaming form of
    ``queries.q_session_features`` via ``applyInPandasWithState``.

    Emits one row per CLOSED session — closed either by a >= gap_s
    event-time gap (the next event opens a new session) or by the
    event-time watermark passing ``last_ts + gap_s`` (EventTimeTimeout
    fires for idle users).  State per user is one open-session
    accumulator (5 scalars), removed on close: bounded by the number
    of concurrently-active users inside the watermark horizon, the
    scale-correct semantics for an infinite stream.

    Column parity with the batch operator except ``sess_idx``: a
    global per-user session number needs state that outlives the
    session (unbounded on an infinite stream), so the streaming form
    identifies sessions by (user_id, session_start) instead — the
    equivalence test joins the two forms on exactly that key.

    Out-of-order arrival: each step merges the open-session interval
    with the batch's events in event-time order, so a late event
    (within the watermark) that lands BEFORE the open session's start
    extends the session downward (session_start moves earlier) or, if
    gap-separated from it, closes as its own earlier session — the
    same sessions the batch operator computes.  Batch equivalence
    therefore holds for any arrival order in which an event reaches
    the operator before its session's row has been emitted; an event
    arriving after its session was already closed out (its
    event-time neighbors were >= gap_s newer, or the watermark fired
    the timeout) starts a new session where batch would have merged —
    the unavoidable cost of emitting finalized rows from bounded
    state.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    df = (
        events_sdf.select(
            F.col(user_col).cast("long").alias("__u"),
            F.col(ts_col).alias("__event_time"),
            _epoch_s(events_sdf, ts_col).alias("__t"),
            F.col(seq_col).cast("long").alias("__seq"),
            F.col(type_col).cast("string").alias("__et"),
        )
        .withWatermark("__event_time", delay)
    )

    def step(key, pdf_iter, state):
        import pandas as pd

        def row(start, last, n, clicks, purch):
            return (
                key[0], start, n, last - start, clicks, bool(purch)
            )

        out = []
        if state.hasTimedOut:
            out.append(row(*state.get))
            state.remove()
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in
                              SESSION_OUT_SCHEMA.split(", ")]
            )
            return

        events: list = []
        for pdf in pdf_iter:
            events.extend(
                zip(pdf["__t"].tolist(), pdf["__seq"].tolist(),
                    pdf["__et"].tolist())
            )
        events.sort(key=lambda e: (e[0], e[1]))

        # interval merge over (open-session state + batch events) in
        # event-time order: a late event with t < state.start either
        # merges (moving session_start downward) or splits off as its
        # own earlier session — matching the batch operator for any
        # not-yet-emitted session (see docstring)
        intervals: list = (
            [list(state.get)] if state.exists else []
        )
        for t, _seq, et in events:
            intervals.append(
                [t, t, 1, 1 if et == "click" else 0,
                 1 if et == "purchase" else 0]
            )
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list = []
        for iv in intervals:
            if merged and iv[0] < merged[-1][1] + gap_s:
                m = merged[-1]
                m[0] = min(m[0], iv[0])
                m[1] = max(m[1], iv[1])
                m[2] += iv[2]
                m[3] += iv[3]
                m[4] = max(m[4], iv[4])
            else:
                merged.append(list(iv))
        out.extend(row(*m) for m in merged[:-1])
        open_s = merged[-1] if merged else None

        if open_s is not None:
            state.update(tuple(open_s))
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max((open_s[1] + gap_s) * 1000, wm + 1)
            )
        if out:
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in
                              SESSION_OUT_SCHEMA.split(", ")]
            )

    return df.groupBy("__u").applyInPandasWithState(
        step,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
