"""Pipeline query registry: name -> (spark fn, oracle SQL | None)."""

from __future__ import annotations

from trck_spark.pipeline import curation, dedup, multimodal, similarity, text


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(spark, sf_dir)


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(spark, sf_dir, threshold=0.2)


def q_minhash_lsh_pairs(spark, sf_dir):
    # hash_mode='md5' so the DuckDB oracle reproduces every derived hash
    # (the correctness-gate variant; the library/bench default is the
    # engine-native xxhash64 — same algorithm, faster hash)
    return dedup.minhash_lsh_pairs(spark, sf_dir, threshold=0.2,
                                   hash_mode="md5")


def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(spark, sf_dir, max_hamming=3,
                               hash_mode="md5")


def q_embedding_near_dup_pairs(spark, sf_dir):
    return dedup.embedding_near_dup_pairs(spark, sf_dir, threshold=0.4)


def q_dedup_clusters(spark, sf_dir):
    return dedup.dedup_clusters(spark, sf_dir, threshold=0.2)


def q_dedup_apply(spark, sf_dir):
    return dedup.dedup_apply(spark, sf_dir, threshold=0.2)


def q_quota_sample(spark, sf_dir):
    return curation.quota_sample(spark, sf_dir, per_source=10)


def q_mixture_sample(spark, sf_dir):
    return curation.mixture_sample(
        spark, sf_dir,
        rates={"src0": 0.5, "src1": 0.25}, default_rate=0.1,
    )


def q_vocab_topk(spark, sf_dir):
    return curation.vocab_topk(spark, sf_dir, k=100)


def q_contamination_check(spark, sf_dir):
    return curation.contamination_check(spark, sf_dir, n_eval=100,
                                        hash_mode="md5")


def q_ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(spark, sf_dir, k=5, n_queries=5)


def q_ann_cosine_topk_lsh(spark, sf_dir):
    return similarity.cosine_topk_lsh(spark, sf_dir, k=5)


def q_ann_cosine_topk_ivf_pivot(spark, sf_dir):
    return similarity.cosine_topk_ivf_pivot(spark, sf_dir, k=5)


def q_knn_label_vote(spark, sf_dir):
    return similarity.knn_label_vote(spark, sf_dir, k=10, n_queries=20)


def q_lang_id(spark, sf_dir):
    return text.lang_id(spark, sf_dir)


def q_text_quality(spark, sf_dir):
    return text.text_quality(spark, sf_dir)


def q_token_stats(spark, sf_dir):
    return text.token_stats(spark, sf_dir)


def q_doc_fingerprint(spark, sf_dir):
    return text.doc_fingerprint(spark, sf_dir)


def q_image_metadata(spark, sf_dir):
    return multimodal.image_metadata(spark, sf_dir)


def q_audio_frame_sample(spark, sf_dir):
    return multimodal.audio_frame_sample(spark, sf_dir)


def q_video_frame_sample(spark, sf_dir):
    return multimodal.video_frame_sample(spark, sf_dir)


def q_ngram_containment_pairs(spark, sf_dir):
    return dedup.ngram_containment_pairs(spark, sf_dir, threshold=0.5)


def q_repetition_stats(spark, sf_dir):
    return text.repetition_stats(spark, sf_dir)


def q_hash_split(spark, sf_dir):
    return curation.hash_split(spark, sf_dir)


def q_sequence_pack(spark, sf_dir):
    return curation.sequence_pack(spark, sf_dir)


def q_pii_stats(spark, sf_dir):
    return text.pii_stats(spark, sf_dir)


def q_tfidf_topterms(spark, sf_dir):
    return text.tfidf_topterms(spark, sf_dir)


def q_dup_span_stats(spark, sf_dir):
    return dedup.dup_span_stats(spark, sf_dir)


def q_semantic_dedup(spark, sf_dir):
    return dedup.semantic_dedup(spark, sf_dir)


def q_incremental_dedup(spark, sf_dir):
    """Merged gate row (round 8): the LOGICAL incremental-dedup plan and
    the FingerprintStore-ARTIFACT plan classify the same batch — same
    rows by construction, radically different physical stories (the
    store path never re-scans the corpus).  Tagging each with a `path`
    column and unioning puts BOTH physical paths under one driver
    hash-check, freeing a registry slot for the round-8
    trck_count_by_type_store_ts row (the driver's correctness budget
    cuts at exactly 50 rows — see q_text_metrics / COVERAGE round-5
    registry note)."""
    from pyspark.sql import functions as F

    logical = dedup.incremental_dedup(spark, sf_dir).withColumn(
        "path", F.lit("logical")
    )
    store = _incremental_dedup_store(spark, sf_dir).withColumn(
        "path", F.lit("store")
    )
    return logical.unionByName(store)


# built FingerprintStores per sf_dir (process lifetime): the two-phase
# query builds the corpus artifact once, then every apply — including
# the driver's own repeat runs — joins against it without re-scanning
# the corpus documents (the point of the operator)
_FP_STORES: dict = {}


def _incremental_dedup_store(spark, sf_dir):
    """Two-phase incremental dedup: materialize the src0 corpus as a
    FingerprintStore (bucketed fingerprints + bloom sidecar), then
    classify the incoming batch against the ARTIFACT — same rows as
    the logical plan, different physical story (no corpus re-scan;
    see dedup.incremental_dedup_apply).  Constituent of the merged
    q_incremental_dedup gate row."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    path = _FP_STORES.get(sf_dir)
    if path is None or not os.path.exists(
        os.path.join(path, dedup.FP_MANIFEST)
    ):
        path = tempfile.mkdtemp(prefix="trck_fpstore_")
        corpus_docs = spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).filter(F.col("source") == "src0")
        dedup.write_fingerprint_store(
            dedup.spread_input(spark, corpus_docs), path
        )
        _FP_STORES[sf_dir] = path
    batch = dedup.spread_input(
        spark,
        spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("source") != "src0"
        ),
    )
    return dedup.incremental_dedup_apply(spark, batch, path)


def q_text_metrics(spark, sf_dir):
    """Merged text-analysis gate row: lang_id + text_quality +
    token_stats + doc_fingerprint + repetition_stats + pii_stats +
    lm_score inner-joined on doc_id (each emits exactly one row per document
    with disjoint metric columns, so the join is 1:1 and the driver's
    value hash covers every constituent operator's full output).

    Merged so the whole registry fits the driver's 50-row correctness
    budget in a single round — rounds 3/4 each left a 7-row stale tail
    (VERDICT r04 item 2).  The six operators stay independent library
    functions (and keep their own oracle-parity tests + bench rows);
    only the driver-gate registry row is combined."""
    from functools import reduce

    dfs = [
        text.lang_id(spark, sf_dir),
        text.text_quality(spark, sf_dir),
        text.token_stats(spark, sf_dir),
        text.doc_fingerprint(spark, sf_dir),
        text.repetition_stats(spark, sf_dir),
        text.pii_stats(spark, sf_dir),
        text.lm_score(spark, sf_dir),
    ]
    return reduce(lambda l_, r: l_.join(r, "doc_id"), dfs).orderBy(
        "doc_id"
    )


def text_metrics_oracle_sql() -> str:
    from trck_spark.pipeline.text import (
        doc_fingerprint_oracle_sql,
        lang_id_oracle_sql,
        lm_score_oracle_sql,
        pii_stats_oracle_sql,
        repetition_stats_oracle_sql,
        text_quality_oracle_sql,
        token_stats_oracle_sql,
    )

    subs = [
        lang_id_oracle_sql(),
        text_quality_oracle_sql(),
        token_stats_oracle_sql(),
        doc_fingerprint_oracle_sql(),
        repetition_stats_oracle_sql(),
        pii_stats_oracle_sql(),
        lm_score_oracle_sql(),
    ]
    joined = f"({subs[0]}) t0"
    for i, s in enumerate(subs[1:], 1):
        joined += f" JOIN ({s}) t{i} USING (doc_id)"
    return f"SELECT * FROM {joined} ORDER BY doc_id"


def q_ann_cosine_methods(spark, sf_dir):
    """Merged ANN gate row: exact / LSH-bucketed / IVF-pivot cosine
    top-k unioned with a ``method`` tag — one registry row whose value
    hash covers all three search strategies (same 50-row-budget story
    as q_text_metrics; the three operators remain independent library
    functions with their own tests + bench rows)."""
    from pyspark.sql import functions as F

    parts = [
        similarity.cosine_topk(spark, sf_dir, k=5, n_queries=5)
        .withColumn("method", F.lit("exact")),
        similarity.cosine_topk_lsh(spark, sf_dir, k=5)
        .withColumn("method", F.lit("lsh")),
        similarity.cosine_topk_ivf_pivot(spark, sf_dir, k=5)
        .withColumn("method", F.lit("ivf_pivot")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("method", "qid", F.desc("score_e6"), "did")


def ann_cosine_methods_oracle_sql() -> str:
    # _COSINE_ORACLE / _lsh_oracle_sql / _ivf_pivot_oracle_sql are
    # module-level below (defined before this is ever CALLED)
    subs = [
        ("exact", _COSINE_ORACLE),
        ("lsh", _lsh_oracle_sql()),
        ("ivf_pivot", _ivf_pivot_oracle_sql()),
    ]
    union = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS method, * FROM ({s})" for m, s in subs
    )
    return (
        f"SELECT * FROM ({union}) "
        "ORDER BY method, qid, score_e6 DESC, did"
    )


def q_split_pack(spark, sf_dir):
    """Merged curation-assignment gate row: hash_split (train/val/test
    bucket) joined 1:1 with sequence_pack (shard/offset packing plan)
    on doc_id — both are deterministic per-document assignments, so one
    row per document carries both operators' full output for the
    driver's value hash (same 50-row-budget story as q_text_metrics)."""
    return (
        curation.hash_split(spark, sf_dir)
        .join(curation.sequence_pack(spark, sf_dir), "doc_id")
        .orderBy("doc_id")
    )


def split_pack_oracle_sql() -> str:
    return (
        f"SELECT * FROM ({_HASH_SPLIT_ORACLE}) s "
        f"JOIN ({_SEQUENCE_PACK_ORACLE}) p USING (doc_id) "
        "ORDER BY doc_id"
    )


def pipeline_queries() -> dict:
    # ORDER MATTERS for the driver's correctness gate: it evaluates the
    # registry in iteration order under a budget that cut at exactly 50
    # rows in rounds 3 and 4, leaving a stale tail each time.  Round 5
    # merges same-key query families (text_metrics = 6 text operators
    # joined on doc_id; ann_cosine_methods = 3 ANN strategies unioned;
    # split_pack = hash_split ⋈ sequence_pack) so the WHOLE registry is
    # ≤ 50 rows and every operator gets a hard signal every round.
    # Cheap single-pass queries still run first so a wallclock cut, if
    # any, lands on the queries with the longest green streak.
    return {
        "dedup_exact": q_dedup_exact,
        "text_metrics": q_text_metrics,
        "image_metadata": q_image_metadata,
        "audio_frame_sample": q_audio_frame_sample,
        "video_frame_sample": q_video_frame_sample,
        "split_pack": q_split_pack,
        "quota_sample": q_quota_sample,
        "mixture_sample": q_mixture_sample,
        "vocab_topk": q_vocab_topk,
        "tfidf_topterms": q_tfidf_topterms,
        "dup_span_stats": q_dup_span_stats,
        # the KMeans IVF stays a library operator (recall-tested, no
        # collect); its deterministic twin (the IVF-pivot query) is
        # gate-covered inside ann_cosine_methods
        "ann_cosine_methods": q_ann_cosine_methods,
        "knn_label_vote": q_knn_label_vote,
        "semantic_dedup": q_semantic_dedup,
        "incremental_dedup": q_incremental_dedup,
        "dedup_apply": q_dedup_apply,
        "dedup_clusters": q_dedup_clusters,
        "contamination_check": q_contamination_check,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ngram_containment_pairs": q_ngram_containment_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
    }


_NGRAM_ORACLE = """
WITH words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS g)
),
-- hot-shingle df-cap (mirrors ngram_jaccard_pairs max_shingle_df=1000)
sh AS (
  SELECT * FROM sh0 WHERE s NOT IN (
    SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)
),
c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
i AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT a, b, floor(inter::DOUBLE / (ca.n + cb.n - inter) * 1000000)::BIGINT AS jaccard_e6
FROM i JOIN c ca ON ca.doc_id = a JOIN c cb ON cb.doc_id = b
WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= 0.2
ORDER BY a, b
"""

_CONTAINMENT_ORACLE = """
WITH words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS g)
),
sh AS (
  SELECT * FROM sh0 WHERE s NOT IN (
    SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)
),
c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
i AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT a, b,
       floor(inter::DOUBLE / least(ca.n, cb.n) * 1000000)::BIGINT
         AS containment_e6
FROM i JOIN c ca ON ca.doc_id = a JOIN c cb ON cb.doc_id = b
WHERE inter::DOUBLE / least(ca.n, cb.n) >= 0.5
ORDER BY a, b
"""

_HASH_SPLIT_ORACLE = """
SELECT doc_id, bucket,
       CASE WHEN bucket < 98 THEN 'train'
            WHEN bucket < 99 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents) t
ORDER BY doc_id
"""

_SEQUENCE_PACK_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         len(string_split(
           regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '))::BIGINT
           AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard
  FROM documents
),
cums AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard
                             ORDER BY md5(doc_id::VARCHAR), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM docs
)
SELECT doc_id, shard, (cum - n_tokens)::BIGINT AS start_offset, n_tokens,
       floor((cum - n_tokens) / 512.0)::BIGINT AS bin_first,
       floor((cum - 1) / 512.0)::BIGINT AS bin_last
FROM cums
ORDER BY shard, start_offset, doc_id
"""

def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB SQL reproducing simhash_pairs bit-for-bit: same md5-derived
    token words, same sign-of-sum fingerprint halves, same 16-bit
    pigeonhole bands (generated programmatically — 64 bit columns)."""
    b_lo = ",\n         ".join(
        f"sum(CASE WHEN (lo >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(32)
    )
    b_hi = ",\n         ".join(
        f"sum(CASE WHEN (hi >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i + 32}"
        for i in range(32)
    )
    fp_lo = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32)
    )
    fp_hi = " + ".join(
        f"CASE WHEN b{i + 32} > 0 THEN {1 << i} ELSE 0 END"
        for i in range(32)
    )
    ham = (
        "bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi))"
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
tok AS (SELECT doc_id, unnest(w) AS tok FROM words),
th AS (SELECT doc_id,
              ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
              ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
       FROM tok),
bits AS (
  SELECT doc_id,
         {b_lo},
         {b_hi}
  FROM th GROUP BY 1
),
fp AS (SELECT doc_id, ({fp_lo})::BIGINT AS fp_lo,
              ({fp_hi})::BIGINT AS fp_hi FROM bits),
k AS (
  SELECT doc_id, fp_lo, fp_hi, 0 AS k, fp_lo % 65536 AS kv FROM fp
  UNION ALL
  SELECT doc_id, fp_lo, fp_hi, 1, (fp_lo // 65536) % 65536 FROM fp
  UNION ALL
  SELECT doc_id, fp_lo, fp_hi, 2, fp_hi % 65536 FROM fp
  UNION ALL
  SELECT doc_id, fp_lo, fp_hi, 3, (fp_hi // 65536) % 65536 FROM fp
)
SELECT DISTINCT a.doc_id AS a, b.doc_id AS b, ({ham})::INT AS hamming
FROM k a JOIN k b
  ON a.k = b.k AND a.kv = b.kv AND a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
ORDER BY a, b
"""


def _minhash_oracle_sql(threshold: float = 0.2) -> str:
    """DuckDB SQL reproducing minhash_lsh_pairs end-to-end: md5-derived
    32-bit shingle hashes, the 128 seeded permutations (embedded as a
    VALUES table — a_j*h+b_j stays under 2^61, exact in BIGINT), md5
    band digests over the comma-joined signature slices, candidate
    banding, and exact Jaccard verification on 60-bit shingle ids."""
    from trck_spark.pipeline.dedup import (
        ROWS_PER_BAND,
        _MERSENNE,
        _perm_coeffs,
    )

    a, b = _perm_coeffs()
    perm_rows = ",\n    ".join(
        f"({j}, {int(a[j])}, {int(b[j])})" for j in range(len(a))
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS g)
),
sh AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 8))::BIGINT AS h32,
              ('0x' || substr(md5(s), 1, 15))::BIGINT AS h60
       FROM sh0),
perm(j, a, b) AS (VALUES
    {perm_rows}
),
sig AS (
  SELECT doc_id, j,
         min((a * (h32 % {_MERSENNE}) + b) % {_MERSENNE}) AS v
  FROM sh CROSS JOIN perm GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, j // {ROWS_PER_BAND} AS band,
         ('0x' || substr(md5(string_agg(v::VARCHAR, ',' ORDER BY j)),
                         1, 15))::BIGINT AS bh
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
i AS (
  SELECT cand.a, cand.b, count(*) AS inter
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.a
  JOIN sh sb ON sb.doc_id = cand.b AND sb.h60 = sa.h60
  GROUP BY 1, 2
)
SELECT a, b,
       floor(inter::DOUBLE / (ca.n + cb.n - inter) * 1000000)::BIGINT
         AS jaccard_e6
FROM i JOIN c ca ON ca.doc_id = a JOIN c cb ON cb.doc_id = b
WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= {threshold}
ORDER BY a, b
"""


_COSINE_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid, [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings WHERE vec_id < 5
),
d AS (
  SELECT vec_id AS did, [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
s AS (
  SELECT qid, did,
         list_sum([q.v[i] * d.v[i] for i in generate_series(1, len(q.v))])::DOUBLE
         / (sqrt(list_sum([q.v[i] * q.v[i] for i in generate_series(1, len(q.v))])::DOUBLE)
            * sqrt(list_sum([d.v[i] * d.v[i] for i in generate_series(1, len(d.v))])::DOUBLE))
         AS cos
  FROM q, d WHERE qid <> did
)
SELECT qid, did, floor(cos * 1000000)::BIGINT AS score_e6
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did) AS rn
      FROM s)
WHERE rn <= 5 ORDER BY qid, score_e6 DESC, did
"""

def _near_dup_oracle_sql(
    threshold: float = 0.4,
    n_bands: int = 12,
    band_planes: int = 3,
    dim: int = 64,
) -> str:
    """DuckDB SQL reproducing embedding_near_dup_pairs bit-for-bit: same
    integer hyperplane weights, same per-band sign signatures over the
    quantized embeddings, same distinct candidate pairs, same
    integer-dot double cosine verification."""
    from trck_spark.pipeline.similarity import _lsh_planes

    planes = _lsh_planes(n_bands * band_planes, dim)
    plane_rows = ",\n    ".join(
        "({}, {}, [{}]::BIGINT[])".format(
            p // band_planes,
            1 << (p % band_planes),
            ", ".join(str(int(w)) for w in planes[p]),
        )
        for p in range(n_bands * band_planes)
    )
    return f"""
WITH e0 AS (
  SELECT vec_id,
         [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
e AS (
  SELECT vec_id, v,
         list_sum([v[i] * v[i]
                   for i in generate_series(1, len(v))]) AS n2
  FROM e0
),
planes(band, bit, w) AS (VALUES
    {plane_rows}
),
sig AS (
  SELECT e.vec_id, pl.band,
         sum(CASE WHEN list_sum([e.v[i] * pl.w[i]
                                 for i in generate_series(1, len(e.v))]) >= 0
                  THEN pl.bit ELSE 0 END)::BIGINT AS sig
  FROM e CROSS JOIN planes pl GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM sig x JOIN sig y
    ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
),
s AS (
  SELECT c.a, c.b,
         list_sum([p.v[i] * q.v[i]
                   for i in generate_series(1, len(p.v))])::DOUBLE
         / (sqrt(p.n2::DOUBLE) * sqrt(q.n2::DOUBLE)) AS cos
  FROM cand c JOIN e p ON p.vec_id = c.a JOIN e q ON q.vec_id = c.b
)
SELECT a, b, floor(cos * 1000000)::BIGINT AS cos_e6
FROM s WHERE cos >= {threshold} ORDER BY a, b
"""


def _lsh_oracle_sql(k: int = 5, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB SQL reproducing cosine_topk_lsh exactly: same integer
    hyperplane weights (embedded as a VALUES table of BIGINT lists),
    same sign-pattern buckets over the quantized embeddings, same
    integer-dot cosine top-k within each bucket."""
    from trck_spark.pipeline.similarity import _lsh_planes

    planes = _lsh_planes(n_planes, dim)
    plane_rows = ",\n    ".join(
        "({}, [{}]::BIGINT[])".format(
            p, ", ".join(str(int(w)) for w in planes[p])
        )
        for p in range(n_planes)
    )
    return f"""
WITH e AS (
  SELECT vec_id,
         [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
planes(p, w) AS (VALUES
    {plane_rows}
),
proj AS (
  SELECT e.vec_id, pl.p,
         list_sum([e.v[i] * pl.w[i]
                   for i in generate_series(1, len(e.v))]) AS s
  FROM e CROSS JOIN planes pl
),
bkt AS (
  SELECT vec_id,
         sum(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY 1
),
eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN bkt b USING (vec_id)),
s AS (
  SELECT q.vec_id AS qid, d.vec_id AS did,
         list_sum([q.v[i] * d.v[i]
                   for i in generate_series(1, len(q.v))])::DOUBLE
         / (sqrt(list_sum([q.v[i] * q.v[i]
                           for i in generate_series(1, len(q.v))])::DOUBLE)
            * sqrt(list_sum([d.v[i] * d.v[i]
                             for i in generate_series(1, len(d.v))])::DOUBLE))
         AS cos
  FROM eb q JOIN eb d ON q.bucket = d.bucket AND q.vec_id <> d.vec_id
)
SELECT qid, did, floor(cos * 1000000)::BIGINT AS score_e6
FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos DESC, did) AS rn
      FROM s)
WHERE rn <= {k} ORDER BY qid, score_e6 DESC, did
"""


def _ivf_pivot_oracle_sql(
    k: int = 5, n_cells: int = 16, n_probe: int = 4, n_queries: int = 20
) -> str:
    """DuckDB SQL reproducing cosine_topk_ivf_pivot exactly: same pivot
    cells (first n_cells vectors), same integer squared-distance cell
    assignment and probe ranking, same integer-dot cosine top-k."""
    return f"""
WITH e AS (
  SELECT vec_id,
         [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
piv AS (SELECT vec_id AS cell, v AS pv FROM e WHERE vec_id < {n_cells}),
ranked AS (
  SELECT e.vec_id, e.v, p.cell,
         list_sum([(e.v[i] - p.pv[i]) * (e.v[i] - p.pv[i])
                   for i in generate_series(1, len(e.v))]) AS d2
  FROM e CROSS JOIN piv p
),
rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cell) AS rn
       FROM ranked),
assigned AS (SELECT vec_id, v, cell FROM rk WHERE rn = 1),
probes AS (SELECT vec_id AS qid, cell FROM rk
           WHERE vec_id < {n_queries} AND rn <= {n_probe}),
q AS (SELECT vec_id AS qid, v AS qv FROM assigned
      WHERE vec_id < {n_queries}),
cand AS (
  SELECT pr.qid, a.vec_id AS did, a.v AS dv
  FROM probes pr JOIN assigned a USING (cell)
  WHERE a.vec_id <> pr.qid
),
s AS (
  SELECT c.qid, c.did,
         list_sum([q.qv[i] * c.dv[i]
                   for i in generate_series(1, len(q.qv))])::DOUBLE
         / (sqrt(list_sum([q.qv[i] * q.qv[i]
                           for i in generate_series(1, len(q.qv))])::DOUBLE)
            * sqrt(list_sum([c.dv[i] * c.dv[i]
                             for i in generate_series(1, len(c.dv))])::DOUBLE))
         AS cos
  FROM cand c JOIN q USING (qid)
)
SELECT qid, did, floor(cos * 1000000)::BIGINT AS score_e6
FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos DESC, did) AS rn
      FROM s)
WHERE rn <= {k} ORDER BY qid, score_e6 DESC, did
"""


_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid, [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings WHERE vec_id < 20
),
d AS (
  SELECT vec_id AS did, label,
         [CAST(round(x::DOUBLE * 1000000) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
s AS (
  SELECT qid, did, label,
         list_sum([q.v[i] * d.v[i] for i in generate_series(1, len(q.v))])::DOUBLE
         / (sqrt(list_sum([q.v[i] * q.v[i] for i in generate_series(1, len(q.v))])::DOUBLE)
            * sqrt(list_sum([d.v[i] * d.v[i] for i in generate_series(1, len(d.v))])::DOUBLE))
         AS cos
  FROM q, d WHERE qid <> did
),
knn AS (
  SELECT qid, label FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did) AS rn
    FROM s) WHERE rn <= 10
),
votes AS (
  SELECT qid, label, count(*) AS votes FROM knn GROUP BY 1, 2
)
SELECT qid, label AS pred_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY votes DESC, label) AS rk
  FROM votes)
WHERE rk = 1 ORDER BY qid
"""


_CLUSTERS_CTE = """
WITH RECURSIVE words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS g)
),
sh AS (
  SELECT * FROM sh0 WHERE s NOT IN (
    SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)
),
c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
i AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
e AS (
  SELECT a, b FROM i JOIN c ca ON ca.doc_id = a JOIN c cb ON cb.doc_id = b
  WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= 0.2
),
sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, sym.b FROM reach JOIN sym ON sym.a = reach.r
),
lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
       FROM lab GROUP BY 1)
"""

_CLUSTERS_ORACLE = _CLUSTERS_CTE + """
SELECT lab.doc_id, lab.cluster_id, sz.cluster_size
FROM lab JOIN sz USING (cluster_id)
ORDER BY lab.doc_id
"""

_DEDUP_APPLY_ORACLE = _CLUSTERS_CTE + """
SELECT d.doc_id, d.source, d.n_chars, sz.cluster_size
FROM lab JOIN sz USING (cluster_id)
JOIN documents d ON d.doc_id = lab.doc_id
WHERE lab.doc_id = lab.cluster_id
ORDER BY d.doc_id
"""


_QUOTA_ORACLE = """
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents) t
WHERE rk <= 10
ORDER BY source, rk
"""


_MIXTURE_ORACLE = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents) t
WHERE h < CASE source
            WHEN 'src0' THEN {int(0.5 * (1 << 32))}
            WHEN 'src1' THEN {int(0.25 * (1 << 32))}
            ELSE {int(0.1 * (1 << 32))} END
ORDER BY doc_id
"""


_VOCAB_ORACLE = """
WITH w AS (
  SELECT unnest(string_split(
           regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS word
  FROM documents
)
SELECT word, count(*)::BIGINT AS n FROM w WHERE word <> ''
GROUP BY 1 ORDER BY n DESC, word LIMIT 100
"""


_CONTAMINATION_ORACLE = """
WITH words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 0))) AS g)
),
sh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh0),
evl AS (SELECT DISTINCT h FROM sh WHERE doc_id < 100),
corpus AS (SELECT * FROM sh WHERE doc_id >= 100),
totals AS (SELECT doc_id, count(*)::BIGINT AS n_shingles
           FROM corpus GROUP BY 1),
shared AS (SELECT doc_id, count(*)::BIGINT AS n_shared
           FROM corpus JOIN evl USING (h) GROUP BY 1)
SELECT shared.doc_id, n_shared, n_shingles,
       floor(n_shared::DOUBLE / n_shingles * 1000000)::BIGINT AS overlap_e6
FROM shared JOIN totals USING (doc_id)
ORDER BY shared.doc_id
"""


def pipeline_oracles() -> dict:
    from trck_spark.pipeline.multimodal import (
        audio_frame_sample_oracle_sql,
        image_metadata_oracle_sql,
        video_frame_sample_oracle_sql,
    )
    from trck_spark.pipeline.dedup import (
        dup_span_stats_oracle_sql,
        incremental_dedup_oracle_sql,
        semantic_dedup_oracle_sql,
    )
    from trck_spark.pipeline.text import (
        doc_fingerprint_oracle_sql,
        lang_id_oracle_sql,
        pii_stats_oracle_sql,
        repetition_stats_oracle_sql,
        text_quality_oracle_sql,
        tfidf_topterms_oracle_sql,
        token_stats_oracle_sql,
    )

    return {
        "dedup_exact": (
            "SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS "
            "fingerprint, min(doc_id)::BIGINT AS keep_id, "
            "count(*)::BIGINT AS n_docs "
            "FROM documents GROUP BY 1 ORDER BY 1"
        ),
        "ngram_jaccard_pairs": _NGRAM_ORACLE,
        "ngram_containment_pairs": _CONTAINMENT_ORACLE,
        # merged gate rows (see q_text_metrics / q_ann_cosine_methods /
        # q_split_pack): the constituent operators' individual oracles
        # stay importable for tests and ad-hoc use
        "text_metrics": text_metrics_oracle_sql(),
        "split_pack": split_pack_oracle_sql(),
        "tfidf_topterms": tfidf_topterms_oracle_sql(),
        "dup_span_stats": dup_span_stats_oracle_sql(),
        "semantic_dedup": semantic_dedup_oracle_sql(),
        # merged row (round 8): logical plan + FingerprintStore-artifact
        # plan, tagged by `path` — same classification by construction,
        # so the oracle is the same SQL twice under each tag
        "incremental_dedup": (
            "SELECT 'logical' AS path, * FROM ("
            + incremental_dedup_oracle_sql()
            + ") UNION ALL SELECT 'store' AS path, * FROM ("
            + incremental_dedup_oracle_sql()
            + ")"
        ),
        "simhash_pairs": _simhash_oracle_sql(),
        "minhash_lsh_pairs": _minhash_oracle_sql(),
        "embedding_near_dup_pairs": _near_dup_oracle_sql(),
        "dedup_clusters": _CLUSTERS_ORACLE,
        "dedup_apply": _DEDUP_APPLY_ORACLE,
        "quota_sample": _QUOTA_ORACLE,
        "mixture_sample": _MIXTURE_ORACLE,
        "vocab_topk": _VOCAB_ORACLE,
        "contamination_check": _CONTAMINATION_ORACLE,
        "ann_cosine_methods": ann_cosine_methods_oracle_sql(),
        "knn_label_vote": _KNN_ORACLE,
        "image_metadata": image_metadata_oracle_sql(),
        "audio_frame_sample": audio_frame_sample_oracle_sql(),
        "video_frame_sample": video_frame_sample_oracle_sql(),
    }
