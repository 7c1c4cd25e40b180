"""Pipeline query registry: name -> (spark fn, oracle SQL | None)."""

from __future__ import annotations

from trck_spark.pipeline import dedup, multimodal, similarity, text


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(spark, sf_dir)


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(spark, sf_dir, threshold=0.2)


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(spark, sf_dir, threshold=0.2)


def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(spark, sf_dir, max_hamming=3)


def q_ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(spark, sf_dir, k=5, n_queries=5)


def q_ann_cosine_topk_lsh(spark, sf_dir):
    return similarity.cosine_topk_lsh(spark, sf_dir, k=5)


def q_ann_cosine_topk_ivf(spark, sf_dir):
    return similarity.cosine_topk_ivf(spark, sf_dir, k=5)


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


def pipeline_queries() -> dict:
    return {
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_cosine_topk_lsh": q_ann_cosine_topk_lsh,
        "ann_cosine_topk_ivf": q_ann_cosine_topk_ivf,
        "knn_label_vote": q_knn_label_vote,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "token_stats": q_token_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "image_metadata": q_image_metadata,
        "audio_frame_sample": q_audio_frame_sample,
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


def pipeline_oracles() -> dict:
    from trck_spark.pipeline.multimodal import (
        audio_frame_sample_oracle_sql,
        image_metadata_oracle_sql,
    )
    from trck_spark.pipeline.text import (
        doc_fingerprint_oracle_sql,
        lang_id_oracle_sql,
        text_quality_oracle_sql,
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
        "ann_cosine_topk": _COSINE_ORACLE,
        "knn_label_vote": _KNN_ORACLE,
        "lang_id": lang_id_oracle_sql(),
        "text_quality": text_quality_oracle_sql(),
        "token_stats": token_stats_oracle_sql(),
        "doc_fingerprint": doc_fingerprint_oracle_sql(),
        "image_metadata": image_metadata_oracle_sql(),
        "audio_frame_sample": audio_frame_sample_oracle_sql(),
        # minhash_lsh_pairs, simhash_pairs, ann_cosine_topk_lsh,
        # trck_uniques_hll: approximate / hash-defined -> rows-only check
    }
