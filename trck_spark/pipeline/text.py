"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting.  All pure Catalyst expressions (whole-stage codegen), each
mirrored exactly in the DuckDB oracle — the arithmetic is integer or
single-op double so results are bit-identical across engines.
"""

from __future__ import annotations

NORM = "regexp_replace(lower(text), '\\\\s+', ' ')"

# stopword occurrence counting via the length-difference trick — identical
# semantics in Spark and DuckDB (no regex dialect differences)
_LANGS = {
    "en": [" the ", " a ", " of ", " and "],
    "fr": [" le ", " la ", " et ", " les "],
    "de": [" der ", " und ", " die ", " das "],
}


def _count_expr(hay: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return (
        f"CAST((length({hay}) - length(replace({hay}, '{n}', ''))) "
        f"/ {len(needle)} AS BIGINT)"
    )


def _padded() -> str:
    return f"concat(' ', {NORM}, ' ')"


def lang_score_exprs() -> dict[str, str]:
    hay = _padded()
    return {
        lang: " + ".join(_count_expr(hay, w) for w in words)
        for lang, words in _LANGS.items()
    }


def lang_id(spark, sf_dir: str):
    """(doc_id, lang_pred, en_hits): n-gram/stopword heuristic language ID."""
    from pyspark.sql import functions as F

    scores = lang_score_exprs()
    case = (
        "CASE "
        f"WHEN ({scores['en']}) >= ({scores['fr']}) "
        f" AND ({scores['en']}) >= ({scores['de']}) "
        f" AND ({scores['en']}) > 0 THEN 'en' "
        f"WHEN ({scores['fr']}) >= ({scores['de']}) "
        f" AND ({scores['fr']}) > 0 THEN 'fr' "
        f"WHEN ({scores['de']}) > 0 THEN 'de' "
        "ELSE 'unknown' END"
    )
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.expr(case).alias("lang_pred"),
            F.expr(scores["en"]).alias("en_hits"),
        )
        .orderBy("doc_id")
    )


def lang_id_oracle_sql() -> str:
    scores = lang_score_exprs()
    case = (
        "CASE "
        f"WHEN ({scores['en']}) >= ({scores['fr']}) "
        f" AND ({scores['en']}) >= ({scores['de']}) "
        f" AND ({scores['en']}) > 0 THEN 'en' "
        f"WHEN ({scores['fr']}) >= ({scores['de']}) "
        f" AND ({scores['fr']}) > 0 THEN 'fr' "
        f"WHEN ({scores['de']}) > 0 THEN 'de' "
        "ELSE 'unknown' END"
    )
    # DuckDB regexp_replace needs the global flag
    case = case.replace(
        "regexp_replace(lower(text), '\\\\s+', ' ')",
        "regexp_replace(lower(text), '\\s+', ' ', 'g')",
    )
    en = scores["en"].replace(
        "regexp_replace(lower(text), '\\\\s+', ' ')",
        "regexp_replace(lower(text), '\\s+', ' ', 'g')",
    )
    return (
        f"SELECT doc_id, {case} AS lang_pred, {en} AS en_hits "
        "FROM documents ORDER BY doc_id"
    )


def text_quality(spark, sf_dir: str):
    """(doc_id, n_tokens, n_chars, stop_ratio, quality): deterministic
    length/stopword quality score."""
    from pyspark.sql import functions as F

    en = lang_score_exprs()["en"]
    n_tokens = f"size(split({NORM}, ' '))"
    n_chars = f"length({NORM})"
    stop_ratio = f"round(({en})::DOUBLE / greatest({n_tokens}, 1), 6)"
    quality = (
        f"round(least({n_tokens} / 400.0, 1.0) * 0.5 "
        f"+ least(({en})::DOUBLE / greatest({n_tokens}, 1) * 10.0, 1.0) "
        f"* 0.5, 6)"
    )
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.expr(n_tokens).cast("long").alias("n_tokens"),
            F.expr(n_chars).cast("long").alias("n_chars"),
            F.expr(stop_ratio).alias("stop_ratio"),
            F.expr(quality).alias("quality"),
        )
        .orderBy("doc_id")
    )


def text_quality_oracle_sql() -> str:
    norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    hay = f"concat(' ', {norm}, ' ')"
    en = " + ".join(_count_expr(hay, w) for w in _LANGS["en"])
    n_tokens = f"len(string_split({norm}, ' '))"
    n_chars = f"length({norm})"
    return f"""
SELECT doc_id,
       {n_tokens}::BIGINT AS n_tokens,
       {n_chars}::BIGINT AS n_chars,
       round(({en})::DOUBLE / greatest({n_tokens}, 1), 6) AS stop_ratio,
       round(least({n_tokens} / 400.0, 1.0) * 0.5
             + least(({en})::DOUBLE / greatest({n_tokens}, 1) * 10.0, 1.0)
             * 0.5, 6) AS quality
FROM documents ORDER BY doc_id
"""


def token_stats(spark, sf_dir: str):
    """Whitespace tokens + BPE-ish regex tokens per document."""
    from pyspark.sql import functions as F

    ws = f"size(split({NORM}, ' '))"
    bpe = "regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]')"
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.expr(ws).cast("long").alias("ws_tokens"),
            F.expr(bpe).cast("long").alias("bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def token_stats_oracle_sql() -> str:
    norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    return f"""
SELECT doc_id,
       len(string_split({norm}, ' '))::BIGINT AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT
         AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def repetition_stats(spark, sf_dir: str):
    """(doc_id, n_words, dup_word_e6, top_bigram_e6, flag_repetitive):
    Gopher-style repetition signals for quality filtering.

    - ``dup_word_e6``: 1 - distinct_words/words (floor x 1e6) — computed
      entirely map-side with ``array_distinct``, zero shuffle;
    - ``top_bigram_e6``: occurrence share of the most frequent word
      bigram — exploded bigrams, two-level aggregate.  Map-side partial
      aggregation collapses each doc's bigrams to its distinct set before
      the exchange (every doc's rows share one input partition), so the
      shuffle carries O(distinct bigrams per doc), not O(words);
    - ``flag_repetitive``: the Gopher-rule style cut (dup words > 0.5 or
      top bigram > 0.18) that a mixing step would filter on.

    Fractions ship as floor(x * 1e6) BIGINTs so the DuckDB oracle
    hash-matches without float-rounding ambiguity.
    """
    from pyspark.sql import functions as F

    # tokens: normalized split with empties dropped
    toks = f"filter(split({NORM}, ' '), x -> x != '')"
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(toks).alias("toks")
    )
    per_doc = base.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.expr(
            "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)), "
            "slice(toks, 2, greatest(size(toks) - 1, 0)), "
            "(x, y) -> concat(x, ' ', y))"
        ).alias("bigrams"),
    )
    bg = (
        per_doc.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("tot_c"))
    )
    dup_frac = 1.0 - F.col("n_distinct") / F.greatest(
        F.col("n_words"), F.lit(1)
    )
    top_frac = F.coalesce(
        F.col("top_c") / F.col("tot_c"), F.lit(0.0)
    )
    return (
        per_doc.join(bg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.floor(dup_frac * 1000000).cast("long").alias("dup_word_e6"),
            F.floor(top_frac * 1000000).cast("long").alias("top_bigram_e6"),
            (
                (F.floor(dup_frac * 1000000) > 500000)
                | (F.floor(top_frac * 1000000) > 180000)
            ).alias("flag_repetitive"),
        )
        .orderBy("doc_id")
    )


def repetition_stats_oracle_sql() -> str:
    norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> x != '') AS toks
  FROM documents
),
per_doc AS (
  SELECT doc_id, len(toks) AS n_words,
         len(list_distinct(toks)) AS n_distinct, toks
  FROM base
),
bg_rows AS (
  SELECT doc_id, toks[g] || ' ' || toks[g+1] AS bg
  FROM per_doc,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(toks)-1, 0))) AS g)
),
bg_counts AS (
  SELECT doc_id, bg, count(*) AS c FROM bg_rows GROUP BY 1, 2
),
bg AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS tot_c FROM bg_counts GROUP BY 1
)
SELECT p.doc_id,
       p.n_words::BIGINT AS n_words,
       floor((1.0 - p.n_distinct::DOUBLE / greatest(p.n_words, 1)) * 1000000)::BIGINT
         AS dup_word_e6,
       floor(coalesce(bg.top_c::DOUBLE / bg.tot_c, 0.0) * 1000000)::BIGINT
         AS top_bigram_e6,
       (floor((1.0 - p.n_distinct::DOUBLE / greatest(p.n_words, 1)) * 1000000) > 500000
        OR floor(coalesce(bg.top_c::DOUBLE / bg.tot_c, 0.0) * 1000000) > 180000)
         AS flag_repetitive
FROM per_doc p LEFT JOIN bg ON bg.doc_id = p.doc_id
ORDER BY p.doc_id
"""


def doc_fingerprint(spark, sf_dir: str):
    """(doc_id, fingerprint): md5 digest of the normalized text."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.md5(F.expr(NORM)).alias("fingerprint"))
        .orderBy("doc_id")
    )


def doc_fingerprint_oracle_sql() -> str:
    return (
        "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
        "AS fingerprint FROM documents ORDER BY doc_id"
    )
