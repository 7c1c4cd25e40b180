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
