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


# --------------------------------------------------------------- PII scrub
#
# Regex PII detection + redaction.  Patterns deliberately avoid
# backslash classes (\d, \b) and use only [...]-classes and bounded
# quantifiers, so the SAME literal pattern behaves identically under
# Java regex (Spark, whole-stage codegen) and RE2 (DuckDB) — no
# dialect translation layer to get wrong.  Order matters for
# redaction: email first (it can contain digit runs), then the
# digit-shaped patterns from most- to least-specific.
_PII_PATTERNS = [
    ("email", "<EMAIL>",
     "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"),
    ("ipv4", "<IP>",
     "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"),
    ("ssn", "<SSN>", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", "<PHONE>", "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"),
]


def pii_scrub_exprs(text_col: str = "text") -> tuple[dict, str]:
    """(per-pattern count SQL exprs, fully-redacted SQL expr) — shared
    verbatim by the Spark query and the DuckDB oracle (modulo the
    regexp_count spelling, handled by the callers)."""
    counts = {
        name: (text_col, pat) for name, _tok, pat in _PII_PATTERNS
    }
    red = text_col
    for _name, tok, pat in _PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tok}')"
    return counts, red


def pii_stats(spark, sf_dir: str):
    """(doc_id, n_email, n_ipv4, n_ssn, n_phone, n_pii, redacted_md5):
    per-document PII hit counts plus the md5 of the fully redacted
    text — the md5 proves the redaction itself (not just the counts)
    is identical across engines.

    Pure Catalyst (regexp_count / regexp_replace, whole-stage
    codegen), zero shuffle: the 100 TB form is a map-only pass.  The
    reference has no PII surface (its values are opaque dictionary
    strings); this is training-data-pipeline scope.
    """
    from pyspark.sql import functions as F

    counts, red = pii_scrub_exprs("text")
    cols = [
        F.expr(f"regexp_count({c}, '{p}')").cast("long").alias(f"n_{n}")
        for n, (c, p) in counts.items()
    ]
    total = None
    for n in counts:
        t = F.col(f"n_{n}")
        total = t if total is None else total + t
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", *cols, F.md5(F.expr(red)).alias("redacted_md5"))
        .withColumn("n_pii", total.cast("long"))
        .select("doc_id", *[f"n_{n}" for n in counts], "n_pii",
                "redacted_md5")
        .orderBy("doc_id")
    )


def pii_stats_oracle_sql() -> str:
    counts, red = pii_scrub_exprs("text")
    # DuckDB: no regexp_count; regexp_replace needs the global flag
    cnt_cols = ", ".join(
        f"len(regexp_extract_all({c}, '{p}'))::BIGINT AS n_{n}"
        for n, (c, p) in counts.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all({c}, '{p}'))"
        for n, (c, p) in counts.items()
    )
    red_g = red.replace("')", "', 'g')")
    return (
        f"SELECT doc_id, {cnt_cols}, ({total})::BIGINT AS n_pii, "
        f"md5({red_g}) AS redacted_md5 "
        "FROM documents ORDER BY doc_id"
    )


# ------------------------------------------------------------ TF-IDF terms
def tfidf_topterms(spark, sf_dir: str, k: int = 3):
    """(doc_id, term, tf, score_e6, rk): top-k characteristic terms per
    document by tf x linear-idf.

    idf is the LINEAR ratio n_docs/df (not log): the ranking it induces
    per document is identical (log is monotone), and integer arithmetic
    keeps Spark and DuckDB bit-identical — score_e6 =
    tf * 1_000_000 * n_docs DIV df, all BIGINT.  (At n_docs beyond
    ~1e7 the product nears int64 range; the at-scale deploy would
    switch score to a double and keep the same ranking.)

    Shape: explode tokens -> (doc, term) tf [one shuffle, partial
    map-side agg] -> per-term document frequency as a WINDOW over the
    term partitioning (a groupBy + self-join would plan the
    explode+aggregate pipeline twice — exchange reuse does not fire
    across the join's implied notnull filter; plan test pins the
    single-pipeline shape) -> per-doc top-k window.  The corpus size
    joins in as a broadcast 1-row aggregate, never a driver-side
    collect.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = f"filter(split({NORM}, ' '), x -> x != '')"
    tf = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn(
            "df_docs",
            F.count(F.lit(1)).over(Window.partitionBy("term")),
        )
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_e6",
            F.expr("tf * 1000000 * n_docs DIV df_docs").cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_e6"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                "score_e6", F.col("rk").cast("long").alias("rk"))
        .orderBy("doc_id", "rk")
    )


def tfidf_topterms_oracle_sql(k: int = 3) -> str:
    norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split({norm}, ' '), x -> x != '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df_docs FROM tf),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT wdf.doc_id, wdf.term, wdf.tf,
         (wdf.tf * 1000000 * n.n_docs // wdf.df_docs)::BIGINT AS score_e6
  FROM wdf CROSS JOIN n
)
SELECT doc_id, term, tf, score_e6, rk::BIGINT AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_e6 DESC, term) AS rk
      FROM scored)
WHERE rk <= {k} ORDER BY doc_id, rk
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


# ------------------------------------------- LM familiarity (CCNet-style)


def lm_score(spark, sf_dir: str, ref_source: str = "src0"):
    """(doc_id, lm_bigrams, lm_score_e6): CCNet-style language-model
    quality signal — how familiar each document's word bigrams are to a
    Laplace-smoothed bigram model trained on a reference slice of the
    corpus (``source == ref_source``; swap for a curated high-quality
    table in production, exactly like CCNet scores Common Crawl against
    a Wikipedia LM).

    Per bigram (w1, w2): p = (c2(w1,w2) + 1) / (c1(w1) + V), with c2 /
    c1 the reference bigram/unigram counts and V the reference
    vocabulary size.  Scores are quantized per BIGRAM as
    floor(1e6 * p) in exact BIGINT arithmetic (1e6 * (c2+1) fits well
    inside int64) and only integers are ever summed, so the result is
    bit-identical on any engine and any partitioning — the same
    integer-quantization trick the embedding operators use.  A real
    perplexity sums per-token float log-probs, whose reduction order
    Spark does not fix; the integer mean-probability form keeps the
    ranking signal (higher = more in-domain) and the driver's
    hash-compare both.

    lm_score_e6 = integer mean of the doc's bigram scores (0 for docs
    with < 2 tokens).  Scale shape: two groupBys over the reference
    slice (corpus-scaled but agg-reduced), one join of doc bigrams
    against the bigram table on (w1, w2) and one against the unigram
    table on w1 — AQE broadcasts either table iff it is actually
    small; nothing is collected and no broadcast is forced."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (
        f"filter(split({NORM}, ' '), w -> w != '')"
    )
    # CASE guard, not greatest(.., 0): Spark's sequence(1, 0) yields
    # [1, 0] (descending), which would index out of bounds on docs
    # with < 2 tokens (same hazard as dedup.SHINGLES)
    bigram_expr = (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), "
        f"g -> struct(element_at({toks}, g) AS w1, "
        f"element_at({toks}, g + 1) AS w2)) "
        "ELSE array() END"
    )
    doc_bg = docs.select(
        "doc_id", F.explode(F.expr(bigram_expr)).alias("bg")
    ).select("doc_id", "bg.w1", "bg.w2")

    ref = docs.filter(F.col("source") == ref_source)
    ref_tok = ref.select(F.explode(F.expr(toks)).alias("w"))
    c1 = ref_tok.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    ref_bg = ref.select(F.explode(F.expr(bigram_expr)).alias("bg")).select(
        "bg.w1", "bg.w2"
    )
    c2 = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))

    # v = 0 (empty reference slice) would make every score a silent
    # 0-by-DIV-null (while the ANSI oracle raises) — fail loudly
    # instead, in-plan so the guard costs no extra job (ADVICE r05)
    scored = (
        doc_bg.join(c2, ["w1", "w2"], "left")
        .join(c1.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(vocab)
        .select(
            "doc_id",
            F.expr(
                "IF(v = 0, raise_error('lm_score: reference slice is "
                "empty (no docs with the given ref_source) — scores "
                "would be undefined'), "
                "(1000000 * (coalesce(c2, 0) + 1)) DIV "
                "(coalesce(c1, 0) + v))"
            ).alias("s_e6"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("lm_bigrams"),
        F.expr("sum(s_e6) DIV count(1)").alias("lm_score_e6"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lm_bigrams", F.lit(0)).alias("lm_bigrams"),
            F.coalesce("lm_score_e6", F.lit(0)).alias("lm_score_e6"),
        )
        .orderBy("doc_id")
    )


def lm_score_oracle_sql(ref_source: str = "src0") -> str:
    toks = (
        "list_filter(string_split(regexp_replace(lower(text), "
        "'\\s+', ' ', 'g'), ' '), w -> w != '')"
    )
    return f"""
WITH d AS (SELECT doc_id, source, {toks} AS t FROM documents),
doc_bg AS (
  SELECT doc_id, t[g] AS w1, t[g + 1] AS w2
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g)
),
ref_tok AS (
  SELECT unnest(t) AS w FROM d WHERE source = '{ref_source}'
),
c1 AS (SELECT w, count(*) AS c1 FROM ref_tok GROUP BY 1),
vocab AS (SELECT count(*) AS v FROM c1),
ref_bg AS (
  SELECT t[g] AS w1, t[g + 1] AS w2
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g)
  WHERE source = '{ref_source}'
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM ref_bg GROUP BY 1, 2),
scored AS (
  SELECT doc_id,
         (1000000 * (coalesce(c2.c2, 0) + 1))
           // (coalesce(c1.c1, 0) + vocab.v) AS s_e6
  FROM doc_bg
  LEFT JOIN c2 ON doc_bg.w1 = c2.w1 AND doc_bg.w2 = c2.w2
  LEFT JOIN c1 ON doc_bg.w1 = c1.w
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, count(*) AS lm_bigrams,
         sum(s_e6) // count(*) AS lm_score_e6
  FROM scored GROUP BY 1
)
SELECT documents.doc_id,
       coalesce(lm_bigrams, 0)::BIGINT AS lm_bigrams,
       coalesce(lm_score_e6, 0)::BIGINT AS lm_score_e6
FROM documents LEFT JOIN per_doc ON documents.doc_id = per_doc.doc_id
ORDER BY documents.doc_id
"""
