"""Similarity search over the embeddings table (array<float> column).

Scores are computed on embeddings quantized to int64 (round(x * 1e6)):
integer dot products and norms are exact, so Spark and the DuckDB oracle
produce bit-identical doubles regardless of summation order — float
accumulation order can never flip a top-k boundary between engines.

Brute-force top-k is the correctness baseline; the LSH-bucketed variant is
the scale path (buckets shuffle only bucket keys; each query probes one
bucket).
"""

from __future__ import annotations

QUANT = ("transform(embedding, x -> "
         "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
)


def _quantized(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import spread_input

    return spread_input(
        spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ).select("vec_id", F.expr(QUANT).alias("v"))


def cosine_topk(spark, sf_dir: str, k: int = 5, n_queries: int = 5):
    """Exact cosine top-k for the first n_queries vectors (brute force:
    broadcast the queries, score everything, window top-k)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emb = _quantized(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d = emb.select(F.col("vec_id").alias("did"), F.col("v").alias("dv"))
    dot = F.expr(_DOT.format(a="qv", b="dv")).cast("double")
    nq = F.expr(_DOT.format(a="qv", b="qv")).cast("double")
    nd = F.expr(_DOT.format(a="dv", b="dv")).cast("double")
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("did"))
        .select(
            "qid",
            "did",
            (dot / (F.sqrt(nq) * F.sqrt(nd))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("did"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "did", F.floor(F.col("cos") * 1000000).cast("long").alias("score_e6"))
        .orderBy("qid", F.desc("score_e6"), "did")
    )


def _lsh_planes(n_planes: int, dim: int):
    """Deterministic integer hyperplane weights (standard normals scaled
    by 1e6 and rounded).  Integer projections over the quantized
    embeddings are order-free exact sums, so bucket assignment is
    bit-identical on every engine — the property that lets the DuckDB
    oracle reproduce the whole LSH pipeline (max |term| ~3e12, dim
    terms: far inside int64)."""
    import numpy as np

    rng = np.random.RandomState(7)
    return np.round(
        rng.standard_normal((n_planes, dim)) * 1_000_000
    ).astype(np.int64)


def cosine_topk_lsh(spark, sf_dir: str, k: int = 5, n_planes: int = 8):
    """Approximate top-k via random-hyperplane LSH buckets: vectors are
    bucketed by the sign pattern of n_planes fixed integer projections
    over the quantized embeddings; each query scores only its own
    bucket.  Deterministic end-to-end — the driver hash-checks it
    against a DuckDB oracle (approximation is vs exact top-k, covered
    by the recall test)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb0.select("embedding").first()[0])
    planes = _lsh_planes(n_planes, dim)

    proj_cols = []
    for p in range(n_planes):
        arr = "array(%s)" % ", ".join(
            "%dL" % w for w in planes[p]
        )
        proj_cols.append(
            f"CASE WHEN aggregate(zip_with({QUANT}, {arr}, "
            f"(x, y) -> x * y), 0L, (acc, v) -> acc + v) >= 0 "
            f"THEN {1 << p}L ELSE 0L END"
        )
    bucket = F.expr(" + ".join(proj_cols)).alias("bucket")
    emb = emb0.select(
        "vec_id", F.expr(QUANT).alias("v"), bucket
    )
    emb.cache()
    q = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        "bucket",
    )
    d = emb.select(
        F.col("vec_id").alias("did"), F.col("v").alias("dv"), "bucket"
    )
    dot = F.expr(_DOT.format(a="qv", b="dv")).cast("double")
    nq = F.expr(_DOT.format(a="qv", b="qv")).cast("double")
    nd = F.expr(_DOT.format(a="dv", b="dv")).cast("double")
    scored = (
        q.join(d, "bucket")
        .filter(F.col("qid") != F.col("did"))
        .select(
            "qid", "did", (dot / (F.sqrt(nq) * F.sqrt(nd))).alias("cos")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("did"))
    from trck_spark.pipeline.dedup import _own_caches

    return _own_caches(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "did", F.floor(F.col("cos") * 1000000).cast("long").alias("score_e6"))
        .orderBy("qid", F.desc("score_e6"), "did"),
        [emb],
    )


def cosine_topk_ivf(
    spark,
    sf_dir: str,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_queries: int = 20,
):
    """IVF-style ANN: vectors are partitioned into KMeans cells
    (pyspark.ml, fixed seed); each query scores only its n_probe nearest
    cells.  At scale the cell assignment is the only full pass; queries
    touch n_probe/n_clusters of the data.  Recall vs the exact top-k is
    asserted in tests; the deterministic, oracle-checked IVF is
    ``cosine_topk_ivf_pivot`` (the registered query) — this KMeans
    variant is the library form for callers who want trained centroids.

    No driver-side corpus collect: probe assignment joins the queries
    against a broadcast centers frame (the centers themselves are a
    model artifact — n_clusters rows — not data)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feat = emb0.select(
        "vec_id",
        array_to_vector(
            F.col("embedding").cast("array<double>")
        ).alias("features"),
        F.expr(QUANT).alias("v"),
    )
    model = KMeans(
        k=n_clusters, seed=42, featuresCol="features",
        predictionCol="cell",
    ).fit(feat)
    assigned = model.transform(feat).select("vec_id", "v", "cell")
    assigned.cache()

    # broadcast-join probe ranking, all distributed: queries x centers
    # (n_clusters rows) -> n_probe nearest cells per query
    centers = spark.createDataFrame(
        [
            (int(i), [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "cell int, cv array<double>",
    )
    qe = emb0.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    d2 = F.expr(
        "aggregate(zip_with(qe, cv, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    w_probe = Window.partitionBy("qid").orderBy("d2", "cell")
    probes = (
        qe.crossJoin(F.broadcast(centers))
        .select("qid", "cell", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "cell")
    )

    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cand = (
        probes.join(assigned, "cell")
        .select(F.col("qid"), F.col("vec_id").alias("did"),
                F.col("v").alias("dv"))
        .filter(F.col("qid") != F.col("did"))
        .join(F.broadcast(q), "qid")
    )
    dot = F.expr(_DOT.format(a="qv", b="dv")).cast("double")
    nq = F.expr(_DOT.format(a="qv", b="qv")).cast("double")
    nd = F.expr(_DOT.format(a="dv", b="dv")).cast("double")
    scored = cand.select(
        "qid", "did", (dot / (F.sqrt(nq) * F.sqrt(nd))).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("did"))
    from trck_spark.pipeline.dedup import _own_caches

    return _own_caches(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "did",
            F.floor(F.col("cos") * 1000000).cast("long").alias("score_e6"),
        )
        .orderBy("qid", F.desc("score_e6"), "did"),
        [assigned],
    )


def cosine_topk_ivf_pivot(
    spark,
    sf_dir: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_queries: int = 20,
):
    """IVF-style ANN with deterministic pivot cells: the first n_cells
    vectors act as cell centroids (the k-means++ seeding step without
    the Lloyd iterations), every vector joins its nearest pivot by
    exact integer squared distance, and each query probes its n_probe
    nearest cells.

    Fully deterministic and integer-exact end to end, so the driver
    hash-checks it against a DuckDB oracle — and unlike the KMeans
    variant there is no ML fit pass and no driver-side collect: probe
    assignment is a broadcast join + rank, all distributed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emb = _quantized(spark, sf_dir)
    piv = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("pv")
    )
    dist2 = F.expr(
        "aggregate(zip_with(v, pv, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, t) -> acc + t)"
    )
    ranked = emb.crossJoin(F.broadcast(piv)).select(
        "vec_id", "v", "cell", dist2.alias("d2")
    )
    w_cell = Window.partitionBy("vec_id").orderBy("d2", "cell")
    assigned = (
        ranked.withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )
    probes = (
        ranked.filter(F.col("vec_id") < n_queries)
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("qid"), "cell")
    )
    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cand = (
        probes.join(assigned, "cell")
        .select("qid", F.col("vec_id").alias("did"),
                F.col("v").alias("dv"))
        .filter(F.col("qid") != F.col("did"))
        .join(F.broadcast(q), "qid")
    )
    dot = F.expr(_DOT.format(a="qv", b="dv")).cast("double")
    nq = F.expr(_DOT.format(a="qv", b="qv")).cast("double")
    nd = F.expr(_DOT.format(a="dv", b="dv")).cast("double")
    scored = cand.select(
        "qid", "did", (dot / (F.sqrt(nq) * F.sqrt(nd))).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("did"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "did",
            F.floor(F.col("cos") * 1000000).cast("long").alias("score_e6"),
        )
        .orderBy("qid", F.desc("score_e6"), "did")
    )


def knn_label_vote(spark, sf_dir: str, k: int = 10, n_queries: int = 20):
    """k-NN majority label vote for the first n_queries vectors — the
    embedding-classification shape of a training-data pipeline, oracle
    checkable end-to-end (exact integer scores)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb0.select("vec_id", F.expr(QUANT).alias("v"), "label")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d = emb.select(
        F.col("vec_id").alias("did"), F.col("v").alias("dv"), "label"
    )
    dot = F.expr(_DOT.format(a="qv", b="dv")).cast("double")
    nq = F.expr(_DOT.format(a="qv", b="qv")).cast("double")
    nd = F.expr(_DOT.format(a="dv", b="dv")).cast("double")
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("did"))
        .select(
            "qid", "did", "label",
            (dot / (F.sqrt(nq) * F.sqrt(nd))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("did"))
    knn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return (
        knn.groupBy("qid", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("votes"), F.asc("label")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("qid", F.col("label").alias("pred_label"), "votes")
        .orderBy("qid")
    )
