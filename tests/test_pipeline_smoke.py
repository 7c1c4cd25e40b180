"""Smoke the rows-only (approximate / hash-defined) queries: they must
execute and return sane shapes; exactness is covered by their oracle-backed
exact counterparts.
"""

from __future__ import annotations

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_minhash_lsh_recall(spark):
    """LSH candidates verified by exact jaccard must be a subset of the
    exact pair set, with high recall at this threshold/band config."""
    from trck_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r["a"], r["b"]) for r in ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    lsh = {
        (r["a"], r["b"]) for r in minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    assert lsh <= exact
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_simhash_pairs(spark):
    from trck_spark.pipeline.dedup import simhash_pairs

    rows = simhash_pairs(spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r["hamming"] <= 3
        assert r["a"] < r["b"]


def test_cosine_lsh_subset(spark):
    """Bucketed ANN returns <= k rows per query with valid scores."""
    from trck_spark.pipeline.similarity import cosine_topk_lsh

    rows = cosine_topk_lsh(spark, SF_DIR, k=5).collect()
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["score_e6"])
        assert -1_000_001 <= r["score_e6"] <= 1_000_001
    for scores in per_q.values():
        assert len(scores) <= 5


def test_ivf_recall(spark):
    """IVF top-k must recall most of the exact top-k at this scale."""
    from trck_spark.pipeline.similarity import cosine_topk, cosine_topk_ivf

    exact = {
        (r["qid"], r["did"])
        for r in cosine_topk(spark, SF_DIR, k=5, n_queries=20).collect()
    }
    ivf = {
        (r["qid"], r["did"])
        for r in cosine_topk_ivf(spark, SF_DIR, k=5, n_queries=20).collect()
    }
    assert len(ivf) > 0
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_multimodal_decode_stub():
    from trck_spark.pipeline.multimodal import decode_image

    import pytest

    w, h, c = decode_image(b"x" * 100, fake=True)
    assert (w, h, c) == (101, 221, 3)
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        # strict mode surfaces the missing optional dep...
        with pytest.raises(NotImplementedError):
            decode_image(b"xx", strict=True)
        # ...default mode warns and falls back to the deterministic fake
        with pytest.warns(RuntimeWarning):
            assert decode_image(b"x" * 100) == (101, 221, 3)


def test_multimodal_decode_real_pil():
    """Real decode path: PIL round-trip on a generated PNG (skipped when
    pillow is not installed — the container default)."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from trck_spark.pipeline.multimodal import decode_image

    buf = io.BytesIO()
    PIL_Image.new("RGB", (17, 9)).save(buf, format="PNG")
    assert decode_image(buf.getvalue()) == (17, 9, 3)


def test_multimodal_decode_audio_stub():
    from trck_spark.pipeline.multimodal import decode_audio

    import pytest

    assert decode_audio(b"x" * 100, fake=True) == (16_000, 50, 1)
    try:
        import soundfile  # noqa: F401

        has_sf = True
    except ImportError:
        has_sf = False
    if not has_sf:
        with pytest.raises(NotImplementedError):
            decode_audio(b"xx", strict=True)
        with pytest.warns(RuntimeWarning):
            assert decode_audio(b"x" * 100) == (16_000, 50, 1)


def test_multimodal_decode_audio_real():
    """Real decode path: soundfile round-trip on a generated WAV
    (skipped when soundfile is not installed — the container default)."""
    import pytest

    soundfile = pytest.importorskip("soundfile")
    import io

    import numpy as np

    from trck_spark.pipeline.multimodal import decode_audio

    buf = io.BytesIO()
    soundfile.write(
        buf, np.zeros((480, 2), dtype=np.int16), 48_000, format="WAV"
    )
    assert decode_audio(buf.getvalue()) == (48_000, 480, 2)


def test_multimodal_decode_video_stub():
    import hashlib

    import pytest

    from trck_spark.pipeline.multimodal import decode_video_frames

    blob = bytes(range(200))  # 200 bytes, frame_bytes=64 -> 3 frames
    frames = list(decode_video_frames(blob, 64, 2, fake=True))
    fps = 200 % 30 + 1
    assert frames == [
        (0, 0, hashlib.md5(blob[0:64]).hexdigest()),
        (2, 2000 // fps, hashlib.md5(blob[128:192]).hexdigest()),
    ]
    try:
        import av  # noqa: F401

        has_av = True
    except ImportError:
        has_av = False
    if not has_av:
        with pytest.raises(NotImplementedError):
            list(decode_video_frames(b"xx", strict=True))
        with pytest.warns(RuntimeWarning):
            assert list(decode_video_frames(blob, 64, 2)) == frames


def test_multimodal_decode_video_real():
    """Real decode path: PyAV round-trip on a generated container
    (skipped when PyAV is not installed — the container default)."""
    import pytest

    av = pytest.importorskip("av")
    import io

    import numpy as np

    from trck_spark.pipeline.multimodal import decode_video_frames

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 32, 32
        for _ in range(6):
            frame = av.VideoFrame.from_ndarray(
                np.zeros((32, 32, 3), dtype=np.uint8), format="rgb24"
            )
            for packet in stream.encode(frame):
                out.mux(packet)
        for packet in stream.encode():
            out.mux(packet)
    frames = list(decode_video_frames(buf.getvalue(), stride=2))
    assert [idx for idx, _ts, _h in frames] == [0, 2, 4]


# ---- stdlib real-decode tier: real bytes, zero optional deps, never
# skipped (the PIL/soundfile/PyAV round-trips above skip in wheel-less
# environments, which left the real paths without a CI signal)


def test_decode_image_stdlib_png():
    """A REAL PNG (stdlib zlib encoder, CRC-correct) must decode to its
    true dimensions via whichever tier is active — PIL when installed,
    the stdlib header parser otherwise — never the byte-length fake."""
    import struct
    import zlib

    from trck_spark.pipeline.multimodal import (
        _parse_image_header, decode_image,
    )

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    w, h = 17, 9
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10" * (3 * w) for _ in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_image(png) == (17, 9, 3)
    assert _parse_image_header(png) == (17, 9, 3)
    # GIF + BMP + JPEG headers through the parser directly
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert _parse_image_header(gif) == (320, 200, 3)
    bmp = (
        b"BM" + b"\x00" * 16
        + struct.pack("<ii", 64, -48) + b"\x01\x00"
        + struct.pack("<H", 24) + b"\x00" * 8
    )
    assert _parse_image_header(bmp) == (64, 48, 3)
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 9, 17) + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )
    assert _parse_image_header(jpg) == (17, 9, 3)
    # 0xFF fill/padding bytes before a marker are legal (ISO 10918-1
    # B.1.1.2): the walker must skip them, not read a bogus seg length
    jpg_pad = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # padding run before the APP0 marker
        + b"\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xff"      # padding before SOF0 too
        + b"\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 9, 17) + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )
    assert _parse_image_header(jpg_pad) == (17, 9, 3)
    # a truncated all-padding tail must return None, not index out
    assert _parse_image_header(b"\xff\xd8" + b"\xff" * 20) is None


def test_decode_audio_stdlib_wav():
    """A REAL PCM WAV (stdlib wave encoder) must decode to its true
    (rate, frames, channels) via soundfile or the stdlib wave tier."""
    import io
    import wave

    from trck_spark.pipeline.multimodal import decode_audio

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(48_000)
        f.writeframes(b"\x00\x00" * 2 * 480)
    assert decode_audio(buf.getvalue()) == (48_000, 480, 2)


def test_decode_video_stdlib_y4m():
    """A REAL YUV4MPEG2 stream (hand-assembled, spec-exact) must demux
    to per-frame digests of its raw planes via PyAV or the stdlib y4m
    tier.  Digests are asserted against independently computed md5 of
    the known payloads."""
    import hashlib

    from trck_spark.pipeline.multimodal import (
        _y4m_frames, decode_video_frames,
    )

    w, h, n_frames = 4, 4, 5
    frame_size = w * h + 2 * (w // 2) * (h // 2)  # 420: 24 bytes
    header = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n"
    payloads = [
        bytes((i * 37 + j) % 256 for j in range(frame_size))
        for i in range(n_frames)
    ]
    blob = header + b"".join(b"FRAME\n" + p for p in payloads)

    expect = [
        (i, i * 1000 // 25, hashlib.md5(payloads[i]).hexdigest())
        for i in range(0, n_frames, 2)
    ]
    assert list(_y4m_frames(blob, stride=2)) == expect
    try:
        import av  # noqa: F401
    except ImportError:
        # stdlib tier active: full digest equality on real bytes
        assert list(decode_video_frames(blob, stride=2)) == expect
    else:
        # PyAV tier: same frames sampled; digests may differ only if
        # PyAV pads plane strides (it doesn't at these sizes)
        got = list(decode_video_frames(blob, stride=2))
        assert [(i, ts) for i, ts, _d in got] == [
            (i, ts) for i, ts, _d in expect
        ]


def test_ngram_hot_shingle_cap(spark, tmp_path):
    """A shingle shared by every doc must not explode into O(n^2)
    candidate pairs: with df > max_shingle_df it is dropped from counts
    and intersections; pairs via rare shingles survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trck_spark.pipeline.dedup import ngram_jaccard_pairs

    hot = "the quick brown"  # one 3-gram shared by all docs
    docs = []
    for i in range(40):
        docs.append(f"{hot} filler{i} x{i} y{i} z{i}")
    # docs 100/101: near-identical via rare shingles
    docs.append(f"{hot} alpha beta gamma delta")
    docs.append(f"{hot} alpha beta gamma delta epsilon")
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    pq.write_table(
        pa.table(
            {"doc_id": list(range(len(docs))), "text": docs}
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = ngram_jaccard_pairs(
        spark, d, threshold=0.2, max_shingle_df=10
    ).collect()
    pairs = {(r["a"], r["b"]): r["jaccard_e6"] for r in rows}
    # the hot shingle binds all 42 docs; capped, only the real near-dup
    # pair (via its rare shingles) remains
    assert set(pairs) == {(40, 41)}
    # jaccard over non-hot shingles only: 4 shared, union 5 -> 0.8
    assert pairs[(40, 41)] == 800000


def test_cosine_ivf_pivot_recall(spark):
    """Deterministic pivot-cell IVF must keep good recall vs the exact
    top-k at n_probe/n_cells = 4/16."""
    from trck_spark.pipeline.similarity import (
        cosine_topk,
        cosine_topk_ivf_pivot,
    )

    exact = {
        (r["qid"], r["did"])
        for r in cosine_topk(spark, SF_DIR, k=5, n_queries=5).collect()
    }
    piv = {
        (r["qid"], r["did"])
        for r in cosine_topk_ivf_pivot(
            spark, SF_DIR, k=5, n_queries=5
        ).collect()
    }
    assert len(piv & exact) / len(exact) >= 0.8


def test_embedding_near_dup_recall(spark):
    """Banded-LSH near-dup pairs must be a subset of the exact cosine
    pair set (verification is exact), with high recall at this
    threshold/band config."""
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import embedding_near_dup_pairs
    from trck_spark.pipeline.similarity import _DOT, QUANT

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.expr(QUANT).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    dot = F.expr(_DOT.format(a="va", b="vb")).cast("double")
    na = F.expr(_DOT.format(a="va", b="va")).cast("double")
    nb = F.expr(_DOT.format(a="vb", b="vb")).cast("double")
    exact = {
        (r["a"], r["b"])
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", dot / (F.sqrt(na) * F.sqrt(nb)))
        .filter(F.col("cos") >= 0.4)
        .select("a", "b")
        .collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(
            spark, SF_DIR, threshold=0.4
        ).collect()
    }
    assert lsh <= exact
    assert exact, "threshold 0.4 must be non-trivial on the test data"
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"near-dup recall too low: {recall}"


def test_dedup_clusters_invariants(spark):
    """Cluster labels must be closed over the edge set (both endpoints of
    every pair share a label), each label must be the minimum doc_id of
    its cluster, and sizes must sum back to the corpus."""
    from trck_spark.pipeline.dedup import dedup_clusters, ngram_jaccard_pairs

    labels = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(spark, SF_DIR).collect()
    }
    edges = ngram_jaccard_pairs(spark, SF_DIR).collect()
    assert edges, "fixture corpus should contain near-dup pairs"
    for e in edges:
        assert labels[e["a"]][0] == labels[e["b"]][0]
    by_cluster: dict = {}
    for doc, (cid, size) in labels.items():
        by_cluster.setdefault(cid, []).append((doc, size))
    for cid, members in by_cluster.items():
        assert cid == min(d for d, _ in members)
        assert all(s == len(members) for _, s in members)
    assert sum(len(m) for m in by_cluster.values()) == len(labels)


def test_quota_sample_group_limit_plan(spark):
    """The rank filter must compile to a map-side (Partial)
    WindowGroupLimit so the stratum shuffle carries O(strata x N) rows,
    not the corpus — the property that makes deterministic quota
    sampling viable at 100 TB."""
    from trck_spark.pipeline.curation import quota_sample

    df = quota_sample(spark, SF_DIR, per_source=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    rows = df.collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["rk"])
    for rks in per_source.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 10


def test_contamination_bounds(spark):
    from trck_spark.pipeline.curation import contamination_check

    rows = contamination_check(spark, SF_DIR, n_eval=100).collect()
    for r in rows:
        assert r["doc_id"] >= 100
        assert 1 <= r["n_shared"] <= r["n_shingles"]
        assert 0 < r["overlap_e6"] <= 1_000_000


def test_connected_components_chain_log_rounds(spark):
    """A 200-node path graph converges in O(log diameter) rounds thanks
    to the pointer-jumping shortcut — propagation alone would need 199
    rounds and blow the iteration cap."""
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import connected_components

    n = 200
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels, rounds = connected_components(nodes, sym, max_iters=25)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 12, f"pointer jumping should converge fast, took {rounds}"


def test_mixture_sample_rates(spark):
    """Hash-fraction sampling keeps ~rate of each stratum (uniformity of
    the md5 fraction) and applies the default rate to unlisted sources."""
    from trck_spark.pipeline.curation import mixture_sample

    rates = {"src0": 0.8, "src1": 0.0}
    out = mixture_sample(spark, SF_DIR, rates=rates, default_rate=0.3)
    kept: dict = {}
    for r in out.collect():
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    total = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source").count().withColumnRenamed("count", "n")
        .collect()
    }
    assert kept.get("src1", 0) == 0  # rate 0 keeps nothing
    f0 = kept["src0"] / total["src0"]
    assert 0.5 < f0 <= 1.0, f0  # ~0.8 of ~25 docs, wide tolerance
    others = sum(v for k, v in kept.items() if k not in rates)
    n_others = sum(v for k, v in total.items() if k not in rates)
    assert 0.1 < others / n_others < 0.55  # ~0.3


def test_containment_catches_subset_dup(spark, tmp_path):
    """A short doc fully embedded in a long one scores containment 1.0
    even though its Jaccard is far below any useful threshold — the case
    the containment operator exists for."""
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        release,
    )

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    long = filler + " " + short + " " + filler[::-1].replace("w", "v")
    df = spark.createDataFrame(
        [(0, short), (1, long)], "doc_id long, text string"
    ).withColumn("source", F.lit("s")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text"))
    d = str(tmp_path / "sub")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    cont = ngram_containment_pairs(spark, d, threshold=0.9)
    rows = cont.collect()
    release(cont)
    assert [(r["a"], r["b"]) for r in rows] == [(0, 1)]
    assert rows[0]["containment_e6"] == 1000000

    jac = ngram_jaccard_pairs(spark, d, threshold=0.9)
    jrows = jac.collect()
    release(jac)
    assert jrows == []  # Jaccard misses the subset duplicate


def test_sequence_pack_invariants(spark):
    """Per shard: offsets are contiguous (each doc starts where the
    previous ended), bins cover [start, start+n_tokens-1] at budget 512,
    and every doc appears exactly once."""
    from trck_spark.pipeline.curation import sequence_pack

    out = sequence_pack(spark, SF_DIR, budget=512, n_shards=8).collect()
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    assert len(out) == n_docs
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(8))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_offset"])
        pos = 0
        for r in rows:
            assert r["start_offset"] == pos
            assert r["bin_first"] == pos // 512
            assert r["bin_last"] == (pos + r["n_tokens"] - 1) // 512
            pos += r["n_tokens"]


def _write_docs(spark, tmp_path, rows, name="docs"):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumn("source", F.lit("s")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text"))
    d = str(tmp_path / name)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def _oracle_rows(sql, sf_dir, table="documents"):
    """Run an oracle SQL string on a planted fixture dir via DuckDB —
    parity on ADVERSARIAL fixtures, not just the synthetic corpus
    (whose text, e.g., contains zero PII hits)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW {table} AS "
        f"SELECT * FROM '{sf_dir}/{table}.parquet/*.parquet'"
    )
    return con.sql(sql).fetchall()


def _spark_vs_oracle(df, sql, sf_dir, table="documents"):
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in _oracle_rows(sql, sf_dir, table))
    assert got == want, (got[:5], want[:5])


def test_pii_planted(spark, tmp_path):
    """Planted PII is counted per pattern and the redaction matches a
    Python re.sub applying the same patterns in the same order."""
    import hashlib
    import re

    from trck_spark.pipeline.text import _PII_PATTERNS, pii_stats

    t0 = ("contact bob@example.com or alice.smith+x@mail.co, "
          "call 555-123-4567, ssn 123-45-6789, host 10.0.0.1 ok")
    t1 = "no pii here at all"
    d = _write_docs(spark, tmp_path, [(0, t0), (1, t1)], "pii")

    rows = {r["doc_id"]: r for r in pii_stats(spark, d).collect()}
    assert rows[0]["n_email"] == 2
    assert rows[0]["n_phone"] == 1
    assert rows[0]["n_ssn"] == 1
    assert rows[0]["n_ipv4"] == 1
    assert rows[0]["n_pii"] == 5
    assert rows[1]["n_pii"] == 0

    red = t0
    for _name, tok, pat in _PII_PATTERNS:
        red = re.sub(pat, tok, red)
    assert "bob@example.com" not in red and "<EMAIL>" in red
    assert rows[0]["redacted_md5"] == hashlib.md5(
        red.encode()
    ).hexdigest()
    assert rows[1]["redacted_md5"] == hashlib.md5(
        t1.encode()
    ).hexdigest()

    # DuckDB oracle must agree on NON-ZERO hits too (the synthetic
    # corpus has none, so the registered parity check never sees any)
    from trck_spark.pipeline.text import pii_stats_oracle_sql

    _spark_vs_oracle(pii_stats(spark, d), pii_stats_oracle_sql(), d)


def test_dup_span_planted(spark, tmp_path):
    """A doc duplicated verbatim scores 100% dup positions; a unique doc
    scores 0; a doc shorter than the gram width reports zero grams."""
    from trck_spark.pipeline.dedup import dup_span_stats

    shared = "a b c d e f g h"          # 8 tokens -> 4 5-gram positions
    unique = "q w e r t y u i o p"      # 10 tokens -> 6 positions
    short = "x y z"                     # < 5 tokens -> 0 positions
    d = _write_docs(
        spark, tmp_path,
        [(0, shared), (1, shared), (2, unique), (3, short)],
        "spans",
    )
    rows = {r["doc_id"]: r for r in dup_span_stats(spark, d).collect()}
    assert rows[0]["n_grams"] == 4 and rows[0]["n_dup_grams"] == 4
    assert rows[0]["dup_frac_e6"] == 1000000
    assert rows[1]["n_dup_grams"] == 4
    assert rows[2]["n_grams"] == 6 and rows[2]["n_dup_grams"] == 0
    assert rows[3]["n_grams"] == 0 and rows[3]["dup_frac_e6"] == 0

    from trck_spark.pipeline.dedup import dup_span_stats_oracle_sql

    _spark_vs_oracle(
        dup_span_stats(spark, d), dup_span_stats_oracle_sql(), d
    )


def test_tfidf_planted(spark, tmp_path):
    """tf x linear-idf ranking on a 2-doc corpus: doc-specific terms
    outrank corpus-wide ones; scores are the exact integer formula."""
    from trck_spark.pipeline.text import tfidf_topterms

    d = _write_docs(
        spark, tmp_path,
        [(0, "apple apple banana"), (1, "banana cherry")],
        "tfidf",
    )
    rows = tfidf_topterms(spark, d, k=3).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rk"], r["term"], r["score_e6"])
        )
    # N=2; doc0: apple tf=2 df=1 -> 4e6; banana tf=1 df=2 -> 1e6
    assert by_doc[0] == [(1, "apple", 4_000_000), (2, "banana", 1_000_000)]
    # doc1: cherry tf=1 df=1 -> 2e6; banana -> 1e6
    assert by_doc[1] == [(1, "cherry", 2_000_000), (2, "banana", 1_000_000)]


def test_semantic_dedup_planted(spark, tmp_path):
    """A vector nearly parallel to a lower-id cell-mate is dropped with
    dup_of pointing at it; orthogonal cell-mates survive."""
    from trck_spark.pipeline.dedup import release, semantic_dedup

    vecs = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (2, [1.0, 0.001], 0),   # near-dup of 0 -> same cell, dropped
        (3, [-1.0, 0.0], 0),    # lands in cell 1, cos 0 vs pivot 1
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    out = semantic_dedup(spark, d, n_cells=2, threshold=0.7)
    rows = {r["vec_id"]: r for r in out.collect()}
    release(out)
    assert rows[0]["kept"] and rows[0]["cell"] == 0
    assert rows[1]["kept"] and rows[1]["cell"] == 1
    assert not rows[2]["kept"] and rows[2]["dup_of"] == 0
    assert rows[3]["kept"]

    from trck_spark.pipeline.dedup import semantic_dedup_oracle_sql

    out2 = semantic_dedup(spark, d, n_cells=2, threshold=0.7)
    _spark_vs_oracle(
        out2, semantic_dedup_oracle_sql(n_cells=2, threshold=0.7),
        d, table="embeddings",
    )
    release(out2)


def test_dup_span_and_tfidf_single_explode_pipeline(spark):
    """Corpus-wide totals must ride a window over the one aggregated
    lineage, NOT a groupBy + self-join: the join form plans the
    scan->explode->aggregate pipeline twice (the join's implied
    isnotnull filter defeats exchange-reuse canonicalization), doubling
    the dominant stage at 100 TB.  Pinned: exactly one Generate
    (explode) in each executed plan."""
    from trck_spark.pipeline.dedup import dup_span_stats
    from trck_spark.pipeline.text import tfidf_topterms

    for df in (dup_span_stats(spark, SF_DIR),
               tfidf_topterms(spark, SF_DIR)):
        df.collect()  # AQE: final plan only materializes after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # toString prints "== Final Plan ==" then "== Initial Plan ==";
        # only the executed (final) section counts
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Generate explode") == 1, final[:2000]


def test_session_features_matches_fsm_sessions(spark):
    """The relational session_features table must agree with the trck
    FSM sessionization on the same 30-minute gap rule: total session
    rows == the FSM's $sessions counter, and per-session invariants
    hold."""
    from trck_spark.queries import q_session_features, q_trck_sessions

    feats = q_session_features(spark, SF_DIR).collect()
    fsm_total = q_trck_sessions(spark, SF_DIR).collect()[0]["sessions"]
    assert len(feats) == fsm_total
    for r in feats:
        assert r["n_events"] >= 1
        assert r["duration_s"] >= 0
        assert r["duration_s"] < 100 * 86400
        assert r["n_clicks"] <= r["n_events"]


def test_incremental_dedup_planted(spark, tmp_path):
    """Corpus dups, within-batch dups and fresh docs classify correctly;
    corpus docs never appear in the output."""
    from pyspark.sql import functions as F

    from trck_spark.pipeline.dedup import incremental_dedup

    rows = [
        (0, "the corpus doc", "src0"),
        (1, "another corpus doc", "src0"),
        (10, "the corpus doc", "src1"),       # dup of corpus
        (11, "a brand new doc", "src1"),      # fresh
        (12, "a brand new doc", "src2"),      # dup within batch
        (13, "unique again", "src2"),         # fresh
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    )
    d = str(tmp_path / "inc")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    out = {r["doc_id"]: r["status"]
           for r in incremental_dedup(spark, d).collect()}
    assert out == {10: "corpus_dup", 11: "kept",
                   12: "batch_dup", 13: "kept"}

    from trck_spark.pipeline.dedup import incremental_dedup_oracle_sql

    _spark_vs_oracle(
        incremental_dedup(spark, d), incremental_dedup_oracle_sql(), d
    )


def test_hash_split_stability(spark):
    """Split assignment is a pure function of doc_id: stable across
    invocations and partitionings, and the bucket histogram respects the
    requested percentages within coarse tolerance."""
    from trck_spark.pipeline.curation import hash_split

    a = {r["doc_id"]: r["split"] for r in hash_split(spark, SF_DIR).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(spark, SF_DIR, val_pct=1, test_pct=1).collect()
    }
    assert a == b
    n = len(a)
    frac_train = sum(1 for v in a.values() if v == "train") / n
    assert frac_train > 0.9  # 98% requested; tiny-sample tolerance


def test_lm_score_planted(spark, tmp_path):
    """Hand-computed Laplace bigram scores on a 3-doc corpus: the
    reference slice is doc 0 ('a b a b'), so c1 = {a:2, b:2}, V = 2,
    c2 = {(a,b):2, (b,a):1}.  Scores (integer e6):
      (a,b): 1e6*3 // 4 = 750000   (b,a): 1e6*2 // 4 = 500000
      (b,b): 1e6*1 // 4 = 250000   (c,a): 1e6*1 // (0+2) = 500000
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trck_spark.pipeline.text import lm_score

    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b a b", "b b c a", "x"]),
            "source": pa.array(["src0", "src1", "src1"]),
        }),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r for r in lm_score(spark, str(tmp_path)).collect()}
    # doc 0: bigrams (a,b),(b,a),(a,b) -> (750000+500000+750000)//3
    assert rows[0]["lm_bigrams"] == 3
    assert rows[0]["lm_score_e6"] == 2000000 // 3
    # doc 1: (b,b),(b,c),(c,a) -> b,c unseen bigram: 1e6*1//(2+2)=250000
    assert rows[1]["lm_bigrams"] == 3
    assert rows[1]["lm_score_e6"] == (250000 + 250000 + 500000) // 3
    # doc 2: single token -> no bigrams, score 0
    assert rows[2]["lm_bigrams"] == 0 and rows[2]["lm_score_e6"] == 0
    # empty reference slice: raise loudly instead of silently scoring
    # everything 0 via non-ANSI DIV-by-zero null (ADVICE r05)
    import pytest as _pytest

    with _pytest.raises(Exception, match="reference slice is empty"):
        lm_score(spark, str(tmp_path), ref_source="no_such_source").collect()


def test_short_docs_survive_all_operators(spark, tmp_path):
    """Documents with 0/1/2 words must not crash any shingle- or
    bigram-based operator.  Regression: Spark's sequence(1, 0) yields
    the DESCENDING array [1, 0] (unlike SQL generate_series, which is
    empty), so the un-guarded shingle window indexed out of bounds on
    any real-world corpus containing a short document."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trck_spark.pipeline import curation, dedup, text

    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array([
                "", "one", "two words",
                "three words here",
                "a slightly longer document with enough words",
                "a slightly longer document with enough words",
                None,  # null text must flow through, never crash
                "héllo wörld émoji 🎉 unicode test words",
            ]),
            "lang": pa.array(["en"] * 8),
            "source": pa.array(["src0"] * 8),
            "n_chars": pa.array(
                [0, 3, 9, 16, 44, 44, 0, 39], pa.int64()
            ),
        }),
        str(tmp_path / "documents.parquet"),
    )
    d = str(tmp_path)
    for fn in (
        lambda: dedup.ngram_jaccard_pairs(spark, d).collect(),
        lambda: dedup.ngram_containment_pairs(spark, d).collect(),
        lambda: dedup.minhash_lsh_pairs(spark, d).collect(),
        lambda: dedup.simhash_pairs(spark, d).collect(),
        lambda: dedup.dup_span_stats(spark, d).collect(),
        lambda: curation.contamination_check(spark, d, n_eval=2).collect(),
        lambda: text.lm_score(spark, d).collect(),
    ):
        fn()  # must not raise
    # the exact-dup pair (docs 4, 5) must still be found end-to-end
    surv = dedup.dedup_apply(spark, d, threshold=0.2)
    ids = {r["doc_id"] for r in surv.collect()}
    dedup.release(surv)
    assert 4 in ids and 5 not in ids


def test_dedup_clusters_minhash_method(spark):
    """method='minhash' edges are a REFINEMENT of the exact ngram
    clustering (a missed banding edge can split a cluster, never merge
    two): every minhash cluster must sit wholly inside one ngram
    cluster, and byte-identical docs must still co-cluster (identical
    signatures collide in every band)."""
    from trck_spark.pipeline.dedup import dedup_clusters, release

    ng = dedup_clusters(spark, SF_DIR, method="ngram")
    ng_lbl = {r["doc_id"]: r["cluster_id"] for r in ng.collect()}
    release(ng)
    mh = dedup_clusters(spark, SF_DIR, method="minhash")
    mh_rows = mh.collect()
    mh_lbl = {r["doc_id"]: r["cluster_id"] for r in mh_rows}
    release(mh)
    assert set(mh_lbl) == set(ng_lbl)
    # refinement: same minhash label -> same ngram label
    by_mh: dict = {}
    for d, c in mh_lbl.items():
        by_mh.setdefault(c, set()).add(ng_lbl[d])
    for c, ng_labels in by_mh.items():
        assert len(ng_labels) == 1, (
            f"minhash cluster {c} spans ngram clusters {ng_labels}"
        )


def test_table_rows_memo_invalidates_on_rewrite(spark, tmp_path):
    """_table_rows memoizes parquet footer counts for the auto bucket-cap
    gate; a same-path rewrite at a different scale (benchdata's ensure_*
    regenerating mid-session) must invalidate the memo via the directory
    mtime key, not silently mis-gate the cap (ADVICE r06: dedup.py:94)."""
    import os

    from trck_spark.pipeline.dedup import _table_rows

    path = str(tmp_path / "docs.parquet")
    spark.range(10).write.mode("overwrite").parquet(path)
    assert _table_rows(spark, path) == 10
    spark.range(25).write.mode("overwrite").parquet(path)
    # parquet overwrite replaces part files; force a distinct mtime even
    # on coarse-mtime filesystems
    t = os.path.getmtime(path) + 2
    os.utime(path, (t, t))
    assert _table_rows(spark, path) == 25
