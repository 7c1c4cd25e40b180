"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The image decode is gated behind an OPTIONAL dependency: ``decode_image``
uses PIL when importable (the real path, wired below), and otherwise
falls back to a deterministic byte-length fake with a warning (or raises
NotImplementedError with ``strict=True``).  This container ships no
image/audio libraries, so the registered queries pin ``fake=True`` —
which also keeps them arithmetic and therefore oracle-checkable.
Everything Spark-side — binary column handling, schema, batch iteration,
partitioning — is identical between the two paths.
"""

from __future__ import annotations


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    n = len(blob)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3)


def decode_image(
    blob: bytes, fake: bool = False, strict: bool = False
) -> tuple[int, int, int]:
    """-> (width, height, channels).

    ``fake=True`` forces the deterministic byte-length stub (the
    oracle-checkable path the registered queries use).  Otherwise PIL
    decodes the real bytes when importable; when PIL is genuinely absent
    the call falls back to the fake with a warning, or raises
    NotImplementedError under ``strict=True`` (a deploy-time gap, not a
    code gap: `pip install pillow` turns the real path on)."""
    if fake:
        return _fake_decode(blob)
    try:
        from PIL import Image
    except ImportError:
        if strict:
            raise NotImplementedError(
                "image decoding requires PIL/pillow (not installed); "
                "pass fake=True for the deterministic stub"
            )
        import warnings

        warnings.warn(
            "PIL/pillow not importable — decode_image falling back to "
            "the deterministic fake decoder",
            RuntimeWarning,
            stacklevel=2,
        )
        return _fake_decode(blob)
    import io

    with Image.open(io.BytesIO(blob)) as im:
        im.load()
        return (im.width, im.height, len(im.getbands()))


def binary_docs(spark, sf_dir: str):
    """Documents with a synthesized binary payload column standing in for
    image bytes (utf-8 of the text; deterministic)."""
    from pyspark.sql import functions as F

    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )


def image_metadata(spark, sf_dir: str):
    """mapInPandas feature extraction over binary blobs: per-blob metadata
    (n_bytes, width, height, aspect).  The fake decoder is deterministic
    byte-length arithmetic, so this query is fully oracle-checkable."""

    df = binary_docs(spark, sf_dir)

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            blobs = pdf["blob"]
            meta = [decode_image(b, fake=True) for b in blobs]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                }
            )
            out["aspect_e6"] = out["width"] * 1000000 // out["height"]
            yield out

    return df.mapInPandas(
        extract,
        schema="doc_id long, n_bytes long, width long, height long, "
        "aspect_e6 long",
    ).orderBy("doc_id")


def image_metadata_oracle_sql() -> str:
    return """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
       ((octet_length(encode(text)) * 7) % 480 + 1)::BIGINT AS height,
       (octet_length(encode(text)) % 640 + 1) * 1000000
         // ((octet_length(encode(text)) * 7) % 480 + 1) AS aspect_e6
FROM documents ORDER BY doc_id
"""


def audio_frame_sample(spark, sf_dir: str, frame_bytes: int = 1024,
                       every_nth: int = 4):
    """Frame sampling plumbing for audio/video blobs: number of frames and
    sampled frame offsets per blob (mapInPandas; arithmetic fake)."""
    from pyspark.sql import functions as F

    df = binary_docs(spark, sf_dir)

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = len(b) // frame_bytes
                offsets = list(range(0, n_frames, every_nth))
                rows.append((doc_id, n_frames, len(offsets)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_sampled"]
            )

    return df.mapInPandas(
        sample, schema="doc_id long, n_frames long, n_sampled long"
    ).orderBy("doc_id")


def audio_frame_sample_oracle_sql(frame_bytes: int = 1024,
                                  every_nth: int = 4) -> str:
    return f"""
SELECT doc_id,
       (octet_length(encode(text)) // {frame_bytes})::BIGINT AS n_frames,
       CASE WHEN octet_length(encode(text)) // {frame_bytes} = 0 THEN 0
            ELSE ((octet_length(encode(text)) // {frame_bytes} - 1)
                  // {every_nth} + 1) END::BIGINT AS n_sampled
FROM documents ORDER BY doc_id
"""


def video_frame_sample(
    spark,
    sf_dir: str,
    frame_bytes: int = 64,
    stride: int = 2,
):
    """Frame sampling over fake video containers: a 1-to-N mapInPandas
    (each blob explodes into its sampled frames) — the batch shape a real
    ffmpeg-backed sampler would have.  The deterministic fake container
    reads fps from the byte length and treats each ``frame_bytes`` slice
    as one frame; every ``stride``-th frame is emitted with its
    timestamp and an md5 frame fingerprint, so the whole operator is
    oracle-checkable (documents are ASCII: byte and char offsets agree
    between the binary slice here and the SQL substring).

    Real decode would replace ``_frames`` with ffmpeg; the Spark-side
    plumbing — binary column in, multi-row Arrow batches out, no shuffle
    until the final presentation sort — is the production shape.
    """

    df = binary_docs(spark, sf_dir)

    def sample(batches):
        import hashlib

        import pandas as pd

        def _frames(blob):
            fps = len(blob) % 30 + 1
            n_frames = len(blob) // frame_bytes
            for idx in range(0, n_frames, stride):
                piece = blob[idx * frame_bytes : (idx + 1) * frame_bytes]
                yield (
                    idx,
                    idx * 1000 // fps,
                    hashlib.md5(piece).hexdigest(),
                )

        for pdf in batches:
            rows = [
                (int(doc_id), idx, ts, h)
                for doc_id, blob in zip(pdf["doc_id"], pdf["blob"])
                for idx, ts, h in _frames(blob)
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ts_ms", "frame_md5"]
            )

    return df.mapInPandas(
        sample,
        schema="doc_id long, frame_idx long, ts_ms long, frame_md5 string",
    ).orderBy("doc_id", "frame_idx")


def video_frame_sample_oracle_sql(
    frame_bytes: int = 64, stride: int = 2
) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id,
         (g - 1) * {stride} AS frame_idx,
         (g - 1) * {stride} * 1000 // (n % 30 + 1) AS ts_ms,
         md5(substring(text,
                       (g - 1) * {stride} * {frame_bytes} + 1,
                       {frame_bytes})) AS frame_md5
  FROM d, LATERAL (
    SELECT unnest(generate_series(
        1, greatest((n // {frame_bytes} + {stride} - 1) // {stride}, 0)
    )) AS g)
)
SELECT doc_id, frame_idx::BIGINT AS frame_idx, ts_ms::BIGINT AS ts_ms,
       frame_md5
FROM f ORDER BY doc_id, frame_idx
"""
