"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Every decode is gated behind an OPTIONAL dependency with the same
three-way contract: ``decode_image`` uses PIL, ``decode_audio`` uses
soundfile, ``decode_video_frames`` uses PyAV — each takes the real path
when its library imports, otherwise falls back to a deterministic
byte-arithmetic fake with a warning, or raises NotImplementedError
under ``strict=True`` (a deploy-time gap, not a code gap: installing
the library turns the real path on).  This container ships none of the
media libraries, so the registered queries pin ``fake=True`` — which
also keeps them arithmetic and therefore oracle-checkable.  Everything
Spark-side — binary column handling, schema, batch iteration,
partitioning — is identical between the paths.
"""

from __future__ import annotations


def _absent(name: str, dep: str, strict: bool) -> None:
    """Shared optional-dependency miss: raise under strict, else warn
    (the caller then runs the deterministic fake)."""
    if strict:
        raise NotImplementedError(
            f"{name} requires {dep} (not installed); "
            "pass fake=True for the deterministic stub"
        )
    import warnings

    warnings.warn(
        f"{dep} not importable — {name} falling back to the "
        "deterministic fake decoder",
        RuntimeWarning,
        stacklevel=3,
    )


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
        _absent("image decoding", "PIL/pillow", strict)
        return _fake_decode(blob)
    import io

    with Image.open(io.BytesIO(blob)) as im:
        im.load()
        return (im.width, im.height, len(im.getbands()))


def _fake_decode_audio(blob: bytes) -> tuple[int, int, int]:
    # bytes read as 16-bit mono PCM at a fixed rate — deterministic
    return (16_000, len(blob) // 2, 1)


def decode_audio(
    blob: bytes, fake: bool = False, strict: bool = False
) -> tuple[int, int, int]:
    """-> (sample_rate, n_samples, n_channels).

    Same optional-dependency contract as ``decode_image``: soundfile
    (libsndfile) decodes real containers (wav/flac/ogg) when
    importable; ``fake=True`` or an absent library uses the
    deterministic bytes-as-PCM16-mono stub."""
    if fake:
        return _fake_decode_audio(blob)
    try:
        import soundfile
    except ImportError:
        _absent("audio decoding", "soundfile", strict)
        return _fake_decode_audio(blob)
    import io

    with soundfile.SoundFile(io.BytesIO(blob)) as f:
        return (f.samplerate, f.frames, f.channels)


def _fake_video_frames(blob: bytes, frame_bytes: int, stride: int):
    """Deterministic fake container: fps from byte length, each
    ``frame_bytes`` slice is one frame; every ``stride``-th frame
    yields (idx, ts_ms, md5-of-slice)."""
    import hashlib

    fps = len(blob) % 30 + 1
    n_frames = len(blob) // frame_bytes
    for idx in range(0, n_frames, stride):
        piece = blob[idx * frame_bytes : (idx + 1) * frame_bytes]
        yield (idx, idx * 1000 // fps, hashlib.md5(piece).hexdigest())


def decode_video_frames(
    blob: bytes,
    frame_bytes: int = 64,
    stride: int = 2,
    fake: bool = False,
    strict: bool = False,
):
    """Yield (frame_idx, ts_ms, frame_md5) for every ``stride``-th
    frame of a video blob.

    Real path: PyAV demuxes/decodes the container's first video stream
    and fingerprints each sampled frame's raw planes (frame_bytes is
    ignored — real frames carry their own size).  Fake path: the
    byte-slice container (see ``_fake_video_frames``)."""
    if fake:
        yield from _fake_video_frames(blob, frame_bytes, stride)
        return
    try:
        import av
    except ImportError:
        _absent("video decoding", "PyAV", strict)
        yield from _fake_video_frames(blob, frame_bytes, stride)
        return
    import hashlib
    import io

    with av.open(io.BytesIO(blob)) as container:
        stream = container.streams.video[0]
        tb = stream.time_base
        for idx, frame in enumerate(container.decode(stream)):
            if idx % stride:
                continue
            ts_ms = (
                int(frame.pts * tb * 1000) if frame.pts is not None else 0
            )
            digest = hashlib.md5(
                b"".join(bytes(p) for p in frame.planes)
            ).hexdigest()
            yield (idx, ts_ms, digest)


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
                       every_nth: int = 4, fake: bool = True,
                       strict: bool = False):
    """Frame sampling plumbing for audio blobs: number of PCM frames
    and sampled frame offsets per blob (mapInPandas through
    ``decode_audio``).  The registered query pins ``fake=True`` (the
    oracle-checkable byte-arithmetic stub: 16-bit mono, so
    n_frames == n_bytes // frame_bytes for even frame_bytes);
    ``fake=False`` decodes real containers via soundfile when
    importable."""

    df = binary_docs(spark, sf_dir)

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                _sr, n_samples, ch = decode_audio(
                    bytes(b), fake=fake, strict=strict
                )
                frame_samples = max(frame_bytes // (2 * max(ch, 1)), 1)
                n_frames = n_samples // frame_samples
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
    fake: bool = True,
    strict: bool = False,
):
    """Frame sampling over video containers: a 1-to-N mapInPandas (each
    blob explodes into its sampled frames) through
    ``decode_video_frames``.  The registered query pins ``fake=True``:
    the deterministic container reads fps from the byte length and
    treats each ``frame_bytes`` slice as one frame, every
    ``stride``-th frame emitting its timestamp and an md5 frame
    fingerprint — fully oracle-checkable (documents are ASCII: byte
    and char offsets agree between the binary slice here and the SQL
    substring).  ``fake=False`` demuxes/decodes real containers via
    PyAV when importable; the Spark-side plumbing — binary column in,
    multi-row Arrow batches out, no shuffle until the final
    presentation sort — is identical.
    """

    df = binary_docs(spark, sf_dir)

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(doc_id), idx, ts, h)
                for doc_id, blob in zip(pdf["doc_id"], pdf["blob"])
                for idx, ts, h in decode_video_frames(
                    bytes(blob), frame_bytes, stride,
                    fake=fake, strict=strict,
                )
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
