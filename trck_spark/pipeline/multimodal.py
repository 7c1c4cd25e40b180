"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Every decode is gated behind an OPTIONAL dependency with the same
tiered contract: ``decode_image`` uses PIL, ``decode_audio`` uses
soundfile, ``decode_video_frames`` uses PyAV — each takes the library
path when it imports; when the library is absent, a PURE-STDLIB real
decoder handles the ubiquitous containers (PNG/GIF/BMP/JPEG header
parse; PCM WAV via ``wave``; YUV4MPEG2 demux — see
_parse_image_header / _y4m_frames), so real bytes still really decode
in wheel-less environments and the real paths are exercised by tests
that never skip; only an unrecognized container falls back to the
deterministic byte-arithmetic fake with a warning, or raises
NotImplementedError under ``strict=True``.  The registered queries pin
``fake=True`` — arithmetic and therefore oracle-checkable.  Everything
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


def _parse_image_header(blob: bytes):
    """Pure-stdlib REAL metadata decode -> (width, height, channels),
    or None if the container isn't recognized.

    Parses the actual bytes of the four ubiquitous containers — PNG
    IHDR, GIF logical screen descriptor, BMP BITMAPINFOHEADER, JPEG
    SOFn — so the optional-PIL gap does not leave decode_image's
    metadata contract untested in environments without wheels: this
    tier needs nothing beyond ``struct``.  (PIL, when importable,
    still takes precedence: it validates/decodes full pixel data and
    covers every format.)"""
    import struct

    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 26:
        # IHDR is mandatory-first: width, height, bit depth, color type
        w, h = struct.unpack(">II", blob[16:24])
        color_type = blob[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels:
            return (w, h, channels)
        return None
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w, h = struct.unpack("<HH", blob[6:10])
        return (w, h, 3)
    if blob[:2] == b"BM" and len(blob) >= 30:
        w, h = struct.unpack("<ii", blob[18:26])
        bpp = struct.unpack("<H", blob[28:30])[0]
        return (w, abs(h), 4 if bpp == 32 else (1 if bpp <= 8 else 3))
    if blob[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to SOFn
        i = 2
        while i + 9 < len(blob):
            if blob[i] != 0xFF:
                return None
            # skip 0xFF fill/padding bytes allowed before any marker
            # (ISO 10918-1 B.1.1.2) — treating a padding 0xFF as the
            # marker byte reads a bogus segment length
            while blob[i + 1] == 0xFF:
                i += 1
                if i + 9 >= len(blob):
                    return None
            marker = blob[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (
                0xC4, 0xC8, 0xCC
            ):
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return (w, h, blob[i + 9])
            i += 2 + seg_len
    return None


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
        # stdlib tier: REAL header parse of PNG/GIF/BMP/JPEG bytes (no
        # wheels needed) before admitting defeat — see
        # _parse_image_header
        parsed = _parse_image_header(blob)
        if parsed is not None:
            return parsed
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
        # stdlib tier: the `wave` module is a REAL PCM WAV decoder —
        # no wheels needed; soundfile still adds flac/ogg/etc. on top
        if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(blob)) as f:
                return (
                    f.getframerate(), f.getnframes(), f.getnchannels()
                )
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


def _y4m_frames(blob: bytes, stride: int):
    """Pure-stdlib REAL demux/decode of a YUV4MPEG2 (y4m) container:
    yields (frame_idx, ts_ms, md5-of-raw-planes) for every
    ``stride``-th frame.  y4m is the standard uncompressed interchange
    format (ffmpeg/mpv/codec test suites): a space-separated ASCII
    header (W<width> H<height> F<num>:<den> C<colorspace>), then
    ``FRAME``-delimited raw planar payloads — parseable with zero
    dependencies, so the video plumbing has a real-bytes path in
    wheel-less environments.  The digest covers the frame's raw plane
    bytes exactly as stored (y4m carries no stride padding)."""
    import hashlib

    nl = blob.index(b"\n")
    params = blob[:nl].split(b" ")
    if params[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    num, den = 25, 1
    cs = b"420"
    for p in params[1:]:
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"F":
            num, den = (int(x) for x in p[1:].split(b":"))
        elif p[:1] == b"C":
            cs = p[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if cs.startswith(b"420"):
        frame_size = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cs.startswith(b"422"):
        frame_size = w * h + 2 * ((w + 1) // 2) * h
    elif cs.startswith(b"444"):
        frame_size = 3 * w * h
    elif cs.startswith(b"mono"):
        frame_size = w * h
    else:
        raise ValueError(f"unsupported y4m colorspace {cs!r}")
    pos = nl + 1
    idx = 0
    while pos < len(blob):
        if blob[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        fnl = blob.index(b"\n", pos)
        payload = blob[fnl + 1 : fnl + 1 + frame_size]
        if len(payload) < frame_size:
            raise ValueError("truncated y4m frame")
        if idx % stride == 0:
            yield (
                idx,
                idx * 1000 * den // num,
                hashlib.md5(payload).hexdigest(),
            )
        pos = fnl + 1 + frame_size
        idx += 1


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
        # stdlib tier: real demux/decode for YUV4MPEG2 containers (see
        # _y4m_frames); PyAV, when importable, still takes precedence
        # and covers every compressed container/codec
        if blob[:10] == b"YUV4MPEG2 ":
            yield from _y4m_frames(blob, stride)
            return
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
