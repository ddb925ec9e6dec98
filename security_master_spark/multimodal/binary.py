"""Multimodal columns (SURVEY.md §2.12): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs (``mapInPandas``).

``decode_image`` and ``decode_wav`` are REAL pure-Python codecs for
the uncompressed container formats (24-bit BMP / binary P6 PPM;
RIFF/WAVE 16-bit PCM) — no external library needed. The documented
codec seam is only for COMPRESSED formats (JPEG/PNG/FLAC/...), where
decode falls through to Pillow if importable and raises ``ValueError``
otherwise; schema, payload construction, batch iteration, frame
sampling, and feature extraction are all real Spark plumbing and
oracle-tested byte-for-byte.

Scale notes: payload bytes ride the columnar scan like any other
column (parquet stores them contiguously; column pruning means queries
that don't touch the blob never read it). Feature extraction streams
Arrow batches through Python with bounded memory
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch height —
lower it for fat blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from security_master_spark.datasets import fan_out

#: fixed fake-frame width for the video-sampling demo (bytes per frame)
FRAME_BYTES = 32

#: feature schema produced by extract_features
FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, header_hex string, width int, height int"
)

#: frame-sample schema produced by sample_frames
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_hex string, n_frames long"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct to each
    document — the multimodal-row shape. The payload is the UTF-8 bytes
    of the text (a deterministic stand-in for real image bytes); the
    metadata mirrors what an ingest pipeline records at landing time."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("image/jpeg"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
    )
    return docs.withColumn("payload", payload).withColumn("media_meta", meta)


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, BI_RGB, bottom-up, 4-byte-padded rows) —
    pure Python/numpy, no codec dependency. The inverse of
    :func:`decode_image`'s BMP branch."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w = px.shape[:2]
    row_size = (3 * w + 3) // 4 * 4
    body = bytearray()
    pad = b"\x00" * (row_size - 3 * w)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        body += px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_image(blob: bytes):
    """Decode image bytes → (h, w, 3) uint8 RGB numpy array.

    Pure-Python decoders for the two uncompressed interchange formats
    (no codec dependency in this container):

    - **BMP**: 24-bit BI_RGB, BITMAPINFOHEADER, positive (bottom-up)
      or negative (top-down) height, 4-byte-padded BGR rows.
    - **PPM (P6)**: binary RGB, maxval 255, whitespace/comment-tolerant
      header.

    Compressed formats (PNG/JPEG) fall through to Pillow when it is
    importable and raise ``ValueError`` otherwise — the documented
    seam for plugging a real codec library in production."""
    import struct

    import numpy as np

    b = bytes(blob)
    if b[:2] == b"BM":
        if len(b) < 54:
            raise ValueError("truncated BMP header")
        data_offset = struct.unpack_from("<I", b, 10)[0]
        hdr_size, w, h_raw = struct.unpack_from("<Iii", b, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
        if hdr_size < 40 or bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported BMP variant (header={hdr_size}, bpp={bpp}, "
                f"compression={compression}); only 24-bit BI_RGB handled"
            )
        h = abs(h_raw)
        row_size = (3 * w + 3) // 4 * 4
        if len(b) < data_offset + row_size * h:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_size * h, offset=data_offset
        ).reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR -> RGB
        if h_raw > 0:
            rgb = rgb[::-1]  # bottom-up -> top-down
        return np.ascontiguousarray(rgb)
    if b[:2] == b"P6":
        # header: magic, width, height, maxval — ASCII tokens separated
        # by whitespace, '#' comments allowed, ONE whitespace byte after
        # maxval then raw RGB.
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if pos < len(b) and b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError("truncated PPM header")
            tokens.append(int(b[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = tokens
        if maxval != 255:
            raise ValueError(f"only maxval 255 PPM supported, got {maxval}")
        if len(b) < pos + 3 * w * h:
            raise ValueError("truncated PPM pixel data")
        return (
            np.frombuffer(b, dtype=np.uint8, count=3 * w * h, offset=pos)
            .reshape(h, w, 3)
            .copy()
        )
    try:  # pragma: no cover - exercised only where Pillow exists
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    except ImportError as exc:
        raise ValueError(
            f"unsupported image format (magic {b[:4]!r}); built-in "
            "decoders handle 24-bit BMP and P6 PPM — compressed formats "
            "need a codec library at this seam"
        ) from exc


#: schema of the encoded-image stage (doc_id + real BMP bytes)
IMAGE_SCHEMA = "doc_id long, img binary"

#: schema of the decoded pixel-stat stage
PIXEL_STAT_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long"
)


def render_test_card(doc_id: int, width: int, height: int):
    """Deterministic RGB test card: channel values are closed-form in
    (x, y, doc_id), so a SQL oracle can recompute every pixel without
    ever touching the codec — the decode path is then certified
    byte-for-byte by the driver hash, not by trusting the encoder."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    X, Y = np.meshgrid(x, y)  # (height, width)
    r = (3 * X + 7 * Y + doc_id) % 256
    g = (5 * X + 11 * Y + 2 * doc_id) % 256
    b = (X * Y + 3 * doc_id) % 256
    return np.stack([r, g, b], axis=2).astype("uint8")


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        imgs = [
            encode_bmp(render_test_card(int(d), int(w), int(h)))
            for d, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "img": imgs})


def _decode_stat_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in (
            "doc_id", "width", "height", "n_pixels",
            "sum_r", "sum_g", "sum_b",
        )}
        for doc_id, blob in zip(pdf["doc_id"], pdf["img"]):
            px = decode_image(blob)  # (h, w, 3) uint8
            h, w = px.shape[:2]
            sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_pixels"].append(h * w)
            rows["sum_r"].append(int(sums[0]))
            rows["sum_g"].append(int(sums[1]))
            rows["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(rows)


#: schema of the decoded tile-stat stage (ViT-style patch grid)
TILE_STAT_SCHEMA = (
    "doc_id long, tile_x int, tile_y int, n_px long, "
    "sum_r long, sum_g long, sum_b long"
)

#: patch edge length for image tiling (pixels)
TILE_PX = 4


def _decode_tile_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode each BMP and reduce it to a ViT-style TILE_PX×TILE_PX
    patch grid of per-channel sums. Edge tiles are PARTIAL (n_px <
    TILE_PX²) when width/height aren't multiples of the tile edge —
    emitted, not dropped, so the oracle certifies edge handling."""
    import numpy as np

    cols = ("doc_id", "tile_x", "tile_y", "n_px", "sum_r", "sum_g", "sum_b")
    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in cols}
        for doc_id, blob in zip(pdf["doc_id"], pdf["img"]):
            px = decode_image(blob).astype(np.int64)  # (h, w, 3)
            h, w = px.shape[:2]
            for ty in range((h + TILE_PX - 1) // TILE_PX):
                for tx in range((w + TILE_PX - 1) // TILE_PX):
                    t = px[
                        ty * TILE_PX : (ty + 1) * TILE_PX,
                        tx * TILE_PX : (tx + 1) * TILE_PX,
                        :,
                    ]
                    rows["doc_id"].append(doc_id)
                    rows["tile_x"].append(tx)
                    rows["tile_y"].append(ty)
                    rows["n_px"].append(t.shape[0] * t.shape[1])
                    rows["sum_r"].append(int(t[:, :, 0].sum()))
                    rows["sum_g"].append(int(t[:, :, 1].sum()))
                    rows["sum_b"].append(int(t[:, :, 2].sum()))
        yield pd.DataFrame(rows)


def image_tile_stats(docs_with_dims: DataFrame) -> DataFrame:
    """Encode → decode → tile: the :func:`image_pixel_stats` pipeline
    with the reduce step swapped for the patch grid — the plumbing
    under every ViT-style preprocessing job (decode, grid-split,
    per-patch statistics), still two map-only Arrow stages with zero
    shuffles."""
    encoded = fan_out(
        docs_with_dims.select("doc_id", "width", "height")
    ).mapInPandas(_encode_batches, schema=IMAGE_SCHEMA)
    return encoded.mapInPandas(
        _decode_tile_batches, schema=TILE_STAT_SCHEMA
    )


def image_pixel_stats(docs_with_dims: DataFrame) -> DataFrame:
    """Two chained Arrow stages over (doc_id, width, height):
    mapInPandas ENCODE (render test card → real 24-bit BMP bytes in a
    binary column) → mapInPandas DECODE (parse the BMP back, reduce to
    per-channel pixel sums). The bytes genuinely cross the Arrow
    boundary between the stages; nothing shuffles — both stages are
    map-only, so at 100 TB this is one narrow pipeline per partition
    with memory bounded by arrow.maxRecordsPerBatch × image size."""
    encoded = fan_out(
        docs_with_dims.select("doc_id", "width", "height")
    ).mapInPandas(_encode_batches, schema=IMAGE_SCHEMA)
    return encoded.mapInPandas(_decode_stat_batches, schema=PIXEL_STAT_SCHEMA)


#: schema of the encoded-audio stage (doc_id + real WAV bytes)
AUDIO_SCHEMA = "doc_id long, wav binary"

#: schema of the decoded audio-stat stage
AUDIO_STAT_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, "
    "sum_amp long, sum_sq long, peak int"
)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode an int16 sample array as a canonical 44-byte-header
    RIFF/WAVE PCM file (mono, 16-bit, little-endian) — pure
    Python/numpy, the audio twin of :func:`encode_bmp`."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(blob: bytes):
    """Decode RIFF/WAVE PCM bytes → (samples int16 ndarray,
    sample_rate). Walks the chunk list (fmt may not be the first
    chunk in the wild), supports mono 16-bit PCM; anything else
    raises ``ValueError`` — the codec-library seam, like
    :func:`decode_image`."""
    import struct

    import numpy as np

    b = bytes(blob)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file (magic {b[:4]!r})")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        # A declared size past the end of the buffer would otherwise
        # silently clamp via slicing (fewer samples than the header
        # claims); malformed blobs must hit the documented ValueError
        # seam, not truncate quietly.
        if len(body) != size:
            raise ValueError(
                f"truncated {cid!r} chunk: header says {size} bytes, "
                f"only {len(body)} present"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} < 16 bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"only mono 16-bit PCM handled (format={audio_format}, "
            f"channels={channels}, bits={bits})"
        )
    return np.frombuffer(data, dtype="<i2"), sample_rate


def render_test_tone(doc_id: int, n_samples: int):
    """Deterministic int16 'waveform' closed-form in (i, doc_id) — the
    audio analogue of :func:`render_test_card`, SQL-recomputable so
    the decode path is oracle-certified sample-for-sample."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    return ((7 * i + 13 * doc_id) % 65536 - 32768).astype("<i2")


def _encode_wav_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        wavs = [
            encode_wav(render_test_tone(int(d), int(n)))
            for d, n in zip(pdf["doc_id"], pdf["n_samples"])
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": wavs})


def _decode_wav_stat_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in (
            "doc_id", "sample_rate", "n_samples",
            "sum_amp", "sum_sq", "peak",
        )}
        for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
            s, rate = decode_wav(blob)
            s64 = s.astype("int64")
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(s))
            rows["sum_amp"].append(int(s64.sum()))
            rows["sum_sq"].append(int((s64 * s64).sum()))
            rows["peak"].append(int(np.abs(s64).max()) if len(s) else 0)
        yield pd.DataFrame(rows)


#: schema of the decoded audio-frame stage (STFT-style frame grid)
FRAME_STAT_SCHEMA = (
    "doc_id long, frame_idx int, n_samp int, "
    "sum_amp long, sum_sq long, peak int"
)

#: frame length / hop (samples) — 50% overlap, the STFT default shape
FRAME_LEN = 256
FRAME_HOP = 128


def _decode_frame_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Decode each WAV and reduce it to overlapping FULL frames
    (length FRAME_LEN, hop FRAME_HOP) of exact integer stats — the
    framing every STFT/spectrogram/VAD pipeline starts with. Partial
    tail frames are dropped (full-frame semantics, like d77's full
    windows); each sample belongs to up to ⌈LEN/HOP⌉ frames."""
    import numpy as np

    cols = ("doc_id", "frame_idx", "n_samp", "sum_amp", "sum_sq", "peak")
    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in cols}
        for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
            s, _rate = decode_wav(blob)
            s64 = s.astype("int64")
            n = len(s64)
            n_frames = (
                (n - FRAME_LEN) // FRAME_HOP + 1 if n >= FRAME_LEN else 0
            )
            for f in range(n_frames):
                fr = s64[f * FRAME_HOP : f * FRAME_HOP + FRAME_LEN]
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(f)
                rows["n_samp"].append(FRAME_LEN)
                rows["sum_amp"].append(int(fr.sum()))
                rows["sum_sq"].append(int((fr * fr).sum()))
                rows["peak"].append(int(np.abs(fr).max()))
        yield pd.DataFrame(rows)


def audio_frame_stats(docs_with_len: DataFrame) -> DataFrame:
    """Encode → decode → frame: :func:`audio_sample_stats` with the
    reduce swapped for the overlapping frame grid — the audio twin of
    :func:`image_tile_stats`, still two map-only Arrow stages."""
    encoded = fan_out(
        docs_with_len.select("doc_id", "n_samples")
    ).mapInPandas(_encode_wav_batches, schema=AUDIO_SCHEMA)
    return encoded.mapInPandas(
        _decode_frame_batches, schema=FRAME_STAT_SCHEMA
    )


def audio_sample_stats(docs_with_len: DataFrame) -> DataFrame:
    """Two chained Arrow stages over (doc_id, n_samples): mapInPandas
    ENCODE (test tone → real RIFF/WAVE PCM bytes) → mapInPandas DECODE
    (chunk-walk the WAV back, reduce to exact integer sample stats).
    Same map-only, shuffle-free posture as :func:`image_pixel_stats`."""
    encoded = fan_out(
        docs_with_len.select("doc_id", "n_samples")
    ).mapInPandas(_encode_wav_batches, schema=AUDIO_SCHEMA)
    return encoded.mapInPandas(
        _decode_wav_stat_batches, schema=AUDIO_STAT_SCHEMA
    )


def _features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        # Unreadable media rows (null payload or metadata) are excluded
        # from feature extraction — standard ETL quarantine semantics;
        # crashing the whole job on one bad row is the alternative
        # (tests/test_robustness.py null-payload sweep).
        ok = pdf["payload"].notna() & pdf["media_meta"].notna()
        pdf = pdf[ok]
        if len(pdf) == 0:
            continue
        blobs = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                "n_bytes": blobs.map(len).astype("int64"),
                "header_hex": blobs.map(lambda b: bytes(b)[:4].hex()),
                "width": pdf["media_meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["media_meta"].map(lambda m: m["height"]).astype("int32"),
            }
        )


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Byte-level feature extraction over the payload column via
    mapInPandas (size, header magic, passthrough metadata). Where
    ``decode_image`` is the seam for real pixel features."""
    return fan_out(multimodal.select("doc_id", "payload", "media_meta")).mapInPandas(
        _features_batches, schema=FEATURE_SCHEMA
    )


def _frame_batches(stride: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_hex": [],
                "n_frames": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                if blob is None:  # unreadable media row: quarantine
                    continue
                b = bytes(blob)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, stride):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_hex"].append(
                        b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES].hex()
                    )
                    rows["n_frames"].append(n_frames)
            yield pd.DataFrame(rows)

    return gen


def sample_frames(multimodal: DataFrame, stride: int = 3) -> DataFrame:
    """Video frame sampling, stubbed deterministically: the payload is
    sliced into fixed-size fake 'frames' and every ``stride``-th frame
    is emitted (1 row in → ceil(n_frames/stride) rows out). With a real
    container format this is the same mapInPandas with a demuxer at the
    ``decode_image`` seam."""
    return fan_out(multimodal.select("doc_id", "payload")).mapInPandas(
        _frame_batches(stride), schema=FRAME_SCHEMA
    )
