"""Multimodal columns (SURVEY.md §2.12): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs (``mapInPandas``).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises ``NotImplementedError``
unless Pillow is importable); everything around it — schema, payload
construction, batch iteration, frame sampling, feature extraction —
is real Spark plumbing and is oracle-tested byte-for-byte.

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


def decode_image(blob: bytes):  # pragma: no cover - stub by design
    """STUB: decode image bytes → pixel array. Real codecs are not in
    this container; gate on Pillow and fail loudly otherwise."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed here; "
            "the surrounding Spark plumbing (schema/batching/features) is "
            "real and tested — plug a decoder in at this seam"
        ) from exc
    return Image.open(io.BytesIO(blob))


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
