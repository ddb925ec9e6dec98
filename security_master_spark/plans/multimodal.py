"""Multimodal-column queries (SURVEY.md §2.12): binary payloads with
typed metadata, feature extraction and frame sampling via
Arrow-batched mapInPandas (multimodal/binary.py).

The payloads are deterministic (UTF-8 bytes of the document text), so
the byte-level pipeline is fully oracle-checked: DuckDB recomputes the
same features with ENCODE/HEX/OCTET_LENGTH — every byte the Python
side touches is certified, not just row counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.multimodal.binary import (
    attach_payload,
    extract_features,
    sample_frames,
)
from security_master_spark.plans.registry import register


@register(
    "m1_multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'image/jpeg'
                ELSE 'video/mp4' END          AS mime,
           OCTET_LENGTH(ENCODE(text))         AS n_bytes,
           LOWER(SUBSTRING(HEX(ENCODE(text)), 1, 8)) AS header_hex,
           CAST(doc_id % 640 + 16 AS INT)     AS width,
           CAST(doc_id % 480 + 16 AS INT)     AS height
    FROM documents
    """,
)
def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload + metadata → mapInPandas feature
    extraction (size, 4-byte header magic, metadata passthrough)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


@register(
    "m2_frame_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               LOWER(HEX(ENCODE(text))) AS h,
               CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 32.0) AS BIGINT) AS n_frames
        FROM documents
        WHERE doc_id < 200
    )
    SELECT f.doc_id,
           t.i AS frame_idx,
           SUBSTRING(f.h, CAST(t.i * 64 + 1 AS INT), 64) AS frame_hex,
           f.n_frames
    FROM f, UNNEST(generate_series(0, f.n_frames - 1, 3)) AS t(i)
    """,
)
def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-video frame sampling: payload sliced into 32-byte frames,
    every 3rd frame emitted (1 row → N rows through mapInPandas). The
    oracle re-derives each sampled frame's bytes from the hex dump."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return sample_frames(attach_payload(docs), stride=3)


@register(
    "m3_embedding_batch_score",
    oracle=f"""
    SELECT vec_id, label,
           {sql_dround(
               "SQRT(list_sum(list_transform(embedding,"
               " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))", 6)}
               AS l2_norm
    FROM embeddings
    """,
)
def m3_embedding_batch_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-scored column stand-in: a pandas UDF consuming the
    ``array<float>`` embedding column as numpy batches (the exact
    calling convention of a real encoder/scorer; here the 'model' is an
    L2 norm so DuckDB can certify the values)."""

    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(
            lambda v: float(np.sqrt((np.asarray(v, dtype="float64") ** 2).sum()))
        )

    norm_udf = pandas_udf(l2_norm, "double")
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", dround(norm_udf("embedding"), 6).alias("l2_norm")
    )


@register(
    "m4_modality_accounting",
    oracle=f"""
    WITH feat AS (
        SELECT CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'image/jpeg'
                    ELSE 'video/mp4' END AS mime,
               CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) AS n_bytes,
               CAST(doc_id % 640 + 16 AS INT) * CAST(doc_id % 480 + 16 AS INT)
                   AS pixels
        FROM documents
    )
    SELECT mime,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           {sql_dround("AVG(n_bytes)", 4)} AS avg_bytes,
           {sql_dround("QUANTILE_CONT(n_bytes, 0.95)", 4)} AS p95_bytes,
           {sql_dround("AVG(CAST(pixels AS DOUBLE))", 4)} AS avg_pixels
    FROM feat
    GROUP BY mime
    """,
)
def m4_modality_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality accounting: per-MIME asset counts, byte totals/
    averages/p95 and average pixel area — the storage-and-compute
    budgeting panel a multimodal corpus pipeline runs before any
    decode pass is scheduled (p95 bytes sizes the Arrow batch budget;
    pixel area sizes the resize stage). Pure rollup of m1's
    byte-certified feature stream: the mapInPandas extraction runs
    once, the shuffle carries O(mime types) keys, and the exact p95
    uses the a10-proven percentile pairing."""
    docs = load_table(spark, sf_dir, "documents")
    feat = extract_features(attach_payload(docs))
    return feat.groupBy("mime").agg(
        F.count("*").cast("bigint").alias("n_assets"),
        F.sum(F.col("n_bytes").cast("double")).cast("bigint").alias(
            "total_bytes"
        ),
        dround(F.avg(F.col("n_bytes").cast("double")), 4).alias("avg_bytes"),
        dround(
            F.percentile(F.col("n_bytes").cast("double"), 0.95), 4
        ).alias("p95_bytes"),
        dround(
            F.avg((F.col("width") * F.col("height")).cast("double")), 4
        ).alias("avg_pixels"),
    )
