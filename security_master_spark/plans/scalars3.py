"""Round-5 scalar batch 3 (SURVEY.md §2.8): URL functions —
`parse_url` component extraction and the `url_encode`/`url_decode`
roundtrip, the string family every web-corpus pipeline leans on
(domain caps, per-host dedup, crawl accounting).

Oracle discipline: the URLs are constructed IN the query from fixture
columns, so DuckDB never needs a URL parser — it derives each
component independently from the same source columns. A hash match
therefore certifies Spark's parser against ground truth, not against
another parser's quirks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.plans.registry import register


@register(
    "s20_url_functions",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
           'q=' || CAST(n_chars AS VARCHAR) AS query,
           CAST(n_chars AS VARCHAR) AS q_param,
           lang AS roundtrip_lang
    FROM documents
    """,
)
def s20_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar functions: build a URL from fixture columns, then
    recover host / path / full query / a single query parameter with
    ``parse_url``, plus a ``url_decode(url_encode(x))`` identity. The
    oracle reconstructs every component straight from the source
    columns — ground truth, not a second parser — so the hash match
    certifies Spark's extraction exactly. All JVM expressions in the
    scan projection; zero shuffles (the per-host groupBys these feed
    are l41/l57-shaped rollups)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("n_chars").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.url_decode(F.url_encode("lang")).alias("roundtrip_lang"),
    )


@register(
    "s21_data_protection",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS masked_name,
           c_name AS decrypted_name
    FROM customer
    """,
)
def s21_data_protection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data protection: ``mask`` (upper→X, lower→x,
    digit→n — the redacted-display form PII policies mandate) and an
    ``aes_decrypt(aes_encrypt(x, k), k)`` roundtrip (AES-GCM, the
    at-rest column-encryption primitive). The mask oracle derives the
    same redaction from three regexp passes — ground truth per the
    documented character classes; the encryption oracle is the
    identity (GCM ciphertext is IV-randomized, so only the roundtrip
    is deterministic — which is also the only part with portable
    semantics). Both are JVM expressions in the scan projection; the
    AES pair stays inside whole-stage codegen, so "encrypted at rest,
    decrypted in the projection" costs no extra pass."""
    cust = load_table(spark, sf_dir, "customer")
    key = F.lit("0123456789abcdef")
    return cust.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.aes_decrypt(F.aes_encrypt(F.col("c_name"), key), key)
        .cast("string")
        .alias("decrypted_name"),
    )


@register(
    "s22_outer_explode",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars >= 250 THEN NULL ELSE 'short' END AS tag
    FROM documents
    """,
)
def s22_outer_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: the empty-collection-preserving explode.
    Documents get a tag array that is EMPTY for long docs ('short'
    only below the length cutoff); a plain ``explode`` silently drops
    every long doc from the output — the classic row-loss bug in
    tag/entity pipelines — while ``explode_outer`` keeps them with a
    NULL element. The oracle derives the expected (doc, tag-or-NULL)
    rows closed-form, so the hash certifies exactly the preserved
    rows. Pure projection + generator in one codegen stage, no
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tags = F.when(
        F.col("n_chars") < 250, F.array(F.lit("short"))
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", F.explode_outer(tags).alias("tag")
    )


@register(
    "s23_map_higher_order",
    oracle="""
    SELECT doc_id,
           'LANG=' || lang AS lang_entry,
           n_chars * 2 AS doubled_chars,
           CAST(LENGTH(text) >= 250 AS BIGINT) AS n_long_flags
    FROM documents
    """,
)
def s23_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — ``transform_keys``,
    ``transform_values``, ``map_filter`` — exercised on a map built
    from fixture columns and read back out to scalars so DuckDB can
    derive every output closed-form from the SOURCE columns (ground
    truth; DuckDB's map surface differs too much to mirror the calls
    themselves). transform_keys upcases the key ('LANG=' prefix),
    transform_values doubles the metric, map_filter keeps only
    entries whose value clears the length cutoff (count of survivors
    returned). All three stay JVM-side generator-free expressions in
    one projection."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"))
    metrics = F.create_map(F.lit("chars"), F.col("n_chars"))
    lens = F.create_map(F.lit("len"), F.length("text").cast("bigint"))
    return docs.select(
        "doc_id",
        F.element_at(
            F.transform_keys(m, lambda k, _v: F.concat(F.upper(k), F.lit("="))),
            "LANG=",
        ).alias("lang_entry_raw"),
        F.element_at(
            F.transform_values(metrics, lambda _k, v: v * 2), "chars"
        ).alias("doubled_chars"),
        F.size(
            F.map_filter(lens, lambda _k, v: v >= 250)
        ).cast("bigint").alias("n_long_flags"),
    ).select(
        "doc_id",
        F.concat(F.lit("LANG="), F.col("lang_entry_raw")).alias("lang_entry"),
        "doubled_chars",
        "n_long_flags",
    )
