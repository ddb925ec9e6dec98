"""Round-5 source/sink batch 8 (SURVEY.md §2.1): the plain-text
source/sink — the one native Spark file format the io family hadn't
covered (CSV io1, JSON io2, parquet io3, ORC io9, gzip-CSV io10, XML
io13, binary-metadata io14).

Text is how raw LLM pretraining dumps actually arrive (one document
per line, no schema), so the roundtrip is certified through the same
write→read→values gate as the structured formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.plans.io_scratch import _scratch
from security_master_spark.plans.registry import register


@register(
    "io17_text_roundtrip",
    oracle="""
    SELECT doc_id, lang, text FROM documents
    """,
)
def io17_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → line-oriented text files (`doc_id\\tlang\\ttext`,
    the one-doc-per-line dump format of web-crawl deliveries) → read
    back with ``spark.read.text`` → split the leading metadata fields
    off the payload. The split uses two bounded SUBSTRING_INDEX-style
    expressions, not a 3-way split, so payload text containing the
    delimiter would survive (fixtures are space-tokenized, but the
    recipe must not depend on that). Value-certified against the
    original table — serialization, line framing, and field splitting
    all inside the hash gate.

    Scale: text read is splittable by line (HDFS-style input splits),
    the parse is two JVM string expressions in the scan projection,
    and nothing shuffles. This is the entry plan of every real
    pretraining ingest.

    Line framing vs payload newlines: a raw embedded newline would
    split one document across two lines (the adversarial fixture has
    one — the read-back then mis-frames and the id cast explodes), so
    the writer applies the standard crawl-dump escape — backslash
    first (``\\`` → ``\\\\``), then newline/CR (→ ``\\n`` / ``\\r``)
    — and the reader reverses it exactly (odd-backslash-parity
    match, so an escaped backslash followed by a literal ``n``
    survives). Lossless for every payload."""
    docs = load_table(spark, sf_dir, "documents")
    path = _scratch(sf_dir, "documents_text")
    esc = F.regexp_replace(F.col("text"), r"\\", r"\\\\")
    esc = F.regexp_replace(esc, "\n", r"\\n")
    esc = F.regexp_replace(esc, "\r", r"\\r")
    (
        docs.select(
            F.concat_ws("\t", F.col("doc_id").cast("string"), "lang", esc)
            .alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    lines = spark.read.text(path)
    doc_id = F.substring_index("value", "\t", 1).cast("bigint")
    lang = F.substring_index(F.substring_index("value", "\t", 2), "\t", -1)
    # Everything after the second tab — length arithmetic, immune to
    # further delimiters inside the payload.
    head_len = (
        F.length(F.substring_index("value", "\t", 2)) + F.lit(2)
    )
    text = F.col("value").substr(head_len, F.length("value"))
    # unescape: \n / \r preceded by an EVEN number of backslashes is a
    # framing escape; the captured pairs are kept (they unescape next)
    un = F.regexp_replace(text, r"(?<!\\)((\\\\)*)\\n", "$1\n")
    un = F.regexp_replace(un, r"(?<!\\)((\\\\)*)\\r", "$1\r")
    un = F.regexp_replace(un, r"\\\\", r"\\")
    return lines.select(
        doc_id.alias("doc_id"), lang.alias("lang"), un.alias("text")
    )
