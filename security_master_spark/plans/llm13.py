"""Round-6 LLM-pipeline batch (SURVEY.md §2.12): SimHash-prefix dedup
retention curve — what fraction of the corpus survives near-dup
collapse at increasing fingerprint-prefix granularities. The
"how aggressive is my dedup" dial every corpus build tunes before
committing to a threshold.

Registered as a round-7 rotation candidate (plans/registry.py); until
its driver row lands, the local oracle mirror proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import fan_out, load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.operators.dedup import (
    simhash_fp_ctes,
    simhash_md5_agg,
)
from security_master_spark.plans.registry import register

#: prefix widths to evaluate — coarse (8 bits = 256 buckets) through
#: fine (24 bits); wider prefixes collapse only closer near-dups.
_PREFIX_BITS = (8, 16, 24)


@register(
    "l60_simhash_dedup_retention",
    oracle=f"""
    WITH {simhash_fp_ctes()}, pre AS (
        SELECT p.bits, f.doc_id, (f.simhash >> (64 - p.bits)) AS prefix
        FROM fp f, (VALUES {", ".join(f"({b})" for b in _PREFIX_BITS)})
             AS p(bits)
    )
    SELECT bits AS prefix_bits,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT prefix) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - COUNT(DISTINCT prefix) AS BIGINT) AS n_collapsed,
           {sql_dround(
               "COUNT(DISTINCT prefix) / CAST(COUNT(*) AS DOUBLE)", 6
           )} AS retention
    FROM pre
    GROUP BY bits
    """,
)
def l60_simhash_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-retention curve over SimHash prefixes: documents sharing
    the top-b fingerprint bits collapse to one representative; report
    kept/collapsed counts and the retention ratio for b ∈ {8, 16, 24}.
    Prefix bucketing IS the scale path for simhash dedup (an equi-key
    groupBy — never a pairwise Hamming join), so this panel measures
    exactly what the production collapse would do at each
    aggressiveness setting.

    Shape: ONE fingerprint pass (the l8 md5-plane aggregate, shuffle =
    (doc, 64 ints)), then a 3-way prefix explode over the tiny
    (doc, simhash) frame and one count-distinct rollup per width —
    O(docs · |widths|) rows into the final exchange. Arithmetic
    shift-right is identical in Spark and DuckDB (both sign-extend),
    which the oracle hash certifies across every fingerprint sign."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sh = simhash_md5_agg(docs)
    pre = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(b) for b in _PREFIX_BITS])
        ).alias("bits"),
    ).select(
        "bits",
        F.expr("shiftright(simhash, 64 - bits)").alias("prefix"),
    )
    return pre.groupBy("bits").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("prefix").cast("bigint").alias("n_kept"),
        (F.count("*") - F.countDistinct("prefix"))
        .cast("bigint")
        .alias("n_collapsed"),
        dround(
            F.countDistinct("prefix") / F.count("*").cast("double"), 6
        ).alias("retention"),
    ).withColumnRenamed("bits", "prefix_bits")
