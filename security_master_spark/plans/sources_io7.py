"""Round-5 source/sink candidates, batch 3 (SURVEY.md §2.1): XML
round-trip — Spark 4 ships the (formerly spark-xml) XML data source
natively, and enterprise feeds (ISO 20022, FIXML, vendor security
masters) still arrive as XML.

Registered past the driver's ~50-entry correctness cap on purpose
(see plans/registry.py) — driver rows come in round 5; until then the
local oracle mirror (tests/test_correctness.py) proves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register
from security_master_spark.plans.io_scratch import _scratch

_SUPPLIER_SCHEMA = (
    "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
)


@register(
    "io13_xml_roundtrip",
    oracle=f"""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           {sql_dround("SUM(s_acctbal)", 4)} AS acctbal_total,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def io13_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → XML (rowTag records) → read back with a DECLARED
    schema → per-nation rollup. Schema declaration matters twice at
    scale: it skips the inference pre-pass (a full extra read of the
    dataset), and it pins types against XML's stringly nature (an
    acctbal of "911.0" must come back double, not string). The oracle
    runs on the ORIGINAL parquet, so longs, ints, doubles and strings
    are value-certified through the serialize/parse cycle. XML files
    split per-record at rowTag boundaries, so a large feed still
    parallelizes across tasks."""
    path = _scratch(sf_dir, "supplier_xml")
    (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "supplier")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(_SUPPLIER_SCHEMA)
        .load(path)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        dround(F.sum("s_acctbal"), 4).alias("acctbal_total"),
        F.min("s_name").alias("first_name"),
    )
