"""Source/sink roundtrip queries (SURVEY.md §2.1).

Each query writes a fixture table out through a format and reads it
back before computing, so the DuckDB oracle (running on the original
parquet) certifies end-to-end format fidelity: types, timestamps,
doubles, nulls. The write happens when the query function is called
(eager side effect under /tmp); the returned DataFrame lazily scans
the written files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register
from security_master_spark.sources.io import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet_partitioned,
)

_IO_ROOT = "/tmp/sms_io"


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"{_IO_ROOT}/{tag}/{name}"


_CUSTOMER_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


@register(
    "io1_csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def io1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV → read back, full rows. Doubles survive because
    Spark writes shortest-roundtrip representations; the declared read
    schema restores exact types (no inference pass)."""
    path = _scratch(sf_dir, "customer_csv")
    write_csv(load_table(spark, sf_dir, "customer"), path)
    return read_csv(spark, path, _CUSTOMER_SCHEMA).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


@register(
    "io2_json_roundtrip",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dround("SUM(o_totalprice)", 4)} AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def io2_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → JSON lines → read back → monthly revenue rollup. The
    aggregate runs on re-parsed rows, so timestamp serialization
    (ISO-8601, UTC) is value-checked through the whole write/read
    cycle."""
    path = _scratch(sf_dir, "orders_json")
    write_json(load_table(spark, sf_dir, "orders"), path)
    back = read_json(spark, path, _ORDERS_SCHEMA)
    return (
        back.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            dround(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


@register(
    "io3_parquet_sink_partitioned",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dround("SUM(l_quantity)", 4)} AS sum_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2
    """,
)
def io3_parquet_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → parquet partitioned by l_returnflag → read back with a
    partition filter. The filter prunes to one directory at planning
    time (the sink layout IS the index); the oracle aggregates the
    original unpartitioned file."""
    path = _scratch(sf_dir, "lineitem_part")
    write_parquet_partitioned(
        load_table(spark, sf_dir, "lineitem"), path, ["l_returnflag"]
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dround(F.sum("l_quantity"), 4).alias("sum_qty"),
    )
