"""Round-5 SQL-surface candidates, batch 2 (SURVEY.md §2.9): SQL pipe
syntax (`|>`, new in Spark 4) and parameterized SQL (named-argument
binding) — the two query-authoring surfaces a platform exposes to
analysts and to applications respectively.

Registered past the driver's ~50-entry correctness cap on purpose
(see plans/registry.py) — driver rows come in round 5; until then the
local oracle mirror (tests/test_correctness.py) proves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from security_master_spark.datasets import load_tables
from security_master_spark.functions.rounding import sql_dround
from security_master_spark.plans.registry import register


@register(
    "q17_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dround("SUM(l_extendedprice * (1 - l_discount))", 4)}
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q17_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operator chaining — the
    FROM-first dataflow dialect): filter, aggregate, and project as
    sequential pipe stages. Catalyst parses pipes into the SAME
    logical plan as the classic SELECT (the oracle is that classic
    spelling), so this certifies the surface compiles to the
    identical scan-filter-aggregate plan: filter pushed to the scan,
    partial aggregation map-side — the pipe dialect costs nothing."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
    FROM lineitem
    |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                 {sql_dround("SUM(l_extendedprice * (1 - l_discount))", 4)}
                     AS revenue
       GROUP BY l_returnflag, l_linestatus
    |> SELECT l_returnflag, l_linestatus, n_items, revenue
    """)


@register(
    "q18_parameterized_sql",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dround("AVG(o_totalprice)", 4)} AS avg_price
    FROM orders
    WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q18_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named-argument binding (`:name` +
    `args=` — the injection-safe application-query surface, Spark
    3.4+). Parameters bind as LITERALS in the parse tree, not string
    splices, so constant folding and scan-level predicate pushdown see
    the bound values exactly as if they were inlined — the pushed
    filter on o_totalprice appears in the scan's PushedFilters the
    same as q4's hardcoded one."""
    load_tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dround("AVG(o_totalprice)", 4)} AS avg_price
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 150000, "status": "F"},
    )
