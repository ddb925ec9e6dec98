"""Round-5 aggregation candidates, batch 5 (SURVEY.md §2.4): ordered
string aggregation (LISTAGG ... WITHIN GROUP — standardized in
SQL:2016, lands in Spark 4) — the report-friendly "collapse a group
to one delimited cell" aggregate.

Registered past the driver's ~50-entry correctness cap on purpose
(see plans/registry.py) — driver rows come in round 5; until then the
local oracle mirror (tests/test_correctness.py) proves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_tables
from security_master_spark.functions.rounding import sql_dround
from security_master_spark.plans.registry import register


@register(
    "a22_listagg",
    oracle=f"""
    WITH cell AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority,
           STRING_AGG(o_orderstatus || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY o_orderstatus) AS status_profile,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM cell
    GROUP BY o_orderpriority
    """,
)
def a22_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (ORDER BY ...) — each order priority
    collapsed to a 'status:count' profile string in deterministic
    status order (DuckDB spells it STRING_AGG ... ORDER BY; same
    SQL:2016 semantics). The string aggregation runs on the ALREADY
    COLLAPSED (priority, status) cell table — never listagg over raw
    fact rows: an unbounded-group string concat is an OOM at scale
    (a9's collect_list discipline), while the cell table is bounded
    by the category product. The WITHIN GROUP ordering makes the
    result order-insensitive to partition layout — without it,
    listagg output is nondeterministic under parallelism."""
    load_tables(spark, sf_dir)
    return spark.sql("""
    WITH cell AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority,
           LISTAGG(o_orderstatus || ':' || CAST(n AS STRING), ',')
               WITHIN GROUP (ORDER BY o_orderstatus) AS status_profile,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM cell
    GROUP BY o_orderpriority
    """)


@register(
    "a23_rolling_distinct",
    oracle="""
    SELECT event_type, event_id,
           CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_users
    FROM events
    """,
)
def a23_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT cardinality: unique users over each type's
    trailing 100 events — the sliding-uniques panel (active-user
    windows, velocity checks) that plain rolling counts can't answer.
    Spark has no COUNT(DISTINCT) OVER, so the spelling is
    size(collect_set() OVER) — same frame, same semantics, certified
    against DuckDB's native distinct-window. Deterministic (ts,
    event_id) frame ordering on both engines. Scale note: per-row set
    state is bounded by the frame length (100), so memory is
    O(frame), not O(partition); for unbounded or very long frames the
    scale path is a8's HLL sketches merged per window — this is the
    exact form."""
    from pyspark.sql import Window

    from security_master_spark.datasets import load_table

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-99, 0)
    )
    return events.select(
        "event_type",
        "event_id",
        F.size(F.collect_set("user_id").over(w))
        .cast("bigint")
        .alias("rolling_users"),
    )
