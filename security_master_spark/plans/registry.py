"""Central registry mapping query names → (Spark callable, oracle SQL).

Contract (driver, ``__spark_entry__.py``): each callable takes
``(spark, sf_dir)`` and returns a lazy DataFrame; the driver collects
it at sf=0.01 and hash-compares against the oracle SQL run by DuckDB
on the same parquet (row-count + schema + order-insensitive
value-hash). Column names must match between both sides — alias
everything, both in the DataFrame code and the SQL.

Queries registered with ``oracle=None`` get the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def _load_all_plan_modules() -> None:
    # Import for registration side effects. ORDER MATTERS: the driver's
    # correctness harness checks at most ~50 entries per round in
    # registration order. Round-4 rotation: first the 20 queries that
    # have only local-mirror evidence (the round-3 additions that
    # registered past round 3's cap: d19-d28, l29-l34, a15-a16,
    # io8-io9), then the rows with the OLDEST driver evidence —
    # relational/windows (last proven round 1) and udfs/multimodal
    # (round 2) — for freshness. That head block is exactly 50
    # entries. Everything re-proven green in round 3 registers last.
    # tests/test_plans.py pins this order.
    from security_master_spark.plans import (  # noqa: F401
        domain4,
        llm4,
        sources_io3,
        domain5,
        llm5,
        domain6,
        llm6,
        aggregates2,
        sources_io4,
        relational,
        windows,
        udfs,
        multimodal,
        streaming_batch,
        domain2,
        llm2,
        sources_io2,
        domain3,
        llm3,
        aggregates,
        scalars,
        domain,
        llm,
        sources_io,
        # Round-5 candidates (added in round 4): registered past the
        # ~50-entry cap on purpose — they rotate to the head next round.
        # ROUND-5 ROTATION PLAN (do this FIRST next round): the
        # candidate block below now holds ~85 queries — MORE than the
        # cap — so rotate in two waves: round 5 heads with the FIRST
        # ~50 candidates in their current order (domain7 … aggregates5
        # families), round 6 with the remainder (llm11 … relational4,
        # i.e. everything from llm11 down) plus any round-5 reds.
        # Update tests/test_plans.py::_NEEDS_ROUND4_EVIDENCE to the
        # wave being rotated in each time.
        domain7,
        llm7,
        aggregates3,
        sources_io5,
        llm8,
        udfs2,
        sources_io6,
        scalars2,
        domain8,
        llm9,
        aggregates4,
        relational2,
        graph,
        dataquality,
        domain9,
        llm10,
        relational3,
        udfs3,
        sources_io7,
        aggregates5,
        llm11,
        udfs4,
        domain10,
        domain11,
        llm12,
        graph2,
        aggregates6,
        streaming_batch2,
        dataquality2,
        udfs5,
        windows2,
        sources_io8,
        scalars3,
        dataquality3,
        relational4,
        domain12,
    )


def queries() -> dict[str, QueryFn]:
    _load_all_plan_modules()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all_plan_modules()
    return dict(_ORACLES)
