"""Corpus-scale robustness: every registered query must survive
ALL-EMPTY input tables (schemas intact, zero rows). At 100 TB, empty
partitions, empty date ranges, and freshly-created datasets are
routine — an operator that crashes on them takes the whole job down.

Plus a harness-sensitivity canary: the oracle comparison must FAIL
when a query is genuinely wrong, or every green above it means
nothing.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from security_master_spark.datasets import TABLES
from security_master_spark.plans import registry

_QUERIES = registry.queries()


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """All ten fixture tables with their real schemas and ZERO rows."""
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            pa.table(
                {f.name: pa.array([], f.type) for f in schema}, schema=schema
            ),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    # Materializing must not raise; row count is query-specific (io
    # roundtrips and generators may legitimately emit rows from
    # non-table inputs), so only the no-crash contract is asserted.
    n = _QUERIES[name](spark, empty_sf_dir).count()
    assert n >= 0


def test_oracle_compare_has_teeth(spark, sf_dir):
    """Canary: feed the mirror a deliberately wrong query (q1 with a
    perturbed aggregate) against the REAL q1 oracle — compare() must
    fail. If this test ever passes silently, the whole correctness
    gate is decorative."""
    from pyspark.sql import functions as F

    from tests.oracle import compare

    sql = registry.oracle_sql()["q1_pricing_summary"]

    def wrong_q1(spark_, sf):
        df = _QUERIES["q1_pricing_summary"](spark_, sf)
        # same schema, same row count, one value column off by 1
        return df.withColumn("sum_qty", F.col("sum_qty") + 1)

    with pytest.raises(AssertionError):
        compare(spark, wrong_q1, sql, sf_dir)
