"""Mirror of the driver's correctness gate over every registered query.

Parametrized over the registry: each query with an oracle is compared
exactly (canonicalized) against DuckDB at sf0.001; oracle-less queries
get the weaker rows-materialize check, same as the driver.
"""

from __future__ import annotations

import pytest

from security_master_spark.plans import registry
from tests.oracle import compare

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_vs_oracle(spark, sf_dir, name):
    fn = _QUERIES[name]
    sql = _ORACLES.get(name)
    if sql is None:
        df = fn(spark, sf_dir)
        rows = df.collect()
        assert rows is not None  # rows-only check: materializes w/o error
    else:
        compare(spark, fn, sql, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    assert set(_ORACLES) <= set(_QUERIES)
