"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB against
the same parquet fixtures, then compares row count, column names, and
order-insensitive values. Stricter locally than the driver (exact
value comparison after canonicalization) so driver failures are caught
before they cost a round.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from security_master_spark.datasets import TABLES

#: floats compared after rounding to this many significant decimals —
#: queries are expected to pre-round aggregates themselves; this guard
#: only absorbs last-bit noise.
FLOAT_DP = 9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        r = round(v, FLOAT_DP)
        return ("f", 0.0 if r == 0 else r)  # -0.0 → 0.0
    if isinstance(v, int):
        # type-tagged: int vs float outputs must not silently compare
        # equal — engines returning 1 vs 1.0 is a real schema mismatch.
        return ("i", v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):  # date
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _rowset(cols, rows):
    """Order-insensitive canonical form: sort cols by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(canon, key=repr)


def compare(spark, query_fn, sql: str, sf_dir: str) -> None:
    """Assert the Spark query and DuckDB oracle agree. Raises on mismatch."""
    sdf = query_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    con = duckdb_connection(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = _rowset(spark_cols, spark_rows)
    b = _rowset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"value mismatch ({len([1 for x, y in zip(a, b) if x != y])} rows differ); "
            f"first diffs (spark vs duck): {diffs}"
        )
