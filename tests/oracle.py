"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB against
the same parquet fixtures, then compares row count, column names, and
order-insensitive values.

Round-2 hardening: both result sets are routed THROUGH PANDAS, exactly
like the driver's harness, before canonicalization. Round 1 proved the
fetchall() path hides two real failure classes the driver catches:

- dtype drift: DuckDB ``SUM(INT)`` returns HUGEINT, which pandas
  renders as float64 while Spark returns int64 — ``fetchall()`` yields
  plain Python ints on both sides and the drift vanishes locally but
  hash-mismatches at the driver (round-1 s8).
- array-typed cells: pandas sorting crashes on ndarray cells
  (``unhashable type``) — the driver's canonicalizer did exactly that
  on a9/s5/s15. The mirror now raises a targeted error telling the
  query author to serialize (concat_ws / to_json) on both sides.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

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


def _col_kind(series: pd.Series) -> str:
    """Canonical type kind for one result column, from the pandas dtype
    the driver would see. int vs float is the distinction that burned
    round 1 (HUGEINT→float64 vs int64): kinds must MATCH across engines."""
    k = series.dtype.kind
    if k in "iu":
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        # tz-aware (e.g. DuckDB TO_TIMESTAMP → TIMESTAMPTZ →
        # datetime64[us, Etc/UTC]) vs naive is a SCHEMA mismatch at the
        # driver (round-2 t1/t2 reds) — distinguish the kinds here too.
        return "tstz" if getattr(series.dtype, "tz", None) is not None else "ts"
    if k == "m":
        return "td"
    # object column: infer from the first non-null cell
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (np.ndarray, list, tuple)):
            raise AssertionError(
                f"array-typed cell in column {series.name!r}: the driver's "
                "pandas canonicalizer cannot hash ndarray cells — serialize "
                "the array on BOTH sides (concat_ws/to_json in Spark, "
                "array_to_string/to_json in DuckDB)"
            )
        if isinstance(v, (bool, np.bool_)):
            return "b"
        if isinstance(v, (int, np.integer)):
            return "i"
        if isinstance(v, (float, np.floating, Decimal)):
            return "f"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if hasattr(v, "isoformat"):
            return "ts"
        return "s"
    return "null"


def _date_norm(iso: str) -> str:
    """DATE columns arrive as ``datetime.date`` from Spark but as
    midnight datetime64 from DuckDB's ``.df()``; the driver accepts
    that pairing (round-1 s3/s14 passed), so midnight timestamps
    normalize to the bare date string."""
    return iso[:-9] if iso.endswith("T00:00:00") else iso


def _canon(v):
    """Canonicalize one pandas-sourced value for cross-engine comparison."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.ndarray, list, tuple)):
        raise AssertionError(
            "array-typed result cell — the driver's canonicalizer crashes on "
            "these; serialize with concat_ws/to_json on both sides"
        )
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (float, np.floating, Decimal)):
        # Decimal rides the float path so a Decimal-vs-double column
        # pairing gets the same rounding + -0.0 normalization.
        f = float(v)
        if math.isnan(f):
            # Distinct sentinel, NOT None: an engine emitting NaN where
            # the other emits NULL is real drift in object columns. (In
            # float64 columns pandas itself renders NULL as NaN on both
            # sides, so the sentinel stays consistent there.)
            return "NaN"
        r = round(f, FLOAT_DP)
        return 0.0 if r == 0 else r  # -0.0 → 0.0
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, pd.Timestamp):
        v = v.tz_localize(None) if v.tzinfo is not None else v
        return _date_norm(v.isoformat())
    if hasattr(v, "isoformat"):  # datetime / date
        if hasattr(v, "tzinfo") and v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        return _date_norm(v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _canon_frame(df: pd.DataFrame):
    """(kinds, sorted canonical rows) — column order normalized by name."""
    cols = sorted(df.columns)
    kinds = {c: _col_kind(df[c]) for c in cols}
    rows = [
        tuple(_canon(df[c].iloc[i]) for c in cols) for i in range(len(df))
    ]
    return kinds, sorted(rows, key=repr)


def compare(spark, query_fn, sql: str, sf_dir: str) -> None:
    """Assert the Spark query and DuckDB oracle agree. Raises on mismatch."""
    sdf = query_fn(spark, sf_dir)
    spark_pd = sdf.toPandas()

    con = duckdb_connection(sf_dir)
    duck_pd = con.execute(sql).df()
    con.close()

    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"column mismatch: spark={sorted(spark_pd.columns)} "
        f"duck={sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"row count mismatch: spark={len(spark_pd)} duck={len(duck_pd)}"
    )
    s_kinds, s_rows = _canon_frame(spark_pd)
    d_kinds, d_rows = _canon_frame(duck_pd)
    kind_diffs = {
        c: (s_kinds[c], d_kinds[c])
        for c in s_kinds
        if s_kinds[c] != d_kinds[c]
        and "null" not in (s_kinds[c], d_kinds[c])
    }
    assert not kind_diffs, (
        f"dtype-kind drift (spark vs duck) — this hash-mismatches at the "
        f"driver even when values are equal: {kind_diffs}"
    )
    if s_rows != d_rows:
        diffs = [(x, y) for x, y in zip(s_rows, d_rows) if x != y][:5]
        n = len([1 for x, y in zip(s_rows, d_rows) if x != y])
        raise AssertionError(
            f"value mismatch ({n} rows differ); "
            f"first diffs (spark vs duck): {diffs}"
        )
