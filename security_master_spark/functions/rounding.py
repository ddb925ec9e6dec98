"""Cross-engine-deterministic rounding.

``ROUND(double, n)`` is NOT portable across engines: on the exact same
input double 258046.76124999998, Spark's round (exact-decimal HALF_UP
via BigDecimal) yields ...7612 while DuckDB's (floating-point scaling)
yields ...7613. Any query whose output is hash-compared across engines
must therefore round with explicitly-specified IEEE arithmetic:

    dround(x, n) = FLOOR(x * 10^n + 0.5) / 10^n

Every step (multiply, add, floor, divide) is exactly defined by IEEE
754, so any two engines computing it on the same input double get the
same output double. (Half-cases round toward +inf for negatives too —
a *convention* choice that matters less than its portability.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, digits: int = 4) -> Column:
    """Deterministic cross-engine round of a double column."""
    scale = float(10**digits)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)).cast("double") / F.lit(scale))


def sql_dround(expr: str, digits: int = 4) -> str:
    """SQL text equivalent of :func:`dround`, valid in both Spark SQL and
    DuckDB. ``CAST(... AS DOUBLE)`` (not a ``10000.0`` literal) because
    Spark SQL parses decimal-point literals as DECIMAL, which would
    change the division's result type."""
    scale = int(10**digits)
    return (
        f"FLOOR(({expr}) * CAST({scale} AS DOUBLE) + 0.5) / CAST({scale} AS DOUBLE)"
    )
