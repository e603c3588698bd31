"""Shared expression helpers.

Money/quantity aggregates are computed in DECIMAL, then rounded and
cast to DOUBLE. Float sums are order-dependent (Spark's partial
aggregation order differs from DuckDB's sequential scan), so summing
doubles directly would make the driver's value-hash flaky; decimal
sums are exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def money(expr: Column, ndigits: int = 2) -> Column:
    """Round a decimal aggregate and surface it as a double."""
    return F.round(expr, ndigits).cast("double")


def dmean(sum_col: Column, count_col: Column, name: str) -> Column:
    """Deterministic mean: exact decimal sum -> double, IEEE divide."""
    return (sum_col.cast("double") / count_col).alias(name)


# SQL-side equivalents for oracle strings (DuckDB dialect == ANSI here).
def sql_dec(expr: str, scale: int = 4) -> str:
    return f"CAST({expr} AS DECIMAL(18,{scale}))"
