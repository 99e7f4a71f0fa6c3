"""Deterministic numeric aggregation helpers.

Float summation order is nondeterministic under parallel aggregation
(SURVEY.md §7 "hard bits" #1), so money-typed sums route through
DECIMAL(18,4): the fixture values are ≤2-decimal doubles, products of
two of them are ≤4-decimal, the decimal cast recovers the exact value,
and decimal addition is associative — Spark and DuckDB then agree to
the last bit regardless of partitioning. The final cast back to DOUBLE
keeps the driver-visible schema simple.

At 100 TB the same trick holds: DECIMAL(18,4) sums into Spark's
DECIMAL(28,4) accumulator, overflow-safe past 10^24.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"


def dsum(col: Column) -> Column:
    """Exact, order-insensitive sum of a money-valued double column."""
    return F.sum(col.cast(MONEY)).cast("double")


def davg(col: Column) -> Column:
    """Deterministic average: exact decimal sum, then one double division."""
    return (F.sum(col.cast(MONEY)).cast("double") / F.count(col)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
