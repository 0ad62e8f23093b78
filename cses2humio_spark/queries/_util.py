"""Shared helpers for oracle-checked queries.

Cross-engine determinism rules (see registry docstring):
- Money sums: cast operands to exact DECIMAL first, sum (exact), cast the
  final value to double. Bit-identical in Spark and DuckDB regardless of
  partitioning / aggregation order.
- Averages: exact decimal sum cast to double, divided by count — one
  double division on identical operands.
- Timestamps in outputs: epoch seconds (bigint) or formatted strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(name: str | Column) -> Column:
    c = F.col(name) if isinstance(name, str) else name
    return c.cast("decimal(12,2)")


def frac(name: str | Column) -> Column:
    """Exact 2-decimal fraction in [0, 10) (discount / tax)."""
    c = F.col(name) if isinstance(name, str) else name
    return c.cast("decimal(3,2)")


def sum_money(name: str | Column, alias: str) -> Column:
    return F.sum(money(name)).cast("double").alias(alias)


def avg_exact(name: str | Column, alias: str, scale: str = "decimal(12,2)") -> Column:
    c = F.col(name) if isinstance(name, str) else name
    return (F.sum(c.cast(scale)).cast("double") / F.count(c)).alias(alias)


def fmt_date(name: str | Column, alias: str) -> Column:
    c = F.col(name) if isinstance(name, str) else name
    return F.date_format(c, "yyyy-MM-dd").alias(alias)


def epoch_s(col: Column, alias: str) -> Column:
    return F.unix_timestamp(col).cast("bigint").alias(alias)
