"""Decorator-based registry pairing each Spark query with its DuckDB oracle.

The driver compares row-count + schema + order-insensitive value hash at
sf0.01, sorting columns by name — so every computed column is aliased to the
SAME name on both sides, floats are made deterministic (exact decimal
arithmetic for money sums, explicit rounding elsewhere), and timestamps are
emitted as epoch integers or formatted strings (never engine-native
timestamp reprs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the equivalent DuckDB SQL (or None
    for non-SQL-expressible ops → driver runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
