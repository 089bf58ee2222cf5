"""Query-plan registry.

Every operator from ``SURVEY.md §2`` (plus the scale extensions) registers
itself here as a named pair:

- a PySpark callable ``(spark, sf_dir) -> DataFrame`` — the engine's
  DataFrame-first implementation, and
- an oracle: the equivalent ANSI SQL string DuckDB runs on the same
  parquet tables (omitted only for genuinely non-SQL-expressible ops,
  where the driver records a weaker rows-only check).

Numeric-parity convention (validated empirically against DuckDB 1.0):
monetary/quantity aggregates are computed in DECIMAL on both engines and
cast to a fixed DECIMAL(p,s) — exact, order-insensitive, bit-identical —
never as raw double sums (double summation order is nondeterministic
across partitions).  Averages = exact decimal sum → double → divide.
Timestamps are TIMESTAMP_NTZ on both sides (parquet naive + UTC session).
Every computed column is aliased identically in both implementations.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Plan modules that self-register on import.
_PLAN_MODULES = (
    "relational",
    "aggregates",
    "scalar",
    "star",
    "windows",
    "mlops",
    "events",
    "temporal",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(f"{__name__}.{mod}")


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
