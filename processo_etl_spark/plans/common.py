"""Shared helpers for plan definitions."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from processo_etl_spark import catalog


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a catalog table (lazy parquet scan)."""
    return catalog.load(spark, sf_dir, name)


def dec(c: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast to DECIMAL for exact, order-insensitive aggregation.

    Double sums depend on partition/accumulation order; decimal sums are
    exact, so Spark and the DuckDB oracle agree bit-for-bit.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def decsum(c: Column | str, out_precision: int = 20, out_scale: int = 2) -> Column:
    """Exact decimal SUM with a pinned output type (match the oracle's CAST)."""
    return F.sum(dec(c)).cast(f"decimal({out_precision},{out_scale})")


def avg_exact(c: Column | str) -> Column:
    """Average as exact-decimal sum → double ÷ count: deterministic on both engines."""
    return F.sum(dec(c)).cast("double") / F.count(F.lit(1))
