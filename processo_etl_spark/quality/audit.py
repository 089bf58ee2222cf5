"""The reference notebook's validation loop (Análise.ipynb:1081-1274) as
reusable distributed queries.

Every check is ONE aggregation job (no per-column driver loops over
collect): the null audit computes all columns in a single pass; the
histogram/quantile helpers are two-pass only where the reference itself
is (auto-ranged bins need min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A2 (Análise.ipynb:1089): per-column null count, single pass, one row."""
    cols = cols or df.columns
    return df.select(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    )


def histogram_fixed(df: DataFrame, col: Column | str, lo: int, hi: int, nbins: int) -> DataFrame:
    """A6 (Análise.ipynb:1113-1115): fixed-range histogram (e.g. hours 0-24).

    Bin = floor((x-lo)*nbins/(hi-lo)), clamped — a single group-by, fully
    map-side combinable.
    """
    c = F.col(col) if isinstance(col, str) else col
    width_expr = (c - F.lit(lo)) * F.lit(nbins) / F.lit(hi - lo)
    bin_col = F.least(F.floor(width_expr).cast("int"), F.lit(nbins - 1)).alias("bin")
    return df.select(bin_col).groupBy("bin").count().orderBy("bin")


def histogram_auto(df: DataFrame, col: str, nbins: int = 10) -> DataFrame:
    """A7 (Análise.ipynb:1162-1213): auto-ranged histogram — two-pass.

    Pass 1: min/max (tiny job).  Pass 2: bucket + count with the bounds
    as literals (replanning with constants beats a cross-join subquery).
    """
    lo, hi = df.select(F.min(col), F.max(col)).first()
    c = F.col(col)
    if lo is None or hi == lo:
        return df.select(F.lit(0).alias("bin")).groupBy("bin").count()
    width_expr = (c - F.lit(float(lo))) * F.lit(nbins) / F.lit(float(hi) - float(lo))
    bin_col = F.least(F.floor(width_expr).cast("int"), F.lit(nbins - 1)).alias("bin")
    return df.select(bin_col).groupBy("bin").count().orderBy("bin")


def quartiles(df: DataFrame, col: str) -> DataFrame:
    """A8 (Análise.ipynb:1168-1219): exact q1/median/q3 (boxplot stats)."""
    return df.select(
        F.expr(f"CAST(percentile({col}, 0.25) AS DOUBLE)").alias("q1"),
        F.expr(f"CAST(percentile({col}, 0.5) AS DOUBLE)").alias("med"),
        F.expr(f"CAST(percentile({col}, 0.75) AS DOUBLE)").alias("q3"),
    )


def iqr_outliers(df: DataFrame, col: str) -> DataFrame:
    """A8: rows outside 1.5·IQR whiskers — two-pass (quartiles → filter)."""
    q1, _, q3 = df.select(
        F.expr(f"percentile({col}, 0.25)"),
        F.expr(f"percentile({col}, 0.5)"),
        F.expr(f"percentile({col}, 0.75)"),
    ).first()
    iqr = float(q3) - float(q1)
    lo, hi = float(q1) - 1.5 * iqr, float(q3) + 1.5 * iqr
    return df.filter((F.col(col) < lo) | (F.col(col) > hi))


def constraint_probe(df: DataFrame, predicate: str) -> DataFrame:
    """F6 (Análise.ipynb:1140/1150): SQL-string violation probe.

    The reference asserts these come back empty (`df.query(...)` then
    ``.empty``); callers check ``df.isEmpty()`` (A10).
    """
    return df.filter(predicate)


def all_valid(df: DataFrame, predicate: Column) -> DataFrame:
    """F9/A9 (Análise.ipynb:1128-1131): universal quantifier as bool_and."""
    return df.select(F.bool_and(predicate).alias("all_valid"))


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """O1 (Análise.ipynb:1104+): sorted domain listing."""
    return df.select(col).distinct().orderBy(col)
