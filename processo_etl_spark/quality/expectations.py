"""Declarative data-quality expectations, evaluated in ONE pass.

The reference scatters validity checks through notebook cells (EDA
asserts) and DAG steps; this is the consolidated form: a rule list in,
one aggregate job out — every rule becomes a conditional count in a
single map-side-combinable aggregation, so a 100-rule suite over 100 TB
still scans the table exactly once and shuffles one tiny row.

Rules are (name, Column-predicate) pairs where the predicate marks a
VIOLATION.  Helpers build the common predicates; arbitrary Column
expressions are accepted for the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_not_null", F.col(col).isNull())


def expect_between(col: str, lo, hi) -> tuple[str, Column]:
    return (f"{col}_between", ~F.col(col).between(lo, hi) | F.col(col).isNull())


def expect_in_set(col: str, values: list) -> tuple[str, Column]:
    return (f"{col}_in_set", ~F.col(col).isin(values) | F.col(col).isNull())


def expect_unique(col: str) -> tuple[str, None]:
    """Uniqueness needs its own aggregate (count vs distinct-count), so it
    is returned as a ``(name, None)`` marker handled by :func:`run`."""
    return (f"{col}_unique", None)


def run(df: DataFrame, rules: list[tuple[str, Column | None]]) -> DataFrame:
    """One-row violation report: n_rows plus one violation count per rule.

    ``expect_unique`` rules compile to ``count - approx/exact distinct``;
    everything else is ``sum(violation)``.  All counts ride one
    aggregation — one scan, one shuffle of a single row.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in rules:
        if pred is None:  # expect_unique marker
            col = name.removesuffix("_unique")
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col))).alias(name)
            )
        else:
            aggs.append(F.sum(pred.cast("int")).cast("bigint").alias(name))
    return df.agg(*aggs)


def passed(report_row, rule_names: list[str]) -> bool:
    """True iff every rule's violation count is zero."""
    return all(report_row[n] == 0 for n in rule_names)
