"""Relational operator building blocks (SURVEY.md §2.2–§2.7)."""

from processo_etl_spark.operators import relational, star  # noqa: F401
