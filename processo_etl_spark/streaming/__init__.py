"""Structured Streaming jobs (extension — the reference is batch-only,
SURVEY.md §2.9)."""

from processo_etl_spark.streaming import jobs  # noqa: F401
