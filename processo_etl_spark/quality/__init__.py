"""Data-quality / EDA workload as an API (SURVEY.md §2.5, §3 EP2)."""

from processo_etl_spark.quality import audit, privacy  # noqa: F401
