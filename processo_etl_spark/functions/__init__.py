"""Scalar column-function library (SURVEY.md §2.8 C1–C19).

Everything is a composable ``Column`` expression or a DataFrame→DataFrame
transform built from native ``pyspark.sql.functions`` — zero row-at-a-time
Python UDFs (the reference's ``apply``/``iterrows`` escape hatches, §2.10,
are all replaced by JVM-side expressions that stay inside whole-stage
codegen).
"""

from processo_etl_spark.functions import cleaning, derive, text  # noqa: F401
