"""Structured Streaming over the events table.

The reference models incremental arrival as a monthly Airflow schedule
(reference dag.py:16); the Spark-native upgrade is a file-source stream:
``readStream`` → watermark → windowed aggregation → ``writeStream``.
Batch equivalents (oracle-checked) live in plans/events.py — the window
semantics are shared, so streaming correctness reduces to "same result
as batch when nothing is late".

``availableNow`` drains everything currently in the source and stops —
the batch-replay trigger used by tests and the rows-only driver check.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processo_etl_spark import catalog
from processo_etl_spark.plans.common import dec


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from a
    batch peek — streaming sources require an explicit schema)."""
    # The file source wants a directory: stream the sf_dir with a glob
    # pinned to the events file.  ts arrives as a nanosecond long
    # (nanosAsLong — see catalog.load) and is rebuilt as a TIMESTAMP;
    # watermarks require the tz-aware type (session tz pinned UTC).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(catalog.table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked 1-hour tumbling window counts + exact decimal sums.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and dropped — required for append-mode sinks
    and for state not to grow unboundedly at 100 TB/day rates.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("decimal(20,2)").alias("total_value"),
        )
    )


def run_tumbling_count_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the whole source once (availableNow) into a memory sink and
    return the result table — a real streaming execution, used by tests
    and the rows-only driver check."""
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_counts(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
