"""Streaming ⇔ batch equivalence: the streaming jobs must produce the
same results as their oracle-checked batch twins once fully drained."""

from __future__ import annotations

from processo_etl_spark import plans
from processo_etl_spark.streaming import jobs

SF_DIR = "/root/testdata/sf0.001"


def _as_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_stream_tumbling_equals_batch(spark):
    stream = jobs.run_tumbling_count_availablenow(spark, SF_DIR)
    batch = plans.all_queries()["tumbling_window_counts"](spark, SF_DIR)
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _as_set(stream, cols) == _as_set(batch, cols)


def test_stream_sessionize_stateful_equals_batch(spark):
    stream = jobs.run_sessionize_stateful_availablenow(spark, SF_DIR)
    batch = plans.all_queries()["sessionize_gap"](spark, SF_DIR)
    cols = ["user_id", "n_sessions", "n_events"]
    assert _as_set(stream, cols) == _as_set(batch, cols)


def test_stateful_sessionizer_across_micro_batches(spark, tmp_path):
    """State must persist BETWEEN micro-batches: split events over many
    files and force one file per trigger, so most users' sessions span
    batches.  A sessionizer that only folds within a batch would
    overcount sessions at every batch boundary."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from processo_etl_spark import catalog
    from processo_etl_spark.streaming import jobs

    ev = catalog.load(spark, SF_DIR, "events")
    src = str(tmp_path / "events_many_files")
    # 8 files, arbitrary row split (not time-ordered — harder case).
    ev.repartition(8).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"mb_{uuid.uuid4().hex[:8]}"
    q = (
        jobs.sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_mb_"))
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    batch = plans.all_queries()["sessionize_gap"](spark, SF_DIR)
    cols = ["user_id", "n_sessions", "n_events"]
    assert _as_set(final, cols) == _as_set(batch, cols)


def test_insert_if_absent_anti_join(spark):
    from processo_etl_spark.sources import jdbc

    staging = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
    )
    existing = spark.createDataFrame([(1,), (3,)], ["id"])
    out = jdbc.insert_if_absent(staging, existing, ["id"]).collect()
    assert [(r["id"], r["v"]) for r in out] == [(2, "b")]
    # Idempotence: appending the survivors then re-staging inserts nothing.
    existing2 = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    assert jdbc.insert_if_absent(staging, existing2, ["id"]).count() == 0
