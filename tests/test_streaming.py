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
