"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the fact⋈fact (or fact⋈large-dim) join's shuffle IS the
bottleneck; pre-bucketing both sides on the join key by the same bucket
count lets Spark plan a SortMergeJoin with NO Exchange — each task reads
matching bucket files from both tables.  The write pays the shuffle
once; every subsequent join reuses the layout (the classic "pay once,
join forever" warehouse trade).

Bucketing requires the table catalog (``saveAsTable``); plain
``.parquet(path)`` writes carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write as a bucketed (and bucket-sorted) catalog table.

    The ``repartition(n_buckets, *bucket_cols)`` first aligns write
    tasks with buckets (Spark's repartition and bucketBy share the same
    Murmur3 hash): task i holds exactly bucket i's rows, so the layout
    is one file per bucket.  Without it every write task emits a file
    for every bucket it happens to see — a (tasks × buckets) small-file
    explosion that turns the downstream scan into a footer-read storm.
    """
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def join_is_shuffle_free(spark: SparkSession, left: str, right: str, on: list[str]) -> bool:
    """True iff joining the two bucketed tables plans no shuffle Exchange.

    Broadcast is disabled for the probe: on small test data Spark prefers
    a broadcast join (which ignores bucketing entirely); the question
    being asked is what the plan does when both sides are too big to
    broadcast — exactly the 100 TB case bucketing exists for.
    """
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(left)
            .join(spark.table(right), on=on)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    return "Exchange hashpartitioning" not in plan and "SortMergeJoin" in plan
