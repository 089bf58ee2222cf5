"""Streaming sinks beyond the built-ins: foreachBatch with idempotent
(exactly-once) batch writes.

Structured Streaming guarantees at-least-once delivery to foreachBatch:
after a crash the last batch REPLAYS with the same ``batch_id``.  The
sink must therefore be idempotent per batch id.  The pattern here is the
standard one for file targets: each batch overwrites its own
deterministic subdirectory (``.../batch_id=N``), so a replay rewrites
identical content instead of duplicating it — the file-system analogue
of a keyed MERGE.  (The JDBC analogue in this repo is
``sources/jdbc.insert_if_absent`` — a null-safe left-anti insert, also
replay-safe.)

At 100 TB/day the per-batch overwrite stays safe: the unit of atomicity
is the batch directory, writers never touch other batches' directories,
and downstream readers see a consistent prefix of batch ids via the
checkpoint's committed offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_batch_idempotent(
    batch_df: DataFrame, batch_id: int, target_dir: str, dedup_keys: list[str] | None = None
) -> None:
    """foreachBatch body: overwrite this batch's own partition directory.

    Optionally dedups within the batch on ``dedup_keys`` first (sources
    can emit intra-batch duplicates; cross-batch exactly-once comes from
    the per-batch-id overwrite + checkpoint).
    """
    out = batch_df
    if dedup_keys:
        out = out.dropDuplicates(dedup_keys)
    out.write.mode("overwrite").parquet(f"{target_dir}/batch_id={batch_id}")


def start_foreach_batch_parquet(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    dedup_keys: list[str] | None = None,
):
    """Attach the idempotent parquet sink to a stream (availableNow so
    tests/batch-replays drain and stop; production drops the trigger)."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: write_batch_idempotent(df, bid, target_dir, dedup_keys)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_foreach_batch_jdbc_upsert(
    stream: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str],
    checkpoint_dir: str,
):
    """Streaming → RDBMS with replay-safe insert-if-absent semantics.

    The reference's whole load stage is a per-row psycopg2
    ``ON CONFLICT DO NOTHING`` loop (dag.py:399-443); this is its
    streaming-era equivalent: each micro-batch runs the SET-BASED
    ``sources/jdbc.upsert_insert_only`` (anti-join against current sink
    keys → bulk append).  At-least-once replays of a batch re-anti-join
    and insert nothing — idempotence comes from the KEYS, not the batch
    id, so it also absorbs cross-batch duplicates from the source.
    """
    from processo_etl_spark.sources import jdbc

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        jdbc.upsert_insert_only(batch_df, url, table, key_cols, properties)

    return (
        stream.writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
