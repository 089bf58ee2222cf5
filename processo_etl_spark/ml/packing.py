"""Sequence packing: assign documents to fixed-size context windows.

LLM pretraining consumes fixed-length token windows; the packing step
maps each (shuffled) document to a window id and an offset — the
"concat-and-chunk" scheme: documents are laid end-to-end in a
deterministic order and the stream is cut every ``max_tokens``.  A
document may straddle a cut (standard GPT-style pretraining behavior);
``offset`` tells the consumer where in its first window the document
starts.

Design for 100 TB:

- **Shard first, pack within shards.** A single global running sum is a
  one-partition window — the canonical Spark scale bug.  Here documents
  hash into ``n_shards`` independent streams; each shard's cumsum is a
  bounded per-partition sort, and (shard, pack_id) is globally unique.
  With 100k+ shards every executor packs in parallel and no window state
  exceeds |rows|/n_shards.
- **Deterministic order** inside a shard: md5-hash order (pre-shuffled
  for free — no separate shuffle pass), tie-broken by the key.
- All arithmetic is integer and engine-portable (md5-prefix hashes), so
  the whole operator is SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from processo_etl_spark.ml.dedup import md5_long


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    max_tokens: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Concat-and-chunk packing: adds ``shard``, ``pack_id``, ``offset``.

    ``pack_id`` = which fixed-size window (within the shard) the document
    *starts* in; ``offset`` = token position within that window.  The
    running total before each document is
    ``sum(tokens) OVER (PARTITION BY shard ORDER BY h ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — a map-side-combinable prefix sum per
    shard, one shuffle total.
    """
    c = F.col(key).cast("string")
    df = df.withColumn("_h", md5_long(c)).withColumn(
        "shard", (md5_long(F.concat(F.lit("pack:"), c)) % F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("pack_id", F.floor(prev / F.lit(max_tokens)).cast("long"))
        .withColumn("offset", (prev % F.lit(max_tokens)).cast("long"))
        .drop("_h")
    )


def packing_stats(packed: DataFrame, token_col: str, max_tokens: int) -> DataFrame:
    """Fill-rate audit per shard: windows used vs. ideal (= ceil of the
    token total / window size).  For concat-and-chunk the two are equal by
    construction — the audit's value is catching a broken upstream token
    count (NULL/negative) rather than packing loss."""
    return packed.groupBy("shard").agg(
        F.sum(token_col).alias("tokens"),
        (F.count_distinct("pack_id")).alias("packs_started"),
        F.ceil(F.sum(token_col) / F.lit(max_tokens)).alias("packs_ideal"),
    )
