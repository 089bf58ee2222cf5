"""RDBMS sink (S8/S9): set-based writes replace the reference's row-wise
``INSERT ... ON CONFLICT DO NOTHING`` loop (reference dag.py:399-443).

The reference upserts per row over psycopg2 — one network round trip per
row, unusable beyond toy scale.  The Spark-native equivalent:

- plain load  → ``df.write.jdbc(mode="append")`` (S8 DDL via
  ``createTableColumnTypes`` / overwrite).
- ON CONFLICT DO NOTHING → **left-anti join** the staging rows against
  the sink's current keys, then append only the genuinely-new rows
  (``insert_if_absent``).  One distributed join + one bulk append.
- true upsert (update on match) needs sink-side MERGE — out of scope
  for the reference (it never updates), documented here.

``insert_if_absent`` is sink-agnostic: the "existing keys" frame can
come from ``spark.read.jdbc`` (pushed-down key projection), a Delta
table, or parquet — so the logic is testable without a database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def insert_if_absent(
    staging: DataFrame, existing_keys: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Rows of ``staging`` whose key is NOT already present (S9 semantics).

    Left-anti join on the key columns — the distributed equivalent of
    ON CONFLICT (pk) DO NOTHING.  Null-safe equality (``<=>``) so a
    null key in both sides counts as a match, mirroring a PK that
    can't be null anyway.
    """
    cond = [staging[c].eqNullSafe(existing_keys[c]) for c in key_cols]
    return staging.join(existing_keys.select(*key_cols), on=cond, how="left_anti")


def read_existing_keys(
    spark, url: str, table: str, key_cols: list[str], properties: dict[str, str]
) -> DataFrame:
    """Key projection from the sink (Catalyst pushes the column pruning
    into the JDBC query: SELECT k1..kn FROM table)."""
    return spark.read.jdbc(url, table, properties=properties).select(*key_cols)


def write_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str],
    batchsize: int = 10_000,
) -> None:
    """Bulk JDBC append — per-partition batched inserts, never per-row."""
    (
        df.write.option("batchsize", str(batchsize))
        .jdbc(url, table, mode="append", properties=properties)
    )


def upsert_insert_only(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str],
) -> None:
    """Full S9 flow: stage → anti-join sink keys → bulk append."""
    existing = read_existing_keys(
        df.sparkSession, url, table, key_cols, properties
    )
    write_append(insert_if_absent(df, existing, key_cols), url, table, properties)
