"""CDC changeset application: fold a batch of I/U/D changes into a
snapshot (the set-based MERGE the reference's row-at-a-time Postgres
loop approximates — reference dag.py:399–443 INSERTs row by row).

``apply_changes`` is the batch form of Delta/Iceberg ``MERGE INTO``
without a table format: latest change per key wins (by a monotone
sequence column), deletes drop the key, inserts/updates replace it.

Scale shape: one window over the changeset (small relative to the base —
a day's CDC vs the full table) + one left-anti join on the key.  The
base table never sorts; with both sides bucketed on the key
(`sources/bucketed.py`) the anti-join is shuffle-free too.  Determinism:
ties on ``seq_col`` are broken by preferring deletes, then by op
lexicographically — replays produce identical snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame, key_cols: list[str], seq_col: str, op_col: str = "op"
) -> DataFrame:
    """One winning change row per key: max seq, deletes win seq ties."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(),
        F.when(F.col(op_col) == "D", 0).otherwise(1).asc(),
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """New snapshot: base rows whose key has no change survive; changed
    keys take their winning change row (unless it's a delete)."""
    winner = latest_changes(changes, key_cols, seq_col, op_col)
    untouched = base.join(winner.select(*key_cols), key_cols, "left_anti")
    upserts = winner.filter(F.col(op_col) != "D").select(*base.columns)
    return untouched.unionByName(upserts)
