"""Incremental (high-watermark) batch ingestion.

The reference processes a fixed set of monthly files per DAG run
(reference dag.py:16, 453–466 — the schedule IS its incremental
mechanism).  The engine-level generalization: persist the maximum event
time successfully processed (the high watermark), and each run processes
only rows strictly later, appending idempotently.

Scale behavior:

- The watermark predicate (``ts > hwm``) is pushed into the parquet scan
  (min/max row-group stats skip old files entirely); with date-partitioned
  layouts it becomes partition pruning — an incremental run over a 100 TB
  table reads only the new tail.
- State is a tiny JSON document (one value), written atomically via
  rename; at cluster scale the same contract is a metastore/table
  property, not a bigger file.
- Crash between "write output" and "advance watermark" ⇒ the next run
  re-selects the same rows: compose with an idempotent sink
  (``streaming/sinks.write_batch_idempotent`` or
  ``sources/jdbc.insert_if_absent``) for exactly-once overall.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_watermark(state_path: str) -> str | None:
    """Last committed high watermark (ISO timestamp string), or None."""
    if not os.path.exists(state_path):
        return None
    with open(state_path) as f:
        return json.load(f)["high_watermark"]


def write_watermark(state_path: str, value: str) -> None:
    """Atomic watermark commit (write temp + rename)."""
    d = os.path.dirname(state_path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"high_watermark": value}, f)
    os.replace(tmp, state_path)


def select_increment(df: DataFrame, ts_col: str, state_path: str) -> DataFrame:
    """Rows strictly after the committed watermark (everything on first run).

    Strict ``>`` assumes event times are unique at the boundary (true for
    parquet-batch sources committed atomically); sources that can emit
    ties at the watermark should instead key on a monotonically unique
    (ts, id) pair.
    """
    hwm = read_watermark(state_path)
    if hwm is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(hwm).cast("timestamp_ntz"))


def commit_increment(increment: DataFrame, ts_col: str, state_path: str) -> int:
    """Advance the watermark to the increment's max ts; returns row count.

    Call AFTER the sink write succeeds — crash-before-commit replays the
    increment (at-least-once; idempotent sinks make it exactly-once).
    """
    row = increment.agg(
        F.max(ts_col).alias("mx"), F.count(F.lit(1)).alias("n")
    ).first()
    if row["n"] and row["mx"] is not None:
        write_watermark(state_path, str(row["mx"]))
    return row["n"]
