"""Document chunking: fixed-size sliding token windows over text.

Pretraining and retrieval pipelines rarely consume whole documents —
they consume CHUNKS: fixed-size windows of ``size`` tokens advanced by
``stride`` (stride < size ⇒ overlapping windows, the standard RAG /
long-context prep step).  The reference pipeline has no analogue (its
unit is the row); this is one of the training-data extensions the
engine adds as a first-class operator.

Design for 100 TB:

- **Pure narrow map** — ``split`` → ``posexplode(sequence(...))`` →
  ``slice``; zero shuffles, zero Python.  Each input partition fans out
  to its own chunk rows, so parallelism and data locality are inherited
  from the scan and the operator composes with any upstream filter
  pushdown.
- **Bounded fan-out** — a document of n tokens emits
  ⌈max(n,1)/stride⌉ rows; output size is a constant factor of input
  size (size/stride ≤ 2 for the default 50% overlap), not quadratic.
- **Deterministic ids** — ``chunk_id`` = window ordinal, so re-runs and
  engine/oracle twins agree row-for-row with no nondeterministic
  numbering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Returns (id, chunk_id, chunk_start, n_tokens, chunk_text): window
    ``chunk_id`` covers tokens [chunk_start, chunk_start + size) of the
    whitespace-token stream; the final window may be shorter.  Every
    document emits at least one chunk (an empty/whitespace text yields
    its degenerate single window) so no input row is silently dropped.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    # NULL text folds into the empty-string degenerate window (one chunk,
    # n_tokens counting the single empty token) instead of Spark's
    # size(NULL) = -1 poisoning the counts and diverging from the
    # oracle's string_split(coalesce(...)).
    toks: Column = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, size)
    return (
        df.select(F.col(id_col), toks.alias("_toks"), starts.alias("_starts"))
        .select(
            id_col,
            "_toks",
            F.posexplode("_starts").alias("_pos", "_start"),
        )
        .select(
            id_col,
            F.col("_pos").cast("long").alias("chunk_id"),
            F.col("_start").cast("long").alias("chunk_start"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )
