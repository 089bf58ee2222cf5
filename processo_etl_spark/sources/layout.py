"""Physical layout for data skipping: sort-clustered parquet writes.

Parquet readers prune ROW GROUPS by min/max statistics before reading
data pages.  Stats only help if values are clustered: a randomly-ordered
table has every row group spanning the full value range (no skip);
sorting by the filter column first makes row-group ranges disjoint, so a
selective predicate reads a small fraction of groups.  This is the
single cheapest scan optimization a 100 TB lake has — pay one sort at
write, skip forever.

``write_sorted`` uses ``repartitionByRange`` + ``sortWithinPartitions``:
the range exchange clusters globally (file-level skipping across files),
the local sort clusters within files (row-group-level skipping), and no
single task ever holds the full dataset — this is exactly Spark's
distributed ORDER BY shape, scaling to any size.  For multi-column
skipping, pass several columns; first column dominates (for true
multi-dimensional locality a space-filling-curve key would be the
extension point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame, path: str, cluster_cols: list[str], num_files: int | None = None
) -> None:
    out = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    out.sortWithinPartitions(*cluster_cols).write.mode("overwrite").parquet(path)


def row_group_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) per row group across all files — what the reader's
    stats-based pruning sees.  pyarrow footer read, no data scan."""
    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    return ranges


def skipping_fraction(ranges: list[tuple], lo, hi) -> float:
    """Fraction of row groups a [lo, hi] predicate can SKIP."""
    if not ranges:
        return 0.0
    skipped = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)
