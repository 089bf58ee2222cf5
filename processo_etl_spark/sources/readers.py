"""File-source readers (S1-S7) re-expressed for Spark.

- Raw CSV scan: ';' + latin1 + explicit schema (reference dag.py:47, S3)
  — schema-on-read enforcement replaces inference + try/except checks
  (dag.py:65-75).
- Intermediate CSV scan (',' + utf-8, dag.py:62, S4) exists for parity
  but the engine's stages are lazy lineage — no intermediates needed.
- HTTP zip ingest (S1/S2, dag.py:22-41) is driver-side landing-zone
  work, deliberately OUTSIDE the Spark plan: Spark cannot split zip.
"""

from __future__ import annotations

import io
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from processo_etl_spark.etl.schemas import RAW_CSV_OPTIONS


def read_raw_csv(
    spark: SparkSession, path: str | list[str], schema: T.StructType
) -> DataFrame:
    """Raw-dialect CSV scan (dag.py:47): sep=';', latin1, header, explicit schema."""
    reader = spark.read.schema(schema)
    for k, v in RAW_CSV_OPTIONS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_intermediate_csv(
    spark: SparkSession, path: str | list[str], schema: T.StructType | None = None
) -> DataFrame:
    """Intermediate-dialect CSV scan (dag.py:62): ',', utf-8, header."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (dag.py:54, S5). Prefer parquet for internals."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` lays out hive-style directories so
    downstream filters on those columns become partition pruning (the
    scan skips whole directories — the 100 TB table-layout default for
    low-cardinality predicates like date / region)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def ingest_http_zip(url: str, dest_dir: str, timeout: int = 60) -> list[str]:
    """S1+S2 (dag.py:22-41): download a zip, extract members, drop archive.

    Driver-side by design — zip is not splittable; extraction feeds a
    landing directory that Spark then scans in parallel.  Raises on
    non-200 like the reference (dag.py:34).
    """
    from urllib.request import urlopen

    os.makedirs(dest_dir, exist_ok=True)
    with urlopen(url, timeout=timeout) as resp:  # noqa: S310
        status = getattr(resp, "status", None)
        if status is not None and status != 200:  # file:// has no status
            raise RuntimeError(f"download failed: HTTP {status} for {url}")
        payload = resp.read()
    out: list[str] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for member in zf.namelist():
            zf.extract(member, dest_dir)
            out.append(os.path.join(dest_dir, member))
    return out


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, splittable, gzip-friendly) —
    the interchange format LLM-data pipelines exchange document shards in."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an ENFORCED schema.

    Always pass the schema: schema inference reads the whole dataset
    twice at 100 TB; an explicit StructType makes the scan single-pass
    and stable under ragged/evolving records (missing keys → NULL)."""
    return spark.read.schema(schema).json(path)


def read_jsonl_robust(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines source that QUARANTINES malformed lines instead of
    failing the job or silently nulling them — at 100 TB a crawl shard
    always contains some broken records, and FAILFAST (kill a 10-hour
    job at line 9 billion) and silent-NULL (corrupt data poisoning
    training) are both wrong answers.

    PERMISSIVE mode + ``_corrupt_record``: parseable lines land typed,
    unparseable lines land verbatim in the quarantine column.  Returns
    ``(good, bad)`` — ``good`` with the enforced schema, ``bad`` as the
    raw offending lines for audit/replay.  Both come from ONE scan
    (same cached parse); the split is a narrow filter.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    with_quarantine = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.schema(with_quarantine)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark requires caching/materializing before referencing ONLY the
    # corrupt column (the parser prunes otherwise) — document the
    # constraint by doing it here.
    raw = raw.cache()
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — columnar alternative when the downstream warehouse is
    ORC-native (Hive/Trino); same pushdown/pruning properties as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Partitioned parquet sink with DYNAMIC partition overwrite.

    ``partitionOverwriteMode=dynamic`` replaces only the partitions
    present in ``df`` — the idempotent reprocess-one-day pattern for a
    date-partitioned 100 TB lake (static mode would truncate the whole
    table).  Partition columns should be low-cardinality (dates, types):
    each distinct value is a directory, and readers prune them for free
    (partition pruning happens before the scan).
    """
    (
        df.write.mode("overwrite")
        .option(
            "partitionOverwriteMode", "dynamic" if dynamic_overwrite else "static"
        )
        .partitionBy(*partition_cols)
        .parquet(path)
    )
