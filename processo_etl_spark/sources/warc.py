"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl surface.

Extension surface beyond the reference's CSV/zip ingestion (dag.py's
extract stage handles HTTP zip → CSV; a web-scale training-data
pipeline's rawest input is WARC), built the same Spark-first way as the
media path (ml/multimodal.read_binary_media): a ``binaryFile`` scan is
the ingestion edge, and an Arrow-batched ``mapInPandas`` splits each
archive into records — no Python boundary per record, one per batch.

Format handled (public spec, ISO 28500 / WARC 1.0-1.1): records are
``WARC/1.x CRLF`` + header lines + ``CRLFCRLF`` + exactly
``Content-Length`` payload bytes + ``CRLFCRLF``.  Payloads are opaque
bytes (they may themselves contain ``WARC/1.0`` — the splitter advances
by Content-Length, never by searching the payload).  ``.warc.gz`` files
use the standard member-per-record gzip framing; ``gzip.GzipFile``
reads concatenated members natively.

Scale shape (100 TB): the FILE is the parallelism unit — Common Crawl
ships ~1 GB archives, tens of thousands per snapshot, so a listing-level
scan saturates any executor count without splitting inside an archive
(gzip members make mid-file splits impractical anyway — the public
Spark/Hadoop WARC readers make the same choice).  The splitter streams
one archive per task in one pass; steady state downstream is the same
compacted-parquet posture as media ingestion (SCALE.md): parse once,
write ``(record_id, uri, payload, …)`` parquet, never re-read the WARC.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

WARC_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("record_ix", IntegerType(), False),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def iter_warc_records(data: bytes) -> Iterator[tuple[str, dict, bytes]]:
    """Split one (decompressed) WARC byte stream into records.

    Yields ``(version_line, headers, payload)`` per record; header keys
    are lower-cased.  Advances strictly by ``Content-Length`` so payload
    bytes are never scanned for markers.  Malformed tails (truncated
    header block or payload) stop iteration rather than yielding a
    partial record — ingest-side truncation surfaces as a missing
    record, the same posture as the media path's NULL dims.
    """
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):  # inter-record CRLFs
            pos += 2
        if not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            key, _, val = ln.partition(":")
            headers[key.strip().lower()] = val.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break
        yield lines[0], headers, data[body_start : body_start + clen]
        pos = body_start + clen


def _maybe_gunzip(path: str, content: bytes) -> bytes:
    if not path.endswith(".gz"):
        return content
    # GzipFile.read() consumes ALL concatenated members (the
    # member-per-record WARC framing), unlike gzip.decompress.
    with gzip.GzipFile(fileobj=io.BytesIO(content)) as fh:
        return fh.read()


def read_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """``binaryFile`` scan of a WARC directory → one row per record.

    Listing-level pruning via ``pathGlobFilter``; per-archive record
    splitting runs executor-side in one Arrow-batched pass.  Columns:
    WARC_SCHEMA (path, in-file record index, the standard headers,
    exact Content-Length, raw payload bytes).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out: dict[str, list] = {f.name: [] for f in WARC_SCHEMA.fields}
            for p, content in zip(pdf["path"], pdf["content"]):
                data = _maybe_gunzip(p, bytes(content))
                for ix, (_ver, hdr, payload) in enumerate(
                    iter_warc_records(data)
                ):
                    out["path"].append(p)
                    out["record_ix"].append(ix)
                    out["warc_type"].append(hdr.get("warc-type"))
                    out["record_id"].append(hdr.get("warc-record-id"))
                    out["warc_date"].append(hdr.get("warc-date"))
                    out["target_uri"].append(hdr.get("warc-target-uri"))
                    out["content_length"].append(
                        int(hdr.get("content-length", "0"))
                    )
                    out["payload"].append(payload)
            pdf_out = pd.DataFrame(out)
            pdf_out["record_ix"] = pdf_out["record_ix"].astype("int32")
            pdf_out["content_length"] = pdf_out["content_length"].astype(
                "int64"
            )
            yield pdf_out

    return raw.mapInPandas(batches, schema=WARC_SCHEMA)


def encode_warc_record(
    warc_type: str,
    record_id: str,
    date: str,
    target_uri: str | None,
    payload: bytes,
) -> bytes:
    """Serialize one WARC 1.0 record (exact Content-Length framing)."""
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def write_warc_corpus(
    directory: str,
    n_files: int = 4,
    records_per_file: int = 16,
    gz: bool = False,
) -> str:
    """Materialize the deterministic WARC fixture corpus as REAL files.

    Global record id ``g = file·records_per_file + i``; record ``g`` is
    ``metadata`` when ``g % 8 == 0`` else ``response``, targets
    ``https://site{g%5}.example.com/doc/{g}``, and carries the ASCII
    payload ``doc-{g}:`` + ``'x'·(g%97)`` — every graded column is a
    closed form a SQL oracle can state without parsing WARC.  With
    ``gz=True`` each record is its own gzip member (the standard
    ``.warc.gz`` framing).  Idempotent and race-safe like
    ml/multimodal.write_png_corpus: deterministic bytes, temp-file +
    atomic ``os.replace``, length-matched existing files left alone.
    """
    import os

    os.makedirs(directory, exist_ok=True)
    ext = "warc.gz" if gz else "warc"
    for f in range(n_files):
        blob = b""
        for i in range(records_per_file):
            g = f * records_per_file + i
            rec = encode_warc_record(
                "metadata" if g % 8 == 0 else "response",
                f"<urn:uuid:{g:032x}>",
                "2026-01-01T00:00:00Z",
                f"https://site{g % 5}.example.com/doc/{g}",
                (f"doc-{g}:" + "x" * (g % 97)).encode(),
            )
            blob += gzip.compress(rec, mtime=0) if gz else rec
        dest = os.path.join(directory, f"crawl-{f:03d}.{ext}")
        try:
            if os.path.getsize(dest) == len(blob):
                continue
        except OSError:
            pass
        tmp = f"{dest}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, dest)
    return directory
