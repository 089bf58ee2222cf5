"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas`` so the (heavy) Python work
is amortized per batch, not per row.

The decode internals are STUBBED — the image/audio libraries are not in
this container — behind ``_decode_image_stub`` (a deterministic fake
deriving "pixels" from the payload bytes).  The Spark-side plumbing
(schema, partition sizing, UDF signatures, batch iteration) is real and
tested; swapping the stub for Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Build a media table with binary payloads from any string column.

    Stands in for a real object-store scan: payload = utf-8 bytes of the
    seed column (deterministic), metadata columns typed as in
    MEDIA_SCHEMA.
    """
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(seed_col), "utf-8").alias("payload"),
        (F.length(F.col(seed_col)) % 64 + 16).cast("int").alias("width"),
        (F.length(F.col(seed_col)) % 48 + 16).cast("int").alias("height"),
    )


def decode_image(payload: bytes):
    """REAL image decode — NOT IMPLEMENTED in this container.

    The image libraries (Pillow / torchvision / ffmpeg) are not
    installed; production swaps this in for ``_decode_image_stub`` and
    the rest of the plumbing is unchanged.
    """
    raise NotImplementedError(
        "real image decode needs Pillow/torchvision; the engine ships the "
        "deterministic stub _decode_image_stub for plumbing tests"
    )


def _decode_image_stub(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake decoder (REAL decode NOT IMPLEMENTED here).

    Derives ``n_features`` doubles from byte statistics — stable across
    runs and engines, so the plumbing is testable.  Replace with
    Pillow/torchvision decode when the libraries exist on the cluster.
    """
    if payload is None or len(payload) == 0:
        return [0.0] * n_features
    return [
        float(sum(payload[i::n_features]) % 997) / 997.0 for i in range(n_features)
    ]


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: one Python call per Arrow batch (not per row); the
    output schema is fixed so downstream plans are stable.  Partition
    sizing guidance for real payloads: repartition so a batch of rows ×
    payload size fits executor memory (e.g. ~64 MB batches).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "feature": pdf["payload"].map(
                        lambda p: _decode_image_stub(p, n_features)
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' shape: explode one row per sampled offset.

    For video this is the per-frame fan-out (timestamp grid × payload);
    the stub samples byte offsets.  Native explode — the fan-out happens
    JVM-side, only the decode itself would call Python.
    """
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_index"),
    )
