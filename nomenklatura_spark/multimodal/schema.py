"""Typed schema for opaque media columns.

The reference has no media handling; this is the training-data-pipeline
extension mandated by the build brief: media as ``binary`` payloads +
typed metadata, partition-friendly (metadata columns are scalar, so
predicate pushdown / partition pruning on ``media_type`` works while the
payload stays an opaque blob the scan never has to interpret).

At 100 TB the payload column dominates storage — the design keeps every
query that doesn't need bytes (routing, stats, filtering) on the metadata
columns only, so Parquet column pruning drops the blob from the scan
entirely (``ReadSchema`` without ``payload``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# One asset row: id + opaque payload + scalar typed metadata.  Scalar (not a
# nested struct) so that min/max page stats and dictionary filters apply.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),  # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # audio/video
        StructField("sample_rate", IntegerType()),  # audio
        StructField("n_frames", IntegerType()),  # video
        StructField("codec", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("header", StringType()),
        StructField("n_chunks", IntegerType()),
    ]
)

_CHUNK = 256  # bytes per fake "frame"/"chunk" in the deterministic format


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic assets derived from the ``documents`` table.

    payload = UTF-8 bytes of the text (a stand-in blob the tests can verify
    byte-for-byte against ``encode(text)`` in DuckDB); media_type cycles by
    ``doc_id % 3``; dimension metadata derives from ``n_chars`` so every
    column is reproducible in the SQL oracle.
    """
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("n_chars") % 1920 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 1080 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") / _CHUNK + 1).cast("int").alias("n_frames"),
        F.lit("raw/v1").alias("codec"),
    )
