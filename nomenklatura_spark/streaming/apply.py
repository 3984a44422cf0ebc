"""P4 (streaming) — canonicalize a statement stream with Structured
Streaming.

The reference's "streaming" is Python generators over files
(cli.py:221-236); the Spark-native form is a readStream → broadcast-join
rewrite → writeStream job. The linker mapping is a slowly-changing small
table: per micro-batch it is re-read and broadcast inside foreachBatch —
the standard stream-static join pattern for mutable dimensions.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from nomenklatura_spark.resolver.linker import apply_linker
from nomenklatura_spark.sources.entity_json import ENTITY_JSON_SCHEMA


def stream_entity_files(
    spark: SparkSession, path: str, dataset: str = "stream"
) -> DataFrame:
    """readStream over a directory of entity-JSON files → statement stream.

    Reuses the batch explode logic — the DataFrame transformations are
    identical for batch and streaming inputs (Catalyst plans both).
    """
    from pyspark.sql import functions as F

    from nomenklatura_spark.model.statement import _stmt_id
    from nomenklatura_spark.sources.entity_json import prop_registry

    raw = spark.readStream.schema(ENTITY_JSON_SCHEMA).json(path)
    props = raw.select(
        F.col("id").alias("entity_id"),
        F.col("schema"),
        F.coalesce(F.element_at("datasets", 1), F.lit(dataset)).alias("dataset"),
        F.explode("properties").alias("prop", "values"),
    ).select(
        "entity_id", "schema", "dataset", "prop", F.explode("values").alias("value")
    )
    typed = props.join(F.broadcast(prop_registry(spark)), "prop", "left")
    return typed.select(
        _stmt_id(F.col("entity_id"), F.col("prop"), F.col("value")).alias("id"),
        "entity_id",
        F.col("entity_id").alias("canonical_id"),
        "prop",
        F.coalesce("prop_type", F.lit("string")).alias("prop_type"),
        "schema",
        "value",
        F.lit(None).cast("string").alias("original_value"),
        "dataset",
        F.lit(None).cast("string").alias("origin"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(False).alias("external"),
        F.lit(None).cast("timestamp").alias("first_seen"),
        F.lit(None).cast("timestamp").alias("last_seen"),
    )


def apply_stream(
    stmt_stream: DataFrame,
    mapping_provider: Callable[[SparkSession], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Canonicalize each micro-batch through the current linker mapping
    and hand it to ``sink``. ``mapping_provider`` is called per batch so
    judgement updates between batches take effect (read-your-writes at
    batch granularity — SURVEY.md §7 hard-part (c))."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        mapping = mapping_provider(batch.sparkSession)
        sink(apply_linker(batch, mapping), batch_id)

    writer = (
        stmt_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
