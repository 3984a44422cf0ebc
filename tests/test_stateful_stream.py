"""applyInPandasWithState cross-batch dedup: two micro-batches with
overlapping statement ids must emit each id exactly once."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

SCHEMA = "canonical_id string, id string, prop string, value string"


def _write_batch(d: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(d, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_dedupe_stream_across_batches(spark, tmp_path):
    from nomenklatura_spark.streaming.stateful import dedupe_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    batch1 = [
        {"canonical_id": "e1", "id": "s1", "prop": "name", "value": "A"},
        {"canonical_id": "e1", "id": "s2", "prop": "name", "value": "B"},
        {"canonical_id": "e2", "id": "s3", "prop": "name", "value": "C"},
        # duplicate inside one batch
        {"canonical_id": "e1", "id": "s1", "prop": "name", "value": "A"},
    ]
    batch2 = [
        # s1/s3 are replays from batch 1; s4 is new
        {"canonical_id": "e1", "id": "s1", "prop": "name", "value": "A"},
        {"canonical_id": "e2", "id": "s3", "prop": "name", "value": "C"},
        {"canonical_id": "e2", "id": "s4", "prop": "name", "value": "D"},
    ]
    _write_batch(src, "b1.json", batch1)
    _write_batch(src, "b2.json", batch2)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .json(src)
    )
    deduped = dedupe_stream(stream)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    ids = [r["id"] for r in rows]
    assert sorted(ids) == ["s1", "s2", "s3", "s4"], f"got {sorted(ids)}"
