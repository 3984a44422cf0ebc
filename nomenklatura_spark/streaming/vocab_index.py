"""Incremental corpus-vocabulary index (training-data tier of §2.12).

Batch vocabulary rollup (``textops/analysis.corpus_vocab``) rescans the
corpus per run; a tokenizer-training ingest pipeline instead wants the
word/document-frequency table maintained as documents arrive.  Word
counts are a commutative monoid, so the index is a materialised view
merged by key:

- ``vocab`` (word, count, n_docs) is keyed by word; each micro-batch is
  rolled up with the SAME two-level aggregation as the batch operator
  and folded in with a full-outer merge that sums both counters.
- Per-batch cost is O(batch tokens) + a merge shuffle bounded by the
  vocabulary, which grows sub-linearly in the corpus (Heaps' law) —
  the corpus itself is never rescanned.
- Contract (pytest-pinned, incremental-equals-scratch): after ANY
  sequence of batches of NEW documents, the state equals
  ``corpus_vocab(union of batches, top_k=None)``.  Documents are
  treated as append-only/immutable — re-ingesting an id double-counts
  (retraction would need per-document counts, corpus-sized state; an
  ingest pipeline dedups ids upstream, e.g. via the dedup index).

State is versioned parquet snapshots with a VERSION pointer (crash-safe
swap, time travel) exactly like ``DedupIndexState``; on a cluster the
merge is a Delta ``MERGE INTO ... WHEN MATCHED THEN UPDATE SET count =
t.count + s.count`` on the word key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from nomenklatura_spark.textops.analysis import corpus_vocab

_VOCAB_SCHEMA = "word string, count long, n_docs long"


class VocabIndexState:
    """Versioned on-disk state: the (word, count, n_docs) relation."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _version_file(self) -> str:
        return os.path.join(self.state_dir, "VERSION")

    def version(self) -> int:
        try:
            with open(self._version_file) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return -1

    def _path(self, version: int) -> str:
        return os.path.join(self.state_dir, "vocab", f"v{version}")

    def _bump(self, version: int) -> None:
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._version_file)

    def vocab(self, version: int | None = None) -> DataFrame:
        v = self.version() if version is None else version
        path = self._path(v)
        if v < 0 or not os.path.exists(path):
            return self.spark.createDataFrame([], _VOCAB_SCHEMA)
        return self.spark.read.parquet(path)

    def top_k(self, k: int = 1000) -> DataFrame:
        """The batch operator's top-k view over the maintained state."""
        return self.vocab().orderBy(F.col("count").desc(), F.col("word")).limit(k)

    def apply_batch(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Fold one micro-batch of new documents into the vocabulary;
        returns the batch's own rollup."""
        batch = corpus_vocab(docs, text_col, id_col, top_k=None).select(
            "word",
            F.col("count").cast("long").alias("count"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        state = self.vocab()
        merged = (
            state.select("word", F.col("count").alias("_sc"), F.col("n_docs").alias("_sd"))
            .join(
                batch.select("word", F.col("count").alias("_bc"), F.col("n_docs").alias("_bd")),
                "word",
                "full_outer",
            )
            .select(
                "word",
                (F.coalesce("_sc", F.lit(0)) + F.coalesce("_bc", F.lit(0))).alias("count"),
                (F.coalesce("_sd", F.lit(0)) + F.coalesce("_bd", F.lit(0))).alias("n_docs"),
            )
        )
        nv = self.version() + 1
        merged.write.mode("overwrite").parquet(self._path(nv))
        self._bump(nv)
        return batch


def maintain_vocab_stream(
    stream: DataFrame,
    state: VocabIndexState,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Structured Streaming driver: each micro-batch folds into the
    vocabulary via ``foreachBatch`` (the versioned-snapshot swap is a
    transaction sinks can't express — same pattern as
    ``maintain_dedup_stream``)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        state.apply_batch(batch, id_col, text_col)

    writer = stream.writeStream.foreachBatch(_process).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
