"""Document chunking and PII scrubbing — training-data pipeline stages.

Neither exists in the reference (an ER engine); both are core operations
of an LLM data pipeline over the ``documents`` table and are implemented
as pure column expressions (whole-stage codegen, no UDFs) with exact
DuckDB oracle mirrors.

- **Chunking**: fixed word windows with overlap (``words_per_chunk`` /
  ``stride``), the standard pretraining-corpus shape.  One map-side
  ``sequence`` + ``transform`` + ``explode`` — no shuffle; at 100 TB the
  explosion factor is bounded by ``ceil(words/stride)`` per document and
  rides the scan partitioning.
- **PII scrubbing**: conservative regex classes (email, IPv4, long digit
  runs as phone-ish) counted and redacted with ``regexp_replace``.  The
  patterns avoid constructs that differ between Java regex (Spark) and
  RE2 (DuckDB) so both engines rewrite identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORDS_PER_CHUNK = 64
CHUNK_STRIDE = 48

# Portable between Java regex and RE2 (no lookarounds, no \b edge cases
# beyond ASCII).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9()./ -]{7,}[0-9]",
}
PII_REPLACEMENT = "[PII:{kind}]"


def _words(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_chunk: int = WORDS_PER_CHUNK,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(doc_id, chunk_idx, n_words, chunk_hash, chunk_text) — overlapping
    word windows; the final window is the last stride-aligned start so the
    tail is always covered."""
    w = F.lit(words_per_chunk)
    s = F.lit(stride)
    words = _words(F.col(text_col))
    n = F.size(words)
    last_start = (
        F.ceil(F.greatest(n - w, F.lit(0)).cast("double") / s).cast("int") * s
    )
    starts = F.sequence(F.lit(0), last_start, s)
    chunks = F.transform(
        starts,
        lambda st: F.struct(
            (st / s).cast("int").alias("chunk_idx"),
            F.array_join(F.slice(words, st + 1, w), " ").alias("chunk_text"),
        ),
    )
    out = (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
        .withColumn("n_words", F.size(_words(F.col("chunk_text"))))
        .withColumn("chunk_hash", F.md5(F.col("chunk_text")))
    )
    return out.select(id_col, "chunk_idx", "n_words", "chunk_hash", "chunk_text")


def pii_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + the scrubbed text's hash.

    Counts use ``regexp_count``-equivalent semantics via split; redaction
    applies the classes in a fixed order (email first, so user@host is
    not half-eaten by the phone class)."""
    text = F.col(text_col)
    counts = []
    scrubbed = text
    for kind, pattern in PII_PATTERNS.items():
        counts.append(
            (F.size(F.split(text, pattern)) - 1).alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(
            scrubbed, pattern, PII_REPLACEMENT.format(kind=kind)
        )
    return df.select(
        F.col(id_col),
        *counts,
        F.md5(scrubbed).alias("scrubbed_hash"),
    )
