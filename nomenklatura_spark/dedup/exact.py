"""Exact deduplication — hash-groupBy (SURVEY.md extensions).

The cheapest dedup tier for a 100 TB corpus: one shuffle on a 128-bit
content hash. No UDFs; the hash and the group-by run entirely in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_hash(col, normalize: bool = False):
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.regexp_replace(F.lower(c), r"\s+", " ")
    return F.md5(c)


def exact_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = False
) -> DataFrame:
    """Groups of exact duplicates: (content_hash, n_dups, canonical_id)
    for every hash appearing more than once; canonical = min id."""
    return (
        df.select(F.col(id_col).alias("id"), content_hash(text_col, normalize).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("id").alias("canonical_id"))
        .where(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str, normalize: bool = False) -> DataFrame:
    """Keep one representative (min id) per content hash.

    Implemented as a min-id window-free aggregation + semi-join back, so the
    full rows only flow through the join, not the aggregation.
    """
    keep = (
        df.select(F.col(id_col).alias(id_col), content_hash(text_col, normalize).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
