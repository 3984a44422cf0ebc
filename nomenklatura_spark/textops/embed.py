"""Deterministic text featurizer: hashed bag-of-words embeddings.

Gives the documents table an ``array<double>`` embedding column with no
model dependency — the feature-hashing trick (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML 2009): each word maps
to bucket ``md5(word) % dim`` with a ±1 sign from another md5 bit, the
document vector is the signed count histogram, L2-normalized.  Useful as
the cheap first-tier representation for the ANN / semantic-dedup
operators, and as the plumbing template a real encoder drops into (swap
the histogram for model inference, keep the schema).

Spark-first shape: one word explode, one (doc, bucket) aggregation, one
per-doc array assembly — two shuffles, no UDFs (md5/conv/map built-ins),
engine-portable by construction so the DuckDB oracle replays it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_SPLIT = r"[^\p{L}\p{N}']+"


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), WORD_SPLIT), lambda w: w != "")


def hashed_embeddings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    decimals: int = 6,
) -> DataFrame:
    """(id, embedding array<double>) — signed hashed word counts,
    L2-normalized, components rounded for cross-engine stability.
    Documents with no words yield the zero vector."""
    words = docs.select(
        F.col(id_col).alias("id"), F.explode_outer(_words(F.col(text_col))).alias("w")
    )
    bucket = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long") % dim
    sign = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("sgn:"), F.col("w"))), 1, 2), 16, 10)
        .cast("int") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    hist = (
        words.where(F.col("w").isNotNull())
        .select("id", bucket.alias("b"), sign.alias("s"))
        .groupBy("id", "b")
        .agg(F.sum("s").alias("v"))
    )
    per_doc = hist.groupBy("id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("b"), F.col("v"))))
        ).alias("m")
    )
    # Stage the projections: expressions referenced inside higher-order
    # lambdas are NOT CSE'd (SCALE.md "Generate-node pitfalls"), so the
    # dense gather and the norm aggregate must be bound to columns before
    # the normalizing transform references them — inlined, the map gather
    # re-ran once per element inside the norm fold and the norm fold once
    # per element inside the final transform (measured 3.7s -> ~1s at
    # sf0.1).
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at(F.col("m"), j.cast("long")), F.lit(0.0)),
    )
    staged = per_doc.select("id", dense.alias("_dense")).select(
        "id",
        "_dense",
        F.sqrt(
            F.aggregate(F.col("_dense"), F.lit(0.0), lambda a, x: a + x * x)
        ).alias("_norm"),
    )
    emb = F.transform(
        F.col("_dense"),
        lambda x: F.round(x / F.greatest(F.col("_norm"), F.lit(1e-12)), decimals),
    )
    out = staged.select("id", emb.alias("embedding"))
    # keep wordless docs with a zero vector (left join back on ids)
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    zero = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0)
    )
    return (
        all_ids.join(out, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("embedding"), zero).alias("embedding"),
        )
    )
