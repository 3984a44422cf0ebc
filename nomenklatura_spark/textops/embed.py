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
    # The norm is computed RELATIONALLY over the sparse histogram rows,
    # not by folding the dense vector: the bucket values are sums of ±1
    # — integer-valued doubles — so Σv² is exact regardless of summation
    # order (no round-trip through an interpreted 64-step aggregate
    # lambda, and no float-order ambiguity for the cross-engine hash).
    # That leaves ONE higher-order pass: a single transform fusing the
    # map gather, the divide, and the round.  HOF lambdas run
    # interpreted (outside whole-stage codegen) and are not CSE'd
    # (SCALE.md "Generate-node pitfalls"), so collapsing the previous
    # three chained passes (gather → norm fold → divide) into one was
    # measured 3.4s -> 2.1s for the full query at sf0.1.
    per_doc = hist.groupBy("id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("b"), F.col("v"))))
        ).alias("m"),
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("_norm"),
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.round(
            F.coalesce(F.element_at(F.col("m"), j.cast("long")), F.lit(0.0))
            / F.greatest(F.col("_norm"), F.lit(1e-12)),
            decimals,
        ),
    )
    out = per_doc.select("id", emb.alias("embedding"))
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
