"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline (broadcast the query side,
scan the corpus once, per-query top-k window); the LSH/IVF variants in
``ann.lsh`` are the 100 TB scale path and use this as their oracle.

The dot product is a pure column expression (``zip_with`` + ``aggregate``)
— stays in codegen, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalized(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str
) -> DataFrame:
    """(id, unit-norm vector) — cosine of normalized vecs = plain dot.

    Normalizing ONCE per vector before a pair join turns the per-pair
    cosine (3 array passes) into a single dot product — at N² pairs the
    per-pair savings dominate the one extra map pass.  The norm is
    materialised as a column first so it isn't recomputed per element.
    """
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_n", l2_norm(F.col("_v")))
        .select(
            out_id,
            F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias(out_vec),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small relative to ``corpus`` → broadcast,
    so the corpus is scanned exactly once with no shuffle of the big side;
    the per-query top-k window then shuffles only (query, candidate, score)
    triples. Scores are rounded *before* ranking so ordering is stable
    across engines/precisions; ties break on candidate id.
    """
    q = normalized(queries, id_col, vec_col, "query_id", "q_vec")
    # repartition the corpus side: a single parquet file otherwise scans
    # as one partition and the whole N·M dot-product grid runs serially
    c = normalized(corpus, id_col, vec_col, "neighbor_id", "c_vec").repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    sim = dot(F.col("q_vec"), F.col("c_vec"))
    if score_decimals is not None:
        sim = F.round(sim, score_decimals)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
