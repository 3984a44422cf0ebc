"""Replication scale probes for the round-2 dedup operators.

Measures wall time (second run, noop sink) for:

- ``doc_dup_passages`` over the sf0.1 documents replicated 1x/4x/10x with
  distinct doc ids (text verbatim — the window-hash shuffle volume is what
  scales; cross-replica duplication only flips the is_dup bit).
- ``semantic_dup_pairs`` over sf0.1 embeddings replicated with a
  deterministic per-replica direction perturbation (plain copies would be
  cosine-1.0 dups and measure output explosion, not clustering cost),
  with ``n_centroids`` scaled with N (the SemDeDup operating discipline:
  cells ∝ corpus so per-cell pair volume stays bounded).

Run: PYTHONPATH=/root/repo python tools/scale_probe.py
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.session import get_spark, load_table

SF_DIR = "/root/testdata/sf0.1"


def replicate_docs(docs: DataFrame, n: int) -> DataFrame:
    if n == 1:
        return docs
    reps = docs.sparkSession.range(n).select(F.col("id").alias("_rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
        "text",
    )


def replicate_vecs(emb: DataFrame, n: int) -> DataFrame:
    if n == 1:
        return emb
    reps = emb.sparkSession.range(n).select(F.col("id").alias("_rep"))
    out = emb.crossJoin(reps)
    # deterministic per-(replica, dimension) nudge; re-normalization
    # happens inside the operator
    vec = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: x + 0.05 * F.sin((F.col("_rep") + 1) * (i + 1)),
    )
    return out.select(
        (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
        vec.alias("embedding"),
    )


def timed(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("scale-probe", cpus=32, shuffle_partitions=32)
    from nomenklatura_spark.dedup.semantic import semantic_dup_pairs
    from nomenklatura_spark.dedup.substring import duplicated_passages

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").persist()
    docs.count()
    for n in (1, 4, 10):
        d = replicate_docs(docs, n).persist()
        rows = d.count()
        out = duplicated_passages(d)
        wall = timed(out)
        print(f"doc_dup_passages {n}x: {rows} docs, wall {wall:.2f}s")
        d.unpersist()

    docs2 = load_table(spark, SF_DIR, "documents").select("doc_id", "text").persist()
    from nomenklatura_spark.textops.embed import hashed_embeddings

    for n in (1, 4, 10):
        d = replicate_docs(docs2, n).persist()
        rows = d.count()
        wall = timed(hashed_embeddings(d))
        print(f"doc_embed {n}x: {rows} docs, wall {wall:.2f}s")
        d.unpersist()

    emb = load_table(spark, SF_DIR, "embeddings").persist()
    emb.count()
    from pyspark.sql import functions as F2
    from nomenklatura_spark.ann.pq import pq_topk

    for n in (1, 4, 10):
        e = replicate_vecs(emb, n).persist()
        rows = e.count()
        queries = e.where(F2.col("vec_id") % 997 == 0)
        nq = queries.count()
        t0 = time.perf_counter()
        npairs = pq_topk(e, queries, k=5, m=16, dim=64, rerank=50).count()
        wall = time.perf_counter() - t0
        print(f"pq_topk {n}x: {rows} vecs, {nq} queries, {npairs} rows, wall {wall:.2f}s")
        e.unpersist()

    for n, cells in ((1, 16), (4, 64), (10, 160)):
        e = replicate_vecs(emb, n).persist()
        rows = e.count()
        pairs = semantic_dup_pairs(e, threshold=0.35, n_centroids=cells)
        t0 = time.perf_counter()
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        print(
            f"semantic_dedup {n}x: {rows} vecs, {cells} cells, "
            f"{n_pairs} pairs, wall {wall:.2f}s"
        )
        e.unpersist()


if __name__ == "__main__":
    main()
