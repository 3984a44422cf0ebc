"""Domain discovery + alpha-sampling mix weights over document embeddings.

The cluster-based data-mixing step of a pretraining pipeline: discover
latent domains by clustering document embeddings (the DoReMi /
cluster-conditioned sampling shape), then assign every document a
sampling weight that flattens the domain distribution with the
multilingual **alpha-sampling** rule (sample domain j with probability
``share_j^α / Σ_k share_k^α``; per-document weight = that probability
divided by the domain's natural share, so α=1 is corpus-natural and
α→0 approaches uniform-over-domains).

Spark-first shape — everything reuses the deterministic k-means tier:

- clustering is ``ann.ivf.train_centroids`` (md5-seeded Lloyd rounds,
  9dp-rounded codebook — the oracle-proven contract) plus one
  broadcast-argmax assignment pass; no vector ever shuffles;
- the per-cluster size table is k rows — the alpha reweighting is pure
  relational arithmetic on that tiny frame, broadcast back onto the
  assignment;
- at 100 TB: train on the corpus (n_iter scans, partial-agg updates),
  one assignment scan, one k-row aggregate.  The weight join is a
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.ann.brute import materialize_local
from nomenklatura_spark.ann.ivf import ivf_assign, train_centroids


def alpha_mix_weights(sizes: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(centroid, cluster_size) → + (mix_weight): alpha-flattened
    sampling weight relative to natural sampling.

    ``share^α`` is rounded to 9dp before the normalizer sum (pow is the
    one per-engine-libm term; the 9dp round pins it — same device as
    every Lloyd/IDF round in this repo), the final weight to 6dp.
    """
    tot = sizes.agg(F.sum("cluster_size").alias("_n"))
    shared = sizes.crossJoin(F.broadcast(tot)).select(
        "centroid",
        "cluster_size",
        (F.col("cluster_size") / F.col("_n")).alias("_share"),
        F.round(F.pow(F.col("cluster_size") / F.col("_n"), alpha), 9).alias(
            "_sh_a"
        ),
    )
    z = shared.agg(F.sum("_sh_a").alias("_z"))
    return shared.crossJoin(F.broadcast(z)).select(
        "centroid",
        "cluster_size",
        F.round(F.col("_sh_a") / F.col("_z") / F.col("_share"), 6).alias(
            "mix_weight"
        ),
    )


def domain_clusters(
    emb: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 2,
    alpha: float = 0.5,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """One row per document: (id, cluster, cluster_size, mix_weight).

    ``emb`` is any (id, vector) frame — typically
    ``textops.embed.hashed_embeddings`` output, or a real model's
    embedding column at production scale.  Pass pre-trained
    ``centroids`` (train once on a sample, assign many batches — the
    ``ivfpq_topk`` codebook-reuse shape) to skip in-call training;
    training is hash-seeded and round(9)-pinned, so a retrain
    reproduces the identical codebook.
    """
    if centroids is None:
        centroids = materialize_local(
            train_centroids(
                emb, id_col, vec_col, n_centroids=n_clusters, n_iter=n_iter
            )
        )
    # consumed twice by the returned plan (the size aggregate and the
    # weight join) — localCheckpoint so the embed+assign lineage runs
    # once, and the blocks release with the plan (not the session)
    inv = (
        ivf_assign(emb, centroids, id_col, vec_col)
        .select("centroid", "id")
        .localCheckpoint(eager=True)
    )
    sizes = inv.groupBy("centroid").agg(F.count("*").alias("cluster_size"))
    # k rows — a driver-local relation, so the returned plan is exactly
    # (checkpointed assignment) ⋈ (broadcast weight table) + sort
    weights = materialize_local(alpha_mix_weights(sizes, alpha))
    return inv.join(F.broadcast(weights), "centroid").select(
        F.col("id"),
        F.col("centroid").alias("cluster"),
        "cluster_size",
        "mix_weight",
    )
