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

from pyspark.sql import DataFrame, Window, functions as F

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


def cluster_keywords(
    docs: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster",
    top_k: int = 10,
    assign_id_col: str = "id",
) -> DataFrame:
    """Class-based TF-IDF keyword extraction per discovered cluster —
    the c-TF-IDF topic-labeling step (Grootendorst 2022, the BERTopic
    reduction): treat each cluster's concatenated text as one document,
    score word w in cluster c as ``tf_{w,c} * ln(1 + A / f_w)`` with
    ``A`` the average token count per cluster and ``f_w`` the
    corpus-wide frequency of w, and keep each cluster's ``top_k``
    words.  This is what turns `domain_clusters`' opaque cluster ids
    into auditable labels ("cluster 3 = legalese") when curating a
    training mixture.

    Returns (cluster, rank, word, tf, score) — score rounded to 6dp
    BEFORE ranking so the top-k cut is engine-stable; ties break by
    word.

    Scale shape: one token explode + (cluster, word) partial-agg
    shuffle, one word-keyed partial agg for corpus frequencies, the
    scalar A as a broadcast one-row relation, and a WindowGroupLimit-
    bounded top-k per cluster — no relation ever exceeds the (cluster
    x vocabulary) grain, and the docs relation is read once.
    """
    from nomenklatura_spark.textops.analysis import words

    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            # explode_outer + null filter, NOT plain explode: the
            # generate-inferred size()>0 prefilter would duplicate the
            # split/filter expression into the scan (dedup/ngram.py's
            # measured pessimization)
            F.explode_outer(words(F.col(text_col))).alias("w"),
        )
        .where(F.col("w").isNotNull())
    )
    assigned = tok.join(
        assignments.select(
            F.col(assign_id_col).alias("id"),
            F.col(cluster_col).alias("_c"),
        ),
        "id",
    )
    tf = assigned.groupBy("_c", "w").agg(F.count(F.lit(1)).alias("tf"))
    # consumed by the corpus-frequency aggregate AND the score join:
    # checkpoint so the token shuffle runs once, blocks release with
    # the returned plan
    tf = tf.localCheckpoint(eager=True)
    fw = tf.groupBy("w").agg(F.sum("tf").alias("fw"))
    avg_cluster = F.broadcast(
        tf.agg(
            (
                F.sum("tf") / F.count_distinct("_c")
            ).alias("_a")
        )
    )
    scored = (
        tf.join(fw, "w")
        .crossJoin(avg_cluster)
        .select(
            "_c",
            "w",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(1.0) + F.col("_a") / F.col("fw")),
                6,
            ).alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("_c").orderBy(F.col("score").desc(), "w")
    )
    return (
        scored.withColumn("rank", rk)
        .where(F.col("rank") <= top_k)
        .select(
            F.col("_c").alias(cluster_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("word"),
            F.col("tf").cast("long").alias("tf"),
            "score",
        )
    )
