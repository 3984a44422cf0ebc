"""SemDeDup-style semantic deduplication over embeddings.

Cluster the corpus embeddings with the deterministic IVF k-means codebook
(``ann.ivf.train_centroids``), then find near-duplicate pairs only
*within* each cluster and keep one representative per duplicate group —
the SemDeDup recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023).

Relationship to the other embedding-dedup tiers:

- ``dedup.embedding.embedding_dup_pairs`` — exact all-pairs baseline
  (oracle-scale only; one side must broadcast).
- ``dedup.embedding.embedding_dup_pairs_lsh`` — hyperplane-LSH bucketed
  candidates (recall is probabilistic in the band structure).
- this module — k-means-bucketed candidates: candidate volume is bounded
  by the *cluster* structure of the data, which is exactly the structure
  semantic duplicates concentrate in (the paper's observation), and the
  pruning is interpretable (a pair is only compared when both members
  agree on their nearest centroid).

Spark-first / 100 TB shape:

- The codebook is trained once (a few Lloyd rounds, each one corpus scan
  with centroids broadcast — see ``ann/ivf.py``) and is a tiny 2-column
  frame; production reuses it across batches.
- Cell assignment is a map-side broadcast argmax; the within-cell
  self-join shuffles the corpus ONCE on ``centroid``.  With
  ``n_centroids ~ sqrt(N)`` (the paper uses ~0.1% of N) the expected
  cell size — and therefore the per-cell pair count — stays bounded;
  AQE's skew-join splitting handles lopsided cells.
- No UDFs anywhere: the cosine is a bare dot product on unit-normalized
  vectors — statically unrolled into a codegen expression when ``dim``
  is known (``ann.brute.dot_fixed``), a ``zip_with``/``aggregate``
  column expression otherwise.

Determinism: hash-seeded k-means + round(9) pinning (``ann/ivf.py``)
makes the codebook, assignment, and pair set a pure function of the
data, so the DuckDB oracle replays the identical pipeline (the same
device as ``ann_ivf_topk``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.ann.brute import dot_auto, materialize_local
from nomenklatura_spark.ann.ivf import ivf_assign, train_centroids


def semantic_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_centroids: int | None = None,
    n_iter: int = 2,
    score_decimals: int | None = 6,
    centroids: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs.

    Returns (centroid, lid, rid, cosine_sim) with lid < rid and
    cosine_sim >= threshold, both members assigned to ``centroid``.

    ``n_centroids=None`` derives ceil(sqrt(N)) from the corpus — the
    module's documented scaling rule (cells ∝ corpus keeps the expected
    per-cell pair count bounded), so a 100× corpus fed through the
    default gets 10× the cells instead of oversized ones.  The count is
    one metadata-cheap job; production codebook reuse passes
    ``centroids`` and skips it entirely.
    """
    if centroids is None:
        if n_centroids is None:
            n_centroids = max(1, math.ceil(math.sqrt(corpus.count())))
        # driver-local: the within-cell self-join references the
        # assignment twice, and a lazy codebook would re-run the whole
        # Lloyd chain down both branches
        centroids = materialize_local(
            train_centroids(
                corpus, id_col, vec_col,
                n_centroids=n_centroids, n_iter=n_iter, dim=dim,
            )
        )
    inv = ivf_assign(corpus, centroids, id_col, vec_col, dim=dim)
    a = inv.select(
        F.col("centroid"),
        F.col("id").alias("lid"),
        F.col("vec").alias("l_vec"),
    )
    b = inv.select(
        F.col("centroid"),
        F.col("id").alias("rid"),
        F.col("vec").alias("r_vec"),
    )
    sim = dot_auto(F.col("l_vec"), F.col("r_vec"), dim)
    if score_decimals is not None:
        sim = F.round(sim, score_decimals)
    return (
        a.join(b, "centroid")
        .where(F.col("lid") < F.col("rid"))
        .select("centroid", "lid", "rid", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_centroids: int | None = None,
    n_iter: int = 2,
    centroids: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Keep-list: corpus ids minus the higher-id member of every
    within-cluster duplicate pair (the paper keeps one representative
    per group; min-id is the deterministic choice).  Anti-join — the
    drop set is duplicate-count sized, far smaller than the corpus."""
    pairs = semantic_dup_pairs(
        corpus,
        id_col,
        vec_col,
        threshold,
        n_centroids,
        n_iter,
        score_decimals=6,
        centroids=centroids,
        dim=dim,
    )
    drops = pairs.select(F.col("rid").alias(id_col)).distinct()
    return corpus.join(drops, id_col, "left_anti")


def semantic_dup_pairs_hier(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_coarse: int | None = None,
    n_fine: int | None = None,
    n_iter: int = 2,
    score_decimals: int | None = 6,
    codebooks: tuple[DataFrame, DataFrame] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup over the two-level coarse quantizer
    (``ann.ivf.train_centroids_hier``): same within-cell near-dup
    semantics as ``semantic_dup_pairs``, but assignment costs
    N·(K1+K2) dot products instead of N·K — the scale path once
    sqrt(N) cells stop fitting a single broadcast argmax (SCALE.md).

    Defaults derive K1 = K2 = ceil(N^0.25), so K = K1·K2 ~ sqrt(N)
    keeps the module's cells-∝-sqrt(N) discipline while the assignment
    drops from N^1.5 to 2·N^1.25.  Precision is 1.0 by construction
    (the threshold applies to the true cosine); recall is bounded by the
    cell structure exactly as in the flat variant.
    """
    from nomenklatura_spark.ann.ivf import (
        ivf_assign_hier,
        train_centroids_hier,
    )

    if codebooks is None:
        if n_coarse is None or n_fine is None:
            side = max(1, math.ceil(corpus.count() ** 0.25))
            n_coarse = n_coarse or side
            n_fine = n_fine or side
        codebooks = train_centroids_hier(
            corpus, id_col, vec_col,
            n_coarse=n_coarse, n_fine=n_fine, n_iter=n_iter, dim=dim,
        )
    coarse, fine = codebooks
    inv = ivf_assign_hier(corpus, coarse, fine, id_col, vec_col, dim=dim)
    a = inv.select(
        F.col("centroid"),
        F.col("id").alias("lid"),
        F.col("vec").alias("l_vec"),
    )
    b = inv.select(
        F.col("centroid"),
        F.col("id").alias("rid"),
        F.col("vec").alias("r_vec"),
    )
    sim = dot_auto(F.col("l_vec"), F.col("r_vec"), dim)
    if score_decimals is not None:
        sim = F.round(sim, score_decimals)
    return (
        a.join(b, "centroid")
        .where(F.col("lid") < F.col("rid"))
        .select("centroid", "lid", "rid", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )
