"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for ``ann.brute`` (alongside ``ann.lsh``): partition
the vector space into ``n_centroids`` Voronoi cells via k-means, store
each corpus vector in its cell's inverted list, and at query time probe
only the ``n_probe`` nearest cells — the classic IVF-Flat layout
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — the coarse-quantizer stage, without PQ compression).

Spark-first shape:

- **Training** is a few Lloyd iterations expressed as DataFrame ops:
  assignment = argmin over a broadcast centroid table (``min_by`` over a
  posexplode-free cross join), update = per-(cluster, dim) mean via
  ``posexplode`` + ``groupBy(cluster, pos).avg``.  Centroids are tiny
  (k × dim doubles) so they always broadcast; the corpus is scanned once
  per iteration with no shuffle of the vectors themselves.
- **Determinism**: initial centroids are the k corpus vectors with the
  smallest ``md5(id)`` — no RNG, so every engine/retry trains the same
  codebook (same device as the LSH plane derivation).  Lloyd updates are
  averages — order-independent.
- **At 100 TB** the assignment pass is the only full scan; the inverted
  list is written partitioned by ``centroid`` so a query probing p cells
  prunes to p partitions (partition pruning on the cell id — the same
  effect as FAISS's contiguous inverted lists).  Queries broadcast; only
  probed cells' vectors are scored.

Output schema matches ``brute.cosine_topk`` so the exact result is a
drop-in recall oracle (see tests/test_multimodal_ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nomenklatura_spark.ann.brute import (
    dot_auto as _dot,
    materialize_local,
    normalized,
)


def _argmin_centroid(
    vec_df: DataFrame, centroids: DataFrame, dim: int | None = None
) -> DataFrame:
    """Assign each (id, vec) row to its nearest centroid by cosine
    (vectors and centroids are unit-norm → max dot product)."""
    # round(9) before the argmax: double summation order differs between
    # engines (and between partitionings) by ~1 ulp, which must not flip
    # a cell assignment — the DuckDB oracle replays this exact pipeline.
    scored = vec_df.crossJoin(F.broadcast(centroids)).select(
        "id",
        "vec",
        "centroid",
        F.round(_dot(F.col("vec"), F.col("c_vec"), dim), 9).alias("sim"),
    )
    return scored.groupBy("id").agg(
        F.max_by("centroid", F.struct(F.col("sim"), -F.col("centroid"))).alias(
            "centroid"
        ),
        F.first("vec").alias("vec"),
    )


def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iter: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """K-means codebook: (centroid int, c_vec array<double>), unit-norm.

    Seeds = the ``n_centroids`` vectors with smallest md5(id); then
    ``n_iter`` Lloyd rounds (assign → per-dimension mean → renormalize).

    The Lloyd update stays in the exploded two-aggregation form
    (posexplode → avg per (centroid, pos) → array reassembly): a
    single-shuffle variant with ``dim`` per-dimension ``avg(vec[i])``
    aggregates was measured 5× SLOWER at dim=64 — the 64-buffer
    aggregate falls out of whole-stage codegen (huge-method limit) into
    interpreted evaluation, while the exploded form's two tiny shuffles
    stay fully code-generated.  (``dim`` is accepted for API symmetry
    with the PQ trainer, where sub_dim is small enough for the
    single-shuffle form to win.)
    """
    vecs = normalized(corpus, id_col, vec_col, "id", "vec").persist()
    # Seed selection as orderBy().limit(k): a distributed TakeOrdered
    # (per-partition top-k, merged on the driver) — the equivalent
    # unpartitioned row_number window funnels the WHOLE corpus through
    # one sort task.  The rank is then assigned by a window over the k
    # seed rows only.
    w = Window.orderBy("_h", "id")
    centroids = (
        vecs.select(
            F.md5(F.col("id").cast("string")).alias("_h"), "id", "vec"
        )
        .orderBy("_h", "id")
        .limit(n_centroids)
        .withColumn("_rk", F.row_number().over(w))
        .select((F.col("_rk") - 1).alias("centroid"), F.col("vec").alias("c_vec"))
    )
    for _ in range(n_iter):
        assigned = _argmin_centroid(vecs, centroids, dim)
        means = (
            assigned.select("centroid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("centroid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pm")
            )
            .select(
                "centroid", F.transform("pm", lambda s: s["m"]).alias("raw")
            )
        )
        norm = F.sqrt(
            F.aggregate(F.col("raw"), F.lit(0.0), lambda a, v: a + v * v)
        )
        # round(9) pins the codebook across engines/partitionings (the
        # per-dimension avg is the other ulp-divergence source)
        centroids = means.select(
            "centroid",
            F.transform(
                "raw", lambda x: F.round(x / F.greatest(norm, F.lit(1e-12)), 9)
            ).alias("c_vec"),
        )
    vecs.unpersist()
    return centroids


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The inverted list: (centroid, id, vec) — written partitioned by
    ``centroid`` at rest so probes prune partitions."""
    vecs = normalized(corpus, id_col, vec_col, "id", "vec")
    return _argmin_centroid(vecs, centroids, dim).select("centroid", "id", "vec")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    score_decimals: int | None = 6,
    centroids: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors: probe the ``n_probe`` nearest
    cells per query, exact-rank within the probed lists.

    Pass a pre-trained ``centroids`` frame to skip training (production
    shape: train once on a sample, reuse the codebook for every query
    batch — the codebook is a plain 2-column DataFrame on disk).
    """
    if centroids is None:
        # materialized locally: training runs once, nothing persists
        # past the call (caller-supplied codebooks are used as-is —
        # re-persisting them here leaked the caller's frames)
        centroids = materialize_local(
            train_centroids(
                corpus, id_col, vec_col,
                n_centroids=n_centroids, n_iter=n_iter, dim=dim,
            )
        )
    inv = ivf_assign(corpus, centroids, id_col, vec_col, dim=dim)

    q = normalized(queries, id_col, vec_col, "query_id", "q_vec")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid")
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "q_vec",
            "centroid",
            F.round(_dot(F.col("q_vec"), F.col("c_vec"), dim), 9).alias("c_sim"),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "q_vec", "centroid")
    )

    sim = _dot(F.col("q_vec"), F.col("vec"), dim)
    if score_decimals is not None:
        sim = F.round(sim, score_decimals)
    scored = (
        F.broadcast(probes)
        .join(inv, "centroid")
        .where(F.col("id") != F.col("query_id"))
        # each corpus vector lives in exactly one cell, so (query, neighbor)
        # appears at most once — no dedup needed
        .select(
            "query_id", F.col("id").alias("neighbor_id"), sim.alias("cosine_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# --- hierarchical (two-level) coarse quantizer ------------------------------
#
# The flat codebook's assignment pass costs N·K dot products.  Under the
# sqrt(N)-cells discipline (SemDeDup, SURVEY §2 extensions) that is
# N^1.5 — measured as the dominant super-linear term in the replication
# probes (SCALE.md).  The standard fix (FAISS IMI / two-level IVF) is a
# tree: assign to one of K1 coarse cells, then to one of that cell's K2
# sub-cells, giving K = K1·K2 effective cells for N·(K1+K2) dot
# products — with K1 = K2 = K^0.5 the assignment drops from N·K to
# 2·N·sqrt(K).  Training and assignment stay pure DataFrame ops: the
# fine codebook is a (coarse, centroid, c_vec) table, and the per-vector
# fine argmax is an equi-join on the coarse id (each vector only ever
# meets its own cell's K2 sub-centroids) — broadcastable as long as
# K1·K2·dim doubles fit an executor (64k cells × 64 dims = 32 MB).


def train_centroids_hier(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_coarse: int = 8,
    n_fine: int = 8,
    n_iter: int = 2,
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Two-level codebook: a flat coarse codebook plus, per coarse cell,
    a fine codebook trained on that cell's members only.

    Returns ``(coarse, fine)``: ``coarse`` is ``(centroid, c_vec)`` as
    from ``train_centroids``; ``fine`` is ``(coarse, centroid, c_vec)``
    with ``centroid`` globally unique (``coarse * n_fine + local``).
    Determinism: same md5-seeded device as the flat trainer, applied
    per cell (seeds are each cell's ``n_fine`` smallest-md5 members).
    """
    # both returned codebooks are driver-local relations: training runs
    # once, broadcasts are free, and no persisted block outlives the call
    coarse = materialize_local(
        train_centroids(
            corpus, id_col, vec_col, n_centroids=n_coarse, n_iter=n_iter, dim=dim
        )
    )
    assigned = ivf_assign(corpus, coarse, id_col, vec_col, dim=dim).select(
        F.col("centroid").alias("coarse"), "id", "vec"
    ).persist()
    w = Window.partitionBy("coarse").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    fine = (
        assigned.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_fine)
        .select(
            "coarse",
            (F.col("coarse") * n_fine + F.col("_rk") - 1).alias("centroid"),
            F.col("vec").alias("c_vec"),
        )
    )
    # Coverage guarantee: every coarse cell carries at least one fine
    # sub-centroid, even if it had zero members at seeding (possible after
    # the coarse Lloyd update) — otherwise a vector whose coarse argmax
    # lands there would vanish through the assignment equi-join, and the
    # codebook-reuse paths (`ivf_assign_hier` / `semantic_dup_pairs_hier`
    # with pre-trained codebooks; the flat `ivfpq_topk` coarse path is
    # immune — its assignment is a cross-join argmax, not an equi-join)
    # would silently lose new vectors.  The empty
    # cell's fine centroid is the coarse centroid itself.
    fine = fine.unionByName(
        coarse.select(
            F.col("centroid").alias("coarse"),
            (F.col("centroid") * n_fine).alias("centroid"),
            "c_vec",
        ).join(fine.select("coarse").distinct(), "coarse", "left_anti")
    )
    for _ in range(n_iter):
        scored = assigned.join(F.broadcast(fine), "coarse").select(
            "id",
            "vec",
            "centroid",
            F.round(_dot(F.col("vec"), F.col("c_vec"), dim), 9).alias("sim"),
        )
        fassigned = scored.groupBy("id").agg(
            F.max_by(
                "centroid", F.struct(F.col("sim"), -F.col("centroid"))
            ).alias("centroid"),
            F.first("vec").alias("vec"),
        )
        means = (
            fassigned.select("centroid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("centroid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pm")
            )
            .select(
                "centroid", F.transform("pm", lambda s: s["m"]).alias("raw")
            )
        )
        norm = F.sqrt(
            F.aggregate(F.col("raw"), F.lit(0.0), lambda a, v: a + v * v)
        )
        updated = means.select(
            "centroid",
            F.transform(
                "raw", lambda x: F.round(x / F.greatest(norm, F.lit(1e-12)), 9)
            ).alias("new_vec"),
        )
        # A fine cell that lost all members keeps its previous centroid
        # vector (left join + coalesce) so coverage survives every
        # Lloyd iteration.
        fine = fine.join(updated, "centroid", "left").select(
            "coarse",
            "centroid",
            F.coalesce("new_vec", "c_vec").alias("c_vec"),
        )
    # materialize the fine book BEFORE dropping the assignment cache: the
    # fine plan's Lloyd chain reads `assigned` n_iter times, and a lazy
    # return would re-run that chain (against an unpersisted `assigned`)
    # on every downstream action
    fine = materialize_local(fine)
    assigned.unpersist()
    return coarse, fine


def ivf_assign_hier(
    corpus: DataFrame,
    coarse: DataFrame,
    fine: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Two-level inverted list: (centroid, id, vec), ``centroid`` being
    the globally-unique fine cell.  Cost: N·K1 dots for the coarse
    argmax (broadcast cross join), then N·K2 for the fine argmax (an
    equi-join on the coarse id — each vector only scores its own cell's
    sub-centroids)."""
    vecs = normalized(corpus, id_col, vec_col, "id", "vec")
    with_coarse = _argmin_centroid(vecs, coarse, dim).select(
        F.col("centroid").alias("coarse"), "id", "vec"
    )
    scored = with_coarse.join(F.broadcast(fine), "coarse").select(
        "id",
        "vec",
        "centroid",
        F.round(_dot(F.col("vec"), F.col("c_vec"), dim), 9).alias("sim"),
    )
    return scored.groupBy("id").agg(
        F.max_by(
            "centroid", F.struct(F.col("sim"), -F.col("centroid"))
        ).alias("centroid"),
        F.first("vec").alias("vec"),
    ).select("centroid", "id", "vec")
