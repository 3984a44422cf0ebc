"""Product-quantization ANN (the memory-compression scale path).

IVF-Flat (``ann/ivf.py``) prunes which vectors are SCORED; product
quantization shrinks what is STORED: each unit-normalized vector is
split into ``m`` contiguous subvectors, each quantized to one of ``k``
per-subspace centroids, so a corpus vector becomes ``m`` small codes
(m=4, k=16 → 4 bytes against 256 bytes of float32 — the PQ half of
Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011).  Query scoring is the asymmetric distance computation:
``<q, x> ≈ Σ_s <q_s, c_{s, code_s(x)}>`` — per query a tiny
(m × k) lookup table of subspace dot products, then a sum over the
corpus codes.

Spark-first / 100 TB shape:

- Training is per-subspace k-means with L2 assignment, expressed as
  DataFrame ops (broadcast codebooks, one corpus scan per Lloyd round);
  codebooks are tiny (m·k·d/m doubles) and train on a sample in
  production (pass ``codebooks=``).
- The corpus is scanned ONCE to encode; afterwards every query batch
  touches only the (id, sub, code) relation — ``m`` small-int columns,
  never the vectors.  Scoring is codes ⋈ broadcast LUT (m·k rows per
  query) + a partial-aggregated sum: no shuffle carries a vector.
- Determinism: hash-seeded k-means, round(9) on distances/centroid
  components and round(6) on final scores — the same cross-engine
  pinning device as IVF, which is what makes the DuckDB oracle
  (``plans/queries._ann_pq_sql``) replayable.

Accuracy note: PQ is a lossy code — the recall-vs-brute pytest bounds
the loss; IVF and PQ compose in production (this module keeps them
separate so each is oracle-checkable on its own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nomenklatura_spark.ann.brute import (
    dot_auto,
    materialize_local,
    normalized,
)


def _sq_l2(a, b, dim: int):
    """round(|a|² - 2<a,b> + |b|², 9) — the exact arithmetic the oracle
    replays (term order matters for cross-engine float equality).
    Unrolled dots (bit-identical to the fold) keep the |corpus|·m·k
    assignment loop inside codegen."""
    return F.round(
        dot_auto(a, a, dim) - 2 * dot_auto(a, b, dim) + dot_auto(b, b, dim), 9
    )


def _subvecs(vec_col, m: int, sub_dim: int):
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.slice(vec_col, s * sub_dim + 1, sub_dim).alias("sv"),
                )
                for s in range(m)
            ]
        )
    )


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Per-subspace codebooks: (sub, centroid, c_vec), L2 Lloyd rounds,
    hash-seeded, round(9)-pinned, NOT renormalized (subvectors of a unit
    vector are not unit)."""
    sub_dim = dim // m
    vecs = normalized(corpus, id_col, vec_col, "id", "vec")
    subs = vecs.select("id", _subvecs(F.col("vec"), m, sub_dim).alias("x")).select(
        "id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv")
    ).persist()
    # Per-sub seeds are ranked by md5(id) — an ordering independent of
    # the subspace, so the seed ID SET is identical for every sub: pick
    # it once with a distributed TakeOrdered (orderBy + limit) and join,
    # instead of a per-sub row_number window whose m partitions each
    # full-sort the corpus.
    seed_ids = (
        vecs.select(F.md5(F.col("id").cast("string")).alias("_h"), "id")
        .orderBy("_h", "id")
        .limit(k)
        .withColumn("_rk", F.row_number().over(Window.orderBy("_h", "id")))
        .select("id", (F.col("_rk") - 1).alias("centroid"))
    )
    books = subs.join(F.broadcast(seed_ids), "id").select(
        "sub", "centroid", F.col("sv").alias("c_vec")
    )
    for _ in range(n_iter):
        # _pq_assign carries sv through, so the Lloyd update is ONE
        # groupBy with sub_dim per-dimension avg aggregates — no join
        # back to subs, no posexplode row blow-up, no second shuffle
        # (round(9) absorbs the partitioning-order summation delta, same
        # discipline as ivf.train_centroids)
        assigned = _pq_assign(subs, books, sub_dim, keep_sv=True)
        books = (
            assigned.groupBy("sub", "centroid")
            .agg(
                *[
                    F.avg(F.col("sv")[i]).alias(f"_m{i}")
                    for i in range(sub_dim)
                ]
            )
            .select(
                "sub",
                "centroid",
                F.array(
                    *[F.round(F.col(f"_m{i}"), 9) for i in range(sub_dim)]
                ).alias("c_vec"),
            )
        )
    subs.unpersist()
    return books


def _pq_assign(
    subs: DataFrame, books: DataFrame, sub_dim: int, keep_sv: bool = False
) -> DataFrame:
    """(id, sub) → nearest centroid code by squared L2."""
    scored = subs.join(F.broadcast(books), "sub").select(
        "id",
        "sub",
        "sv",
        "centroid",
        _sq_l2(F.col("sv"), F.col("c_vec"), sub_dim).alias("d2"),
    )
    aggs = [
        F.min_by("centroid", F.struct(F.col("d2"), F.col("centroid"))).alias(
            "centroid"
        )
    ]
    if keep_sv:
        aggs.append(F.first("sv").alias("sv"))
    return scored.groupBy("id", "sub").agg(*aggs)


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """The compressed corpus: (id, sub, code) — m small ints per vector."""
    sub_dim = dim // m
    vecs = normalized(corpus, id_col, vec_col, "id", "vec")
    subs = vecs.select("id", _subvecs(F.col("vec"), m, sub_dim).alias("x")).select(
        "id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv")
    )
    return _pq_assign(subs, codebooks, sub_dim).select(
        "id", "sub", F.col("centroid").alias("code")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    n_centroids: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    codebooks: DataFrame | None = None,
    rerank: int = 0,
) -> DataFrame:
    """Approximate top-k by asymmetric PQ inner product: corpus codes ⋈
    per-query broadcast LUT, summed per (query, id).

    ``rerank > 0`` keeps the top-``rerank`` PQ candidates per query and
    re-scores them with the EXACT dot product (the "+R" re-ranking of
    IVFADC+R) — only the candidate ids' full vectors are touched, so the
    re-rank reads ``|queries| × rerank`` vectors regardless of corpus
    size."""
    sub_dim = dim // m
    if codebooks is None:
        # driver-local: trains once, no persisted block outlives the call
        # (caller-supplied codebooks are used as-is — re-persisting them
        # here leaked the caller's frames)
        codebooks = materialize_local(
            train_pq_codebooks(corpus, id_col, vec_col, m, n_centroids, n_iter, dim)
        )
    codes = pq_encode(corpus, codebooks, id_col, vec_col, m, dim)

    q = normalized(queries, id_col, vec_col, "query_id", "q_vec")
    q_subs = q.select(
        "query_id", _subvecs(F.col("q_vec"), m, sub_dim).alias("x")
    ).select("query_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("qv"))
    lut = q_subs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("centroid").alias("code"),
        F.round(dot_auto(F.col("qv"), F.col("c_vec"), sub_dim), 9).alias("val"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.round(F.sum("val"), 6).alias("pq_score"))
        # m=4 codes per vector: only ids carrying all m LUT hits are
        # complete scores (every id matches every query's LUT, so the
        # count is always m — the filter simply documents the contract)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("pq_score"), F.asc("id"))
    if rerank > 0:
        vecs = normalized(corpus, id_col, vec_col, "id", "vec")
        cand = (
            scored.withColumn("_pr", F.row_number().over(w))
            .where(F.col("_pr") <= rerank)
            .select("query_id", "id")
        )
        exact = (
            cand.join(vecs, "id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "id",
                F.round(dot_auto(F.col("q_vec"), F.col("vec"), dim), 6).alias("cosine_sim"),
            )
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.desc("cosine_sim"), F.asc("id")
        )
        return (
            exact.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                F.col("id").alias("neighbor_id"),
                "cosine_sim",
                F.col("rank").cast("int").alias("rank"),
            )
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "pq_score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    m: int = 16,
    pq_k: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    rerank: int = 50,
    centroids: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """IVF × PQ composition — the full IVFADC serving layout (Jégou et
    al. 2011): the coarse quantizer prunes WHICH vectors are considered
    (``n_probe`` of ``n_cells`` inverted lists), PQ codes determine HOW
    the candidates are scored (16-byte asymmetric dots, no vectors
    read), and the exact re-rank bounds the lossiness.  This variant
    quantizes raw vectors rather than cell residuals — the residual
    refinement is a codebook detail, not a plan-shape change.

    At 100 TB the query path reads: the broadcast codebooks, the probed
    cells' (id, sub, code) rows (cell-partition-pruned), and
    ``|queries| × rerank`` full vectors.  Nothing else.

    Pass pre-trained ``centroids``/``books`` (production shape — train
    once on a sample, serve many batches; ``write_ivfpq_index`` persists
    exactly these) to skip the in-query training the oracle contract
    otherwise requires."""
    from nomenklatura_spark.ann.ivf import ivf_assign, train_centroids

    if centroids is None:
        # driver-local, not persisted: see materialize_local — trained
        # books used to stay pinned in the block cache past the call
        centroids = materialize_local(
            train_centroids(
                corpus, id_col, vec_col, n_centroids=n_cells, n_iter=n_iter
            )
        )
    inv = ivf_assign(corpus, centroids, id_col, vec_col).select(
        "centroid", "id"
    )
    if books is None:
        books = materialize_local(
            train_pq_codebooks(corpus, id_col, vec_col, m, pq_k, n_iter, dim)
        )
    codes = pq_encode(corpus, books, id_col, vec_col, m, dim)

    sub_dim = dim // m
    q = normalized(queries, id_col, vec_col, "query_id", "q_vec")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid")
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid",
            F.round(dot_auto(F.col("q_vec"), F.col("c_vec"), dim), 9).alias("c_sim"),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "centroid")
    )
    cand = F.broadcast(probes).join(inv, "centroid").select("query_id", "id")

    q_subs = q.select(
        "query_id", _subvecs(F.col("q_vec"), m, sub_dim).alias("x")
    ).select("query_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("qv"))
    lut = q_subs.join(F.broadcast(books), "sub").select(
        "query_id",
        "sub",
        F.col("centroid").alias("code"),
        F.round(dot_auto(F.col("qv"), F.col("c_vec"), sub_dim), 9).alias("val"),
    )
    scored = (
        cand.join(codes, "id")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.round(F.sum("val"), 6).alias("pq_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("pq_score"), F.asc("id"))
    cand_top = (
        scored.withColumn("_pr", F.row_number().over(w))
        .where(F.col("_pr") <= max(rerank, k))
        .select("query_id", "id")
    )
    vecs = normalized(corpus, id_col, vec_col, "id", "vec")
    exact = (
        cand_top.join(vecs, "id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "id",
            F.round(dot_auto(F.col("q_vec"), F.col("vec"), dim), 6).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "cosine_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- at-rest IVFADC index (serving layout) ---------------------------------


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 16,
    pq_k: int = 16,
    n_iter: int = 2,
    dim: int = 64,
) -> None:
    """Materialize the IVFADC serving layout on disk:

    - ``{path}/codes``    — (id, sub, code) PARTITIONED BY the coarse
      cell, so a query probing p cells reads p directories (the Spark
      analogue of FAISS's contiguous inverted lists).
    - ``{path}/vectors``  — unit-norm full vectors, same partitioning
      (read only for the top-``rerank`` exact re-rank).
    - ``{path}/centroids`` / ``{path}/books`` — the tiny codebooks.

    Train once, serve many: the codebooks are deterministic (hash seeds,
    round(9)) so a rebuild reproduces the identical index."""
    from nomenklatura_spark.ann.ivf import ivf_assign, train_centroids

    centroids = materialize_local(
        train_centroids(
            corpus, id_col, vec_col, n_centroids=n_cells, n_iter=n_iter
        )
    )
    books = materialize_local(
        train_pq_codebooks(corpus, id_col, vec_col, m, pq_k, n_iter, dim)
    )
    inv = ivf_assign(corpus, centroids, id_col, vec_col)
    codes = pq_encode(corpus, books, id_col, vec_col, m, dim)
    (
        codes.join(inv.select("centroid", "id"), "id")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/codes")
    )
    (
        inv.select("centroid", "id", "vec")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/vectors")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    books.write.mode("overwrite").parquet(f"{path}/books")


def ivfpq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 6,
    rerank: int = 50,
) -> DataFrame:
    """Serve ANN queries from a ``write_ivfpq_index`` directory.

    The probed cell set is computed against the broadcast coarse
    codebook and pushed into the codes/vectors scans as a partition
    filter (``centroid IN (...)`` — a driver-side list bounded by
    |queries| × n_probe), so only the probed inverted lists are ever
    read: partition pruning does the work FAISS does with list offsets.
    Scoring is the same broadcast-LUT + exact re-rank as
    ``ivfpq_topk``."""
    centroids = spark.read.parquet(f"{path}/centroids")
    books = spark.read.parquet(f"{path}/books")
    m = books.agg(F.max("sub")).collect()[0][0] + 1
    sub_dim = (
        len(books.select("c_vec").first()[0])
    )
    dim = m * sub_dim

    # q is NOT persisted: it is a narrow map over the query batch,
    # recomputed at most three times per serving call (probe job, LUT,
    # exact re-rank) — cheaper than a persisted block a long-lived
    # serving session can never release (callers with an expensive
    # `queries` lineage should cache upstream, where the lifecycle is
    # theirs).  The probe list is already driver-bounded (|queries| ×
    # n_probe — it feeds a partition-filter literal), so it is collected
    # ONCE and rebuilt as a local relation instead of persisted.
    q = normalized(queries, id_col, vec_col, "query_id", "q_vec")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid")
    )
    probes = materialize_local(
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid",
            F.round(dot_auto(F.col("q_vec"), F.col("c_vec"), dim), 9).alias("c_sim"),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "centroid")
    )
    cells = [r["centroid"] for r in probes.select("centroid").distinct().collect()]

    codes = spark.read.parquet(f"{path}/codes").where(
        F.col("centroid").isin(cells)
    )
    cand = (
        F.broadcast(probes)
        .join(codes, "centroid")
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", "id", "sub", "code")
    )
    q_subs = q.select(
        "query_id", _subvecs(F.col("q_vec"), m, sub_dim).alias("x")
    ).select("query_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("qv"))
    lut = q_subs.join(F.broadcast(books), "sub").select(
        "query_id",
        "sub",
        F.col("centroid").alias("code"),
        F.round(dot_auto(F.col("qv"), F.col("c_vec"), sub_dim), 9).alias("val"),
    )
    scored = (
        cand.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "id")
        .agg(F.round(F.sum("val"), 6).alias("pq_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("pq_score"), F.asc("id"))
    cand_top = (
        scored.withColumn("_pr", F.row_number().over(w))
        .where(F.col("_pr") <= max(rerank, k))
        .select("query_id", "id")
    )
    vectors = spark.read.parquet(f"{path}/vectors").where(
        F.col("centroid").isin(cells)
    )
    exact = (
        cand_top.join(vectors.select("id", "vec"), "id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "id",
            F.round(dot_auto(F.col("q_vec"), F.col("vec"), dim), 6).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "cosine_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )
