"""Deterministic negative-pair sampling for contrastive training.

Bi-encoder / embedding training (DPR — Karpukhin et al. 2020; SimCSE —
Gao et al. 2021) consumes (anchor, negative) pairs: for every anchor
document, k documents that are NOT related to it, drawn uniformly so
the negative distribution matches the corpus.  At corpus scale the
naive formulation — "k random other documents per anchor" — is an
all-pairs sample; the standard scalable shape (and the one here) is a
shared CANDIDATE POOL: one global uniform sample of ``pool_size``
documents is broadcast, every anchor ranks the pool by a per-(anchor,
candidate) hash, and the k smallest survive.  Each anchor still sees
an i.i.d.-uniform-without-replacement draw from the pool, the pool is
one TakeOrdered pass over the corpus, and the per-anchor work is
pool-sized, never corpus-sized.

Determinism is the house md5 device (``functions/hashing.md5_bucket``,
replayable as ANSI SQL): the pool is the ``pool_size`` smallest
``md5(salt:pool:id)`` keys (ties by id), and each anchor's ranking key
is ``md5(salt:anchor|candidate)`` — so retries, repartitionings and
the DuckDB oracle reproduce the exact pair set bit-for-bit.  No seeded
RNG anywhere.

Exclusions: a negative must not be the anchor itself, and with
``group_col`` set must not share the anchor's group (source, dedup
cluster, domain — the standard guard against false negatives).  NULL
groups are NULL-SAFE: the exclusion compares with IS DISTINCT FROM
semantics, so all NULL-group documents form one shared group — two
unknown-source docs are never paired as negatives (they might be from
the same source), while a NULL-group anchor still draws freely from
every known-group candidate.  (Plain ``!=`` would three-valued-NULL
both cases away, silently emitting zero negatives for NULL-group
anchors.)  Anchors whose surviving candidate set is smaller than k
emit fewer rows (documented; raise ``pool_size`` if exclusion
pressure is high).

Scale contract, executable: the pool is broadcast to every executor,
so ``pool_size`` above ``max_pool`` (default 1e6 ids — tens of MB)
raises a loud ValueError instead of silently planning a broadcast that
evicts the executors.  The per-anchor rank rides a window whose rank
predicate enables WindowGroupLimit: the broadcast join keeps all of an
anchor's candidates in one task, so each map task ships k rows per
anchor and the single shuffle carries anchors x k rows, never
anchors x pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nomenklatura_spark.functions.hashing import md5_bucket

_MOD = 16**15


def sample_negative_pairs(
    docs: DataFrame,
    k: int = 5,
    pool_size: int = 256,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "negpair",
    max_pool: int = 1_000_000,
    pool: DataFrame | None = None,
) -> DataFrame:
    """(anchor_id, negative_id, neg_rank) — k deterministic uniform
    negatives per anchor from a broadcast candidate pool (module
    docstring).  ``neg_rank`` is 1..k in hash order, so a caller can
    take a prefix for curriculum-style schedules.

    With ``pool`` set, the caller supplies the candidate pool — columns
    ``id_col`` (and ``group_col`` if the exclusion is on) — instead of
    the corpus-derived TakeOrdered draw; the streaming serving path
    (``doc_negatives_served``) passes the pool maintained by the
    min-k sample index, which reproduces the built-in draw exactly
    (same ``{salt}:pool`` md5 keys, weight 1).  ``pool_size`` then only
    caps the broadcast (the ``max_pool`` contract still applies)."""
    if k < 1:
        raise ValueError("sample_negative_pairs: k must be >= 1")
    if pool_size < k:
        raise ValueError(
            f"sample_negative_pairs: pool_size={pool_size} < k={k} — "
            "every anchor would come up short by construction"
        )
    if pool_size > max_pool:
        raise ValueError(
            f"sample_negative_pairs: pool_size={pool_size} is above the "
            f"max_pool={max_pool} broadcast bound; a pool that size "
            "should be a partitioned join, not a broadcast — lower "
            "pool_size or raise max_pool if the executors have the "
            "memory for it"
        )
    pool_cols = [F.col(id_col).alias("_neg_id")]
    if group_col is not None:
        pool_cols.append(F.col(group_col).alias("_neg_grp"))
    if pool is not None:
        # same md5 ordering as the built-in draw: limit over an
        # unordered relation takes whatever partitions arrive first, so
        # a supplied pool larger than pool_size would break the
        # everything-deterministic contract — and because the keys
        # match the built-in draw, ordering a superset pool reproduces
        # the built-in prefix exactly
        pool = (
            pool.select(
                *pool_cols,
                md5_bucket(
                    f"{salt}:pool", F.col(id_col), _MOD
                ).alias("_pk"),
            )
            .orderBy("_pk", "_neg_id")
            .limit(pool_size)
            .drop("_pk")
        )
    else:
        pool = (
            docs.select(
                *pool_cols,
                md5_bucket(
                    f"{salt}:pool", F.col(id_col), _MOD
                ).alias("_pk"),
            )
            .orderBy("_pk", "_neg_id")
            .limit(pool_size)
            .drop("_pk")
        )
    anchor_cols = [F.col(id_col).alias("anchor_id")]
    if group_col is not None:
        anchor_cols.append(F.col(group_col).alias("_a_grp"))
    anchors = docs.select(*anchor_cols)
    cond = F.col("anchor_id") != F.col("_neg_id")
    if group_col is not None:
        # null-safe: NULL groups are one shared group (module docstring)
        cond = cond & ~F.col("_a_grp").eqNullSafe(F.col("_neg_grp"))
    pair_key = md5_bucket(
        salt,
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("_neg_id").cast("string"),
        ),
        _MOD,
    )
    win = Window.partitionBy("anchor_id").orderBy("_ph", "_neg_id")
    return (
        anchors.join(F.broadcast(pool), cond)
        .withColumn("_ph", pair_key)
        .withColumn("neg_rank", F.row_number().over(win))
        .where(F.col("neg_rank") <= k)
        .select(
            "anchor_id",
            F.col("_neg_id").alias("negative_id"),
            "neg_rank",
        )
    )


def build_positive_pairs(
    components: DataFrame,
    k: int = 3,
    id_col: str = "node",
    comp_col: str = "component",
    salt: str = "pospair",
    max_cluster: int = 10_000,
) -> DataFrame:
    """(anchor_id, positive_id, pos_rank) — up to k positives per
    anchor from its near-dup COMPONENT (the transitive closure of the
    pair graph, so quote-chains a>b>c yield (a, c) even when no direct
    edge was scored).  Together with ``sample_negative_pairs`` /
    ``mine_hard_negatives`` this completes the contrastive feed:
    positives are corpus-derived (near-duplicates ARE the natural
    positive pairs a self-supervised bi-encoder trains on), ranked by
    the same engine-stable md5 device so any engine replays the exact
    selection.

    Scale contract, executable: the within-component self-join is
    quadratic in component size, and web-scale near-dup graphs grow a
    giant component (boilerplate chains).  A partial-agg count runs
    first and any component above ``max_cluster`` raises a loud
    ValueError naming the offenders — split it upstream (raise the
    dedup threshold, or cap with ``dedup/survivors``) or raise the
    bound; silently sampling a mega-cluster would bias positives
    toward boilerplate.  Within the bound the join is
    component-keyed and the per-anchor cut rides a WindowGroupLimit
    (k rows per anchor leave each map task)."""
    if k < 1:
        raise ValueError("build_positive_pairs: k must be >= 1")
    comp = components.select(
        F.col(comp_col).alias("_c"), F.col(id_col).alias("anchor_id")
    )
    offenders = (
        comp.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_cluster)
        .orderBy(F.col("n").desc(), "_c")
        .limit(10)
        .collect()
    )
    if offenders:
        names = ", ".join(f"{r['_c']}({r['n']})" for r in offenders)
        raise ValueError(
            f"build_positive_pairs: component(s) above the "
            f"max_cluster={max_cluster} self-join bound: {names} "
            f"(top 10 shown); split the cluster upstream (raise the "
            f"dedup threshold or cap with dedup/survivors) or raise "
            f"the bound if the pair volume is acceptable"
        )
    other = comp.select(
        "_c", F.col("anchor_id").alias("positive_id")
    )
    pair_key = md5_bucket(
        salt,
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("positive_id").cast("string"),
        ),
        _MOD,
    )
    win = Window.partitionBy("anchor_id").orderBy("_ph", "positive_id")
    return (
        comp.join(other, "_c")
        .where(F.col("anchor_id") != F.col("positive_id"))
        .withColumn("_ph", pair_key)
        .withColumn("pos_rank", F.row_number().over(win))
        .where(F.col("pos_rank") <= k)
        .select("anchor_id", "positive_id", "pos_rank")
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    skip_top: int = 2,
    **ivf_kwargs,
) -> DataFrame:
    """HARD negatives: the anchor's approximate nearest neighbors with
    the top ``skip_top`` ranks skipped — near the anchor in embedding
    space (so the trainer learns fine distinctions, the complement of
    ``sample_negative_pairs``' uniform draw) but past the head where
    true duplicates/positives concentrate (the standard guard; raise
    ``skip_top`` when the corpus is duplicate-heavy, or anti-join a
    dedup keep-list upstream).  A composition row: the candidate
    generation IS ``ann/ivf.ivf_topk`` at ``k + skip_top``, inheriting
    its scale shape (broadcast probes against the inverted lists, one
    rank window) and its codebook determinism — so the oracle replays
    the identical selection.  Returns (anchor_id, negative_id,
    neg_rank 1..k, cosine_sim)."""
    from nomenklatura_spark.ann.ivf import ivf_topk

    if k < 1 or skip_top < 0:
        raise ValueError(
            "mine_hard_negatives: need k >= 1 and skip_top >= 0"
        )
    nn = ivf_topk(corpus, queries, k=k + skip_top, **ivf_kwargs)
    return nn.where(F.col("rank") > skip_top).select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("negative_id"),
        (F.col("rank") - skip_top).cast("int").alias("neg_rank"),
        "cosine_sim",
    )
