"""Embedding-cosine near-duplicate detection.

Completes the dedup tier ladder (exact → n-gram Jaccard → MinHash/LSH →
SimHash → embedding cosine): pairs of vectors whose cosine similarity
clears a threshold are near-duplicates.

Two paths:

- ``embedding_dup_pairs`` — exact all-pairs (dedup triangle ``l.id <
  r.id``), the correctness baseline with a direct DuckDB oracle
  (``list_cosine_similarity``).  Quadratic; fine for verification scale.
- ``embedding_dup_pairs_lsh`` — candidates from the hyperplane-LSH bucket
  join (``ann.lsh.signatures``), then exact cosine verification on the
  bucketed pairs only.  This is the 100 TB path: the all-pairs product
  never materialises, the bucket join is an equi-join AQE can handle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.ann.brute import (
    _unit_rows,
    collect_unit_matrix,
    dot_auto,
    normalized,
)
from nomenklatura_spark.ann.lsh import signatures


def _prep(df: DataFrame, id_col: str, vec_col: str, side: str) -> DataFrame:
    """Unit-normalize once per vector so pair verification is a bare dot."""
    return normalized(df, id_col, vec_col, f"{side}id", f"{side}vec")


def _verify(
    pairs: DataFrame, threshold: float, decimals: int, dim: int | None = None
) -> DataFrame:
    sim = F.round(dot_auto(F.col("lvec"), F.col("rvec"), dim), decimals)
    return (
        pairs.select("lid", "rid", sim.alias("cosine_sim"))
        # no presentation sort: a global orderBy makes the range
        # partitioner sample the child, executing the bucket join (or
        # GEMM) twice; callers sort if they need order
        .where(F.col("cosine_sim") >= threshold)
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact near-dup pairs: all (lid < rid) with cosine >= threshold.

    One side ships as a broadcast unit-norm matrix; the other streams
    through an Arrow-batched numpy GEMM that emits only above-threshold
    survivors — the N² grid lives one batch-block at a time inside BLAS,
    never as a crossJoin of copied arrays, and the near-empty survivor
    set is all that crosses back into the JVM. (The broadcast-side size
    contract is the same one the broadcast crossJoin form had; the LSH
    variant below is the unbounded-corpus path.)
    """
    spark = df.sparkSession
    r_ids, r_mat = collect_unit_matrix(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((r_ids, r_mat.T.copy()))
    idt = df.schema[id_col].dataType.simpleString()
    out_schema = f"lid {idt}, rid {idt}, cosine_sim double"

    def gen(batches):
        ids_r, rt = b.value
        for pdf in batches:
            if len(pdf) == 0 or len(ids_r) == 0:
                continue
            sims = np.round(_unit_rows(pdf, vec_col) @ rt, score_decimals)
            lids = pdf[id_col].to_numpy()
            ii, jj = np.nonzero(
                (sims >= threshold) & (lids[:, None] < ids_r[None, :])
            )
            if len(ii):
                yield pd.DataFrame(
                    {
                        "lid": lids[ii],
                        "rid": ids_r[jj],
                        "cosine_sim": sims[ii, jj],
                    }
                )

    left = df.select(id_col, vec_col).repartition(
        spark.sparkContext.defaultParallelism
    )
    return left.mapInPandas(gen, out_schema)


def embedding_containment_pairs(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    score_decimals: int = 6,
) -> DataFrame:
    """Semantic decontamination: corpus vectors whose cosine similarity
    to ANY benchmark vector clears ``threshold`` — the embedding-space
    complement of the n-gram containment check (``dedup/ngram.py``),
    catching paraphrased eval items verbatim n-grams miss.

    Scale shape mirrors the n-gram decontaminator: the benchmark side is
    orders of magnitude smaller, so its LSH signature relation (and its
    unit vectors for verification) are **broadcast** — the corpus is
    scanned once for signatures and once for verification vectors, never
    shuffled, and the bucket join emits only same-bucket candidates.
    Returns (doc_vec_id, bench_vec_id, cosine_sim) pairs at or above the
    threshold, self-pairs excluded.
    """
    d_sig = signatures(
        docs, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, band_bits=band_bits, dim=dim,
    )
    b_sig = signatures(
        bench, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, band_bits=band_bits, dim=dim,
    )
    cands = (
        d_sig.alias("a")
        .join(F.broadcast(b_sig.alias("b")), ["band", "key"])
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("lid"), F.col("b.id").alias("rid"))
        .distinct()
    )
    left = _prep(docs, id_col, vec_col, "l")
    right = _prep(bench, id_col, vec_col, "r")
    pairs = cands.join(left, "lid").join(F.broadcast(right), "rid")
    return _verify(pairs, threshold, score_decimals, dim=dim)


def embedding_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    score_decimals: int = 6,
) -> DataFrame:
    """LSH-blocked near-dup pairs: bucket join candidates, exact verify."""
    # materialize once: the bucket self-join references the signature
    # relation on both sides, and at corpus scale computing the plane
    # projections twice costs a full second scan; checkpoint blocks
    # release with the returned plan (round-5 lifecycle discipline).
    # eager=False so plan-only callers (explain, registry enumeration)
    # don't pay a construction-time Spark job.  Caveat: the lazy
    # checkpoint dedups computation via block-manager caching, which is
    # authoritative locally but only best-effort across executors when
    # the two map stages race on a cluster — worst case is a partial
    # recompute of the projection, never wrong results; callers that
    # must guarantee one pass can materialize before calling
    sig = signatures(
        df, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, band_bits=band_bits, dim=dim,
    ).localCheckpoint(eager=False)
    cands = (
        sig.alias("a")
        .join(sig.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("lid"), F.col("b.id").alias("rid"))
        .distinct()
    )
    left = _prep(df, id_col, vec_col, "l")
    right = _prep(df, id_col, vec_col, "r")
    pairs = cands.join(left, "lid").join(right, "rid")
    return _verify(pairs, threshold, score_decimals, dim=dim)
