"""Hyperplane (sign-random-projection) LSH for cosine similarity search.

The 100 TB scale path for `ann.brute`: instead of an all-pairs cross join,
vectors hash to ``n_planes`` sign bits (Charikar 2002 SimHash family);
bits group into bands and only vectors sharing a (band, key) bucket meet
in an equi-join — the same bounded-join shape as the ER blocker and the
MinHash deduper.  Exact cosine re-ranks the candidates.

Determinism: hyperplanes are Rademacher ±1 vectors derived from
``md5(plane:dim)`` — no RNG state, no seed tables to ship; every engine
(and every retry of a failed task) derives the same planes.

Scale: signatures are one map-side pass (broadcast planes, zip_with dot);
the bucket join shuffles only (id, band, key); candidate verification
touches only bucketed pairs.  Recall is tunable via n_planes/band_bits —
more bands → higher recall, more candidates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nomenklatura_spark.ann.brute import dot_auto, normalized


def _plane_coeffs(n_planes: int, dim: int) -> list[tuple[int, list[float]]]:
    out = []
    for p in range(n_planes):
        coeffs = [
            1.0 if hashlib.md5(f"{p}:{d}".encode()).digest()[0] % 2 else -1.0
            for d in range(dim)
        ]
        out.append((p, coeffs))
    return out


def signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    band_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(id, band, key) bucket rows — one row per (vector, band).

    key = the band's bit-string (planes in ascending order within the
    band); band count = n_planes / band_bits.

    All ``n_planes`` sign bits are computed in ONE map-side projection
    with the plane coefficients as literal arrays — no per-plane row
    explosion and no (id, band) re-assembly shuffle; the only rows that
    ever move are the final (id, band, key) bucket rows in the caller's
    join. (A previous crossJoin+groupBy formulation shuffled 16 rows per
    vector just to concatenate bits.)
    """
    coeffs = _plane_coeffs(n_planes, dim)
    n_bands = n_planes // band_bits
    vec = F.col(vec_col).cast("array<double>")

    # One 2-D plane matrix parsed from a single SQL literal string, and
    # one transform over it — instead of n_planes separate aggregate
    # expressions each carrying dim F.lit() Column objects.  Building
    # n_planes×dim literals through the Python Column API costs one py4j
    # round-trip per node (measured 1.4s of driver time per query build);
    # one F.expr parse is a single call, and the analyzer folds the
    # result to one Literal either way.
    rows = ",".join(
        "array(" + ",".join("1.0D" if c > 0 else "-1.0D" for c in cs) + ")"
        for _p, cs in coeffs
    )
    planes = F.expr(f"array({rows})")
    bits = F.transform(
        planes,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(vec, plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.array_join(
                F.slice(F.col("_bits"), b * band_bits + 1, band_bits), ""
            ).alias("key"),
        ),
    )
    # explode_outer: keeps the inferred size()>0 filter from duplicating
    # the signature expression into the scan (see dedup/ngram.py).
    return (
        df.select(F.col(id_col).alias("id"), bits.alias("_bits"))
        .select("id", F.explode_outer(bands).alias("bk"))
        .where(F.col("bk").isNotNull())
        .select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Approximate top-k cosine neighbors via LSH bucket join + exact re-rank.

    Same output schema as ``brute.cosine_topk`` (query_id, neighbor_id,
    cosine_sim, rank) so the brute result is a drop-in recall oracle.
    """
    kw = dict(
        id_col=id_col, vec_col=vec_col, n_planes=n_planes,
        band_bits=band_bits, dim=dim,
    )
    q_sig = signatures(queries, **kw).withColumnRenamed("id", "query_id")
    c_sig = signatures(corpus, **kw).withColumnRenamed("id", "neighbor_id")
    cands = (
        F.broadcast(q_sig)
        .join(c_sig, ["band", "key"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # Normalize once per vector → per-pair scoring is a bare dot product
    # (3 array passes per candidate pair otherwise; the candidate set is
    # large when the data forces wide buckets).
    q = normalized(queries, id_col, vec_col, "query_id", "q_vec")
    c = normalized(corpus, id_col, vec_col, "neighbor_id", "c_vec")
    sim = dot_auto(F.col("q_vec"), F.col("c_vec"), dim)
    if score_decimals is not None:
        sim = F.round(sim, score_decimals)
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
