"""N-gram (shingle) Jaccard near-duplicate detection.

Exact variant: explode distinct character shingles, self-join on shingle
(the same bounded-token-join pattern as the ER blocker — SURVEY.md §2.4
J1), count shared shingles per pair, Jaccard = |∩| / (|A|+|B|-|∩|).

Scale notes: the ``max_df`` cap plays the role of the blocker's dynamic
stopwords — shingles shared by more than ``max_df`` documents generate
quadratic join output and carry no near-dup signal, so they are dropped
before the join. For 100 TB use the MinHash/LSH variant
(``dedup.minhash``) which replaces the exact intersection with banded
signatures; this exact version is its small-scale oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_for_shingles(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of a normalized string, as an array —
    pure column expressions (sequence + transform), no UDF."""
    norm = normalize_for_shingles(col)
    n = F.length(norm) - F.lit(k - 1)
    # sequence(1, n) would run *descending* for n < 1 — guard with an
    # empty array for strings shorter than k.
    positions = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(positions, lambda i: F.substr(norm, i, F.lit(k)))
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined) of a normalized string.
    For natural-language near-dup detection word shingles are far sparser
    than character shingles, keeping the shingle self-join bounded."""
    ws = F.filter(F.split(normalize_for_shingles(col), " "), lambda w: w != "")
    n = F.size(ws) - F.lit(k - 1)
    positions = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            positions,
            lambda i: F.array_join(F.slice(ws, i + 1, k), " "),
        )
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, mode: str = "char"
) -> DataFrame:
    gen = char_shingles(F.col(text_col), k) if mode == "char" else word_shingles(F.col(text_col), k)
    return df.select(F.col(id_col).alias("id"), F.explode(gen).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
    max_df: int = 100,
    mode: str = "char",
) -> DataFrame:
    """Near-duplicate pairs (lid, rid, jaccard) with jaccard ≥ threshold.

    lid < rid dedups the triangle; shingles with document frequency >
    ``max_df`` are dropped (stopword cap) before the self-join.

    NOTE: sizes are computed *before* the max_df cap, so jaccard remains
    the true shingle-set jaccard; the cap only limits which pairs can be
    discovered (a pair must share at least one sub-cap shingle).
    """
    # The shingle relation feeds four consumers (sizes, hot-filter, both
    # join sides) — materialize it once, like the reference materializes
    # its DuckDB token tables (index.py entries/term_frequencies).
    sh = shingle_rows(df, id_col, text_col, k, mode).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("shingle")
    )
    sh = sh.join(hot, "shingle", "left_anti").persist()

    l = sh.select(F.col("id").alias("lid"), "shingle")
    r = sh.select(F.col("id").alias("rid"), "shingle")
    inter = (
        l.join(r, "shingle")
        .where(F.col("lid") < F.col("rid"))
        .groupBy("lid", "rid")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("lid"), F.col("n_shingles").alias("l_n")), "lid")
        .join(sizes.select(F.col("id").alias("rid"), F.col("n_shingles").alias("r_n")), "rid")
        .select(
            "lid",
            "rid",
            (
                F.col("n_common")
                / (F.col("l_n") + F.col("r_n") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
