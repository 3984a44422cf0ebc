"""SimHash near-duplicate fingerprinting (Charikar 2002, as popularized
for web dedup by Manku et al. 2007).

Construction (32-bit, md5-portable so the DuckDB oracle reproduces it):

- token hash: int(md5(token)[:8], 16) — 32 bits
- per document and bit b: weighted vote sum(count * (bit(h, b) ? +1 : -1))
- simhash bit b = vote > 0

Spark shape: ONE aggregation with 32 conditional sums (generated
programmatically) — no per-bit explosion, no UDF; the whole fingerprint
is a single groupBy pass. Candidate pairs at scale come from banding the
fingerprint into byte blocks (same LSH-bucket join as minhash): near-dups
within hamming distance d must share at least one of d+1 blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.dedup.ngram import widen_small_scan

N_BITS = 32
N_BLOCKS = 4  # 8-bit blocks → catches pairs within hamming distance 3


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")), " "),
        lambda t: t != "",
    )
    # explode_outer + null filter: plain explode infers a size()>0 filter
    # that pushdown inlines into the scan, re-running the tokenization
    # (see ngram.py module docstring).
    return (
        widen_small_scan(df)
        .select(F.col(id_col).alias("id"), F.explode_outer(toks).alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 32-bit fingerprints in one aggregation pass."""
    tokens = _token_rows(df, id_col, text_col)
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"v{b}")
        for b in range(N_BITS)
    ]
    voted = tokens.groupBy("id").agg(*votes)
    fingerprint = None
    for b in range(N_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return voted.select("id", fingerprint.alias("simhash"))


def hamming32(a, b) -> "F.Column":
    """Hamming distance via popcount of XOR (bit_count is built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    fingerprints: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs within ``max_hamming``: band the 32-bit fingerprint
    into 4 byte-blocks; any pair within hamming 3 shares ≥ 1 exact block
    (pigeonhole) → bounded equi-join, then exact hamming filter."""
    block_size = N_BITS // N_BLOCKS
    mask = (1 << block_size) - 1
    blocks = fingerprints.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_no"),
                        F.shiftright("simhash", i * block_size)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for i in range(N_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("id", "simhash", F.col("blk.block_no"), F.col("blk.block_val"))
    l = blocks.select(
        F.col("id").alias("lid"), F.col("simhash").alias("l_sh"), "block_no", "block_val"
    )
    r = blocks.select(
        F.col("id").alias("rid"), F.col("simhash").alias("r_sh"), "block_no", "block_val"
    )
    return (
        l.join(r, ["block_no", "block_val"])
        .where(F.col("lid") < F.col("rid"))
        .select("lid", "rid", hamming32(F.col("l_sh"), F.col("r_sh")).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
