"""Z-order clustered writes — multi-dimensional at-rest data locality.

The engine's other layout tools each serve ONE access dimension:
dataset partitioning (scoping prunes directories), canonical_id
bucketing (entity joins lose their shuffle), IVF-cell / word-bucket
partitioning (probe sets push down as partition filters).  Tables
queried by RANGE on several independent columns — events by (user, time),
documents by (source, length), metrics by (entity, day) — get nothing
from a linear sort: sorting by column A packs A tightly per file but
scatters B across every file, so parquet min/max row-group and file
skipping works for exactly one dimension.

Z-ordering (Morton order) interleaves the bits of the quantized
dimensions into one sort key, so consecutive key ranges are small
hyper-rectangles: EVERY clustered dimension's min/max span per file is
narrow, and a range predicate on ANY of them skips most files at scan
time.  This is the layout Delta's OPTIMIZE ZORDER BY materializes; here
it is a plain column expression (getbit + shift arithmetic, no UDF) plus
``repartitionByRange`` + ``sortWithinPartitions`` — a one-shuffle write
job, engine-portable, usable on any parquet-compatible store.

Quantization is min/max-linear into ``bits``-bit rank space from a
one-row bounds aggregation broadcast back (a scalar append, not a
shuffle).  For heavily-skewed dimensions substitute a rank-based
quantizer before the interleave; the interleave itself is agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Z_BITS = 12


def interleave_bits(cols: list[Column], bits: int = Z_BITS) -> Column:
    """Morton key: round-robin-interleave the low ``bits`` bits of each
    (already-quantized, non-negative) long column, highest bit first so
    key order matches the hyper-rectangle recursion.  Unrolled getbit ×
    shift arithmetic — whole-stage codegen, no UDF; total key width
    ``len(cols) · bits`` must stay ≤ 63."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for i in range(bits):  # bit i of every column, MSB first
        src_bit = bits - 1 - i
        for j, c in enumerate(cols):
            dst = (bits - 1 - i) * n + (n - 1 - j)
            key = key + F.shiftleft(
                F.getbit(c.cast("long"), F.lit(src_bit)).cast("long"), dst
            )
    return key


def quantize_minmax(df: DataFrame, cols: list[str], bits: int = Z_BITS):
    """Append ``_q_<col>`` rank-space columns: min/max-linear mapping of
    each dimension into [0, 2^bits).  Bounds come from one tiny
    aggregation broadcast back onto the scan."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    for c in cols:
        span = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        frac = F.when(
            span > 0, (F.col(c).cast("double") - F.col(f"_min_{c}")) / span
        ).otherwise(F.lit(0.0))
        out = out.withColumn(
            f"_q_{c}",
            F.least(F.floor(frac * (top + 1)).cast("long"), F.lit(top)),
        )
    return out.drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = Z_BITS,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet Z-order-clustered on ``cols``: quantize,
    interleave, range-partition on the Morton key (one shuffle), sort
    within partitions, drop the helper columns.  Readers filter on the
    original columns; parquet min/max statistics do the skipping."""
    spark = df.sparkSession
    q = quantize_minmax(df, cols, bits)
    key = interleave_bits([F.col(f"_q_{c}") for c in cols], bits)
    n = n_files or spark.sparkContext.defaultParallelism
    (
        q.withColumn("_zkey", key)
        .repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_q_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
