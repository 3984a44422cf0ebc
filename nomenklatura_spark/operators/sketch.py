"""Mergeable HyperLogLog distinct-count sketches.

Spark's built-in ``approx_count_distinct`` answers one query over one
scan, but a 100 TB analytics store wants the SKETCH itself as data: a
tiny mergeable relation per (key, day, source, ...) that is computed
once per ingest increment, stored, and merged at read time across any
grouping — distinct users per week = max-merge of seven daily sketches,
never a rescan of the raw events (Flajolet et al., "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm", AofA
2007; the reference's statistics views recount distinct entities per
dataset on every refresh — `/root/reference/nomenklatura/store/sql.py`
— which is exactly the rescan this tier replaces at scale).

Engine-portable and oracle-checkable by construction:

- The hash is the repo-wide md5 device (``functions/hashing.py``): 15
  hex chars → a 60-bit non-negative BIGINT, identical in Spark and
  ANSI SQL, independent of partitioning, cluster size and retries.
- ``bucket = h % m`` (m = 2**p registers), ``rho`` = leading-zero rank
  of the remaining ``60 - p`` bits, computed EXACTLY via the length of
  the minimal binary string (``F.bin`` / DuckDB ``bin``) — no floating
  log anywhere in the register path.
- The harmonic total is kept as an exact BIGINT in units of 2**-W
  (register r contributes ``1 << (W - r)``, empty registers ``1 << W``
  with W = 61 - p), so sketches, merges and totals are bit-identical
  across engines and aggregation orders; floating point appears only in
  the final one-shot estimate arithmetic.

Shuffle shape: building registers is ONE partially-aggregated shuffle
on (key, bucket) — the map-side combine collapses each partition to at
most m rows per key before anything moves.  Merging sketches is the
same max-aggregation and, max being idempotent and commutative,
re-delivered or overlapping increments cannot corrupt a merged sketch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from nomenklatura_spark.functions.hashing import md5_bucket

# Register width: the 60-bit md5 hash spends p bits on the bucket and
# the remaining 60-p on the rank; rho ranges in [1, 61-p].
_HASH_BITS = 60

# hll_pairwise_union's all-pairs form is for driver-small key sets;
# above this it raises and points at a banded formulation.
_MAX_UNION_KEYS = 4096


def _alpha(m: int) -> float:
    """The standard HLL bias constant; inlined identically into the SQL
    oracles so both engines evaluate the same IEEE expression.

    Defined only for m = 2^p with p >= 4 — the published constants
    start at m=16 and the estimator's bias correction is meaningless
    below that (raises, rather than KeyError-ing obscurely)."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    try:
        return {16: 0.673, 32: 0.697, 64: 0.709}[m]
    except KeyError:
        raise ValueError(
            f"HLL precision too small: m={m}; need m = 2^p with p >= 4 "
            f"(the standard bias constants are undefined below m=16)"
        ) from None


def hll_rho(hash_col: Column, p: int) -> Column:
    """Leading-zero rank of the rank bits of a 60-bit hash, exactly.

    ``w = h // m`` has ``W = 60 - p`` significant bits;
    ``length(bin(w))`` is ``floor(log2(w)) + 1`` (a string length — no
    floating point), so the number of leading zeros is ``W -
    length(bin(w))`` and the HLL rank is that plus one.  ``w = 0``
    (all rank bits zero) pins the maximum rank ``W + 1``.
    """
    # shiftright, NOT `/ 2**p`: double division would round the 60-bit
    # hash into a 53-bit mantissa and corrupt the rank bits
    w = F.shiftright(hash_col, p)
    width = _HASH_BITS - p
    return (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    p: int = 8,
    prefix: str = "hll",
) -> DataFrame:
    """The mergeable sketch relation: (keys..., bucket, reg).

    At most ``2**p`` rows per key survive the single partial-agg
    shuffle; only non-empty buckets are materialized (the estimator
    reconstructs the empties arithmetically).  ``prefix`` keys the md5
    stream so distinct sketch families never share hash bits.
    """
    m = 1 << p
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(prefix + ":"), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        # NULL values are ignored, matching the exact aggregates this
        # approximates (count distinct / approx_count_distinct)
        df.where(F.col(value_col).isNotNull())
        .select(*key_cols, h.alias("_h"))
        .select(
            *key_cols,
            F.pmod(F.col("_h"), F.lit(m)).cast("int").alias("bucket"),
            hll_rho(F.col("_h"), p).alias("reg"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches over the same key layout into one: register-wise
    max.  Idempotent — overlapping or re-delivered increments are
    absorbed, which is why the streaming index needs no replay guard."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("reg",)]
    return out.groupBy(*keys).agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame,
    key_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """Cardinality estimate per key from a register relation.

    Returns (keys..., harmonic_q, zeros, n_hll): the EXACT integer
    harmonic total (units of 2**-(61-p)), the number of empty
    registers, and the estimate with the standard small-range linear
    counting correction.  ``harmonic_q`` and ``zeros`` are the
    engine-exact audit columns; ``n_hll`` is the one place a double
    appears, rounded to 4dp.
    """
    m = 1 << p
    width = _HASH_BITS - p
    alpha = _alpha(m)
    # In integer units of 2^-(width+1): a present register r contributes
    # 2^-r -> 1 << (width + 1 - r); an empty register contributes
    # 2^-0 = 1 -> 1 << (width + 1).
    unit = width + 1
    term = F.expr(f"shiftleft(cast(1 as bigint), {unit} - reg)")
    agg = registers.groupBy(*key_cols).agg(
        F.sum(term).alias("_present"),
        F.count(F.lit(1)).alias("_nonempty"),
    )
    zeros = (F.lit(m) - F.col("_nonempty")).cast("long")
    harmonic = (
        F.col("_present") + zeros * F.shiftleft(F.lit(1).cast("long"), unit)
    ).cast("long")
    raw = F.lit(alpha * m * m) * F.lit(float(1 << unit)) / F.col("harmonic_q")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros"))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0), linear).otherwise(
        raw
    )
    return (
        agg.select(
            *key_cols,
            harmonic.alias("harmonic_q"),
            zeros.alias("zeros"),
        )
        .withColumn("n_hll", F.round(est, 4))
    )


def hll_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    p: int = 8,
    prefix: str = "hll",
) -> DataFrame:
    """One-shot convenience: build registers and estimate in one plan."""
    return hll_estimate(hll_registers(df, key_cols, value_col, p, prefix), key_cols, p)


# ---------------------------------------------------------------------------
# count-min sketch (heavy hitters)


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    prefix: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a value stream: (d, bucket, cnt).

    ``depth`` independent md5-derived hash rows of ``width`` counters
    (Cormode & Muthukrishnan, "An improved data stream summary: the
    count-min sketch and its applications", J.Algorithms 2005).  The
    sketch is EXACT integer arithmetic end-to-end — estimates carry the
    one-sided overcount guarantee (never undercount) and the relation
    is bit-identical across engines and partitionings, no rounding
    device needed.

    Shuffle shape: the value stream fans out map-side to ``depth`` rows
    (one array+explode, no join), then ONE partially-aggregated shuffle
    collapses to at most depth*width rows — however large the stream.
    Sketches merge by (d, bucket) SUM (additive, so increments need the
    usual replay guard, unlike the max-merged HLL).  ``weight_col``
    aggregates a non-negative integer measure instead of row counts.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                md5_bucket(f"{prefix}{d}", F.col(value_col), width).cast(
                    "int"
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(value_col).isNotNull())  # NULLs don't count
        .select(F.explode(rows).alias("r"), w.alias("_w"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with identical (depth, width,
    prefix): counter-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Point estimates for ``items``: min over the depth counters.

    ``items`` is expected driver-small (the candidate heavy hitters) →
    its d-fanout joins the sketch (itself at most depth*width rows) and
    one min-aggregation returns (value, n_cms).  Absent buckets count 0
    (value never seen)."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                md5_bucket(f"{prefix}{d}", F.col(value_col), width).cast(
                    "int"
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probes = items.select(
        F.col(value_col).alias("value"), F.explode(rows).alias("r")
    ).select("value", F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("n_cms"))
    )


# ---------------------------------------------------------------------------
# histogram sketch (mergeable approximate quantiles)


def hist_bounds(df: DataFrame, value_col: str) -> DataFrame:
    """Global (lo, hi) bounds as a 1-row relation — the fixed frame every
    increment of a histogram family must share to stay mergeable."""
    return df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    )


def hist_sketch(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    bounds: DataFrame,
    n_bins: int = 32,
) -> DataFrame:
    """Fixed-bin histogram sketch: (keys..., bin, cnt).

    The third member of the sketch tier (HLL = distinct, CMS = heavy
    hitters, histogram = quantiles): per (key, increment) at most
    ``n_bins`` counter rows, built by one partially-aggregated shuffle,
    merged across increments by bin-wise SUM — approximate quantiles
    over any grouping or time window without re-scanning raw history.

    ``bounds`` is a 1-row (lo, hi) relation shared by every increment
    of the family (broadcast, no shuffle); values outside clip into the
    edge bins, equal-lo==hi collapses to bin 0.  Counters are exact
    BIGINTs; the bin index is one arithmetic expression over the raw
    double, so the relation replays identically in ANSI SQL.
    """
    v = F.col(value_col).cast("double")
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    raw = F.floor((v - F.col("lo")) / width).cast("int")
    bin_ = F.when(F.col("hi") <= F.col("lo"), F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    )
    return (
        # NULL values are ignored, matching percentile/quantile_cont —
        # a NULL would otherwise ride as a NULL bin inside n but outside
        # the cumulative walk, shifting every quantile upward
        df.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(*key_cols, bin_.alias("bin"))
        .groupBy(*key_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches built against the SAME bounds frame:
    bin-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    sketch: DataFrame,
    bounds: DataFrame,
    key_cols: Sequence[str],
    q: float,
    n_bins: int = 32,
    decimals: int = 6,
) -> DataFrame:
    """Approximate quantile per key from a histogram sketch.

    Standard cumulative-bin interpolation: find the first bin whose
    running count reaches ``q * n``, place the quantile linearly inside
    it by the overshoot fraction.  Every input is an exact integer or
    the shared bounds doubles, so the estimate is engine-identical;
    rounded before output.  Returns (keys..., n, q<q*100>).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("bin")
    tot = Window.partitionBy(*key_cols)
    cum = F.sum("cnt").over(w)
    n = F.sum("cnt").over(tot)
    hit = sketch.select(
        *key_cols,
        "bin",
        "cnt",
        cum.alias("cum"),
        n.alias("n"),
    ).where(F.col("cum") - F.col("cnt") < F.lit(q) * F.col("n"))
    # the LAST qualifying bin per key is the one containing the quantile
    pick = Window.partitionBy(*key_cols).orderBy(F.col("bin").desc())
    top = (
        hit.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .crossJoin(F.broadcast(bounds))
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    frac = (F.lit(q) * F.col("n") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    est = F.col("lo") + width * (F.col("bin") + F.least(frac, F.lit(1.0)))
    qname = f"q{int(round(q * 100)):02d}"
    return top.select(
        *key_cols,
        F.col("n").cast("long").alias("n"),
        F.round(est, decimals).alias(qname),
    )


def hll_pairwise_union(
    registers: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Union sketches for every unordered key pair: (key_a, key_b,
    bucket, reg) with reg = max over the two keys' registers.

    The sketch-algebra payoff: |A ∪ B| estimates come from stored
    kilobyte sketches, and |A ∩ B| ≈ est(A) + est(B) − est(A∪B)
    (inclusion–exclusion), so corpus-overlap questions — shared users
    between segments, document overlap between snapshots — never join
    or rescan the raw relations.  The distinct key set is expected
    small (it drives a pair cross-join); the register relation stays
    sketch-sized throughout.

    The driver-small contract is EXECUTABLE: more than
    ``_MAX_UNION_KEYS`` distinct keys raises, because |keys|^2 / 2
    pairs x 2^p registers stops being "sketch-sized" — at that point
    restrict the key set upstream, or use ``hll_pairwise_union_banded``
    (identical output, no broadcast, no crossJoin).
    """
    # the guard's count and BOTH crossJoin sides read the key set:
    # checkpoint the (sketch-sized) distinct keys so the register
    # lineage executes once, not three times
    keys = (
        registers.select(F.col(key_col).alias("_k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_keys = keys.count()
    if n_keys > _MAX_UNION_KEYS:
        raise ValueError(
            f"hll_pairwise_union: {n_keys} distinct keys would generate "
            f"~{n_keys * (n_keys - 1) // 2} key pairs x registers — the "
            f"all-pairs form is for driver-small key sets "
            f"(<= {_MAX_UNION_KEYS}); filter the keys first, or use "
            f"hll_pairwise_union_banded"
        )
    pairs = (
        keys.select(F.col("_k").alias("key_a"))
        .crossJoin(F.broadcast(keys.select(F.col("_k").alias("key_b"))))
        .where(F.col("key_a") < F.col("key_b"))
    )
    joined = pairs.join(
        F.broadcast(registers),
        (F.col(key_col) == F.col("key_a")) | (F.col(key_col) == F.col("key_b")),
    )
    return joined.groupBy("key_a", "key_b", "bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_pairwise_union_banded(
    registers: DataFrame,
    key_col: str = "key",
    n_bands: int = 16,
) -> DataFrame:
    """``hll_pairwise_union`` beyond the driver-small key bound: band
    the keys and generate pairs band-locally, so nothing is ever
    broadcast or crossJoined.

    Triangle block partitioning: each key hashes to one of ``n_bands``
    groups; an unordered pair (a, b) is generated exactly once, in the
    band (min(g_a, g_b), max(g_a, g_b)) — diagonal bands self-join
    within a group (key_a < key_b dedups the triangle), off-diagonal
    bands equi-join group i keys against group j keys via an exploded
    (band_i, band_j) key.  Each key's row is replicated n_bands times
    in the PAIR-GENERATION relation only (key-sized, not
    register-sized); the registers then attach by plain per-side
    equi-joins on the key, and every shuffle is AQE-splittable.  Output
    is identical to ``hll_pairwise_union`` with key_a/key_b in
    lexicographic order: (key_a, key_b, bucket, max reg).

    Output size is inherently |pairs| x 2^p rows — banding removes the
    all-pairs broadcast bottleneck, not the quadratic output; keep the
    key set meaningful (segments, not user ids).
    """
    if n_bands < 1:
        raise ValueError("n_bands must be >= 1")
    g = F.pmod(F.xxhash64(F.col("_k")), F.lit(n_bands)).cast("int")
    # pair generation reads the key set three times (diagonal self-join
    # sides + the off-diagonal explodes): checkpoint it once
    keys = (
        registers.select(F.col(key_col).alias("_k"))
        .distinct()
        .withColumn("_g", g)
        .localCheckpoint(eager=True)
    )
    diag = (
        keys.select(F.col("_k").alias("key_a"), F.col("_g").alias("_ga"))
        .join(
            keys.select(F.col("_k").alias("key_b"), F.col("_g").alias("_gb")),
            F.col("_ga") == F.col("_gb"),
        )
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )
    # sequence(start, stop) runs DESCENDING when start > stop — edge
    # groups (last for left, first for right) must get an empty array
    up = F.when(
        F.col("_g") + 1 <= F.lit(n_bands - 1),
        F.sequence(F.col("_g") + 1, F.lit(n_bands - 1)),
    ).otherwise(F.array().cast("array<int>"))
    down = F.when(
        F.col("_g") >= 1, F.sequence(F.lit(0), F.col("_g") - 1)
    ).otherwise(F.array().cast("array<int>"))
    left_off = keys.select(
        F.col("_k").alias("_ka"),
        F.col("_g").alias("_bi"),
        F.explode(up).alias("_bj"),
    )
    right_off = keys.select(
        F.col("_k").alias("_kb"),
        F.explode(down).alias("_bi"),
        F.col("_g").alias("_bj"),
    )
    off = left_off.join(right_off, ["_bi", "_bj"]).select(
        F.least("_ka", "_kb").alias("key_a"),
        F.greatest("_ka", "_kb").alias("key_b"),
    )
    pairs = diag.unionByName(off)
    ra = registers.select(
        F.col(key_col).alias("key_a"), "bucket", "reg"
    )
    rb = registers.select(
        F.col(key_col).alias("key_b"), "bucket", "reg"
    )
    both = pairs.join(ra, "key_a").select(
        "key_a", "key_b", "bucket", "reg"
    ).unionByName(
        pairs.join(rb, "key_b").select("key_a", "key_b", "bucket", "reg")
    )
    return both.groupBy("key_a", "key_b", "bucket").agg(
        F.max("reg").alias("reg")
    )
