"""Temporal joins Spark lacks as built-ins: as-of (point-in-time) and
banded range joins, expressed as shuffle-bounded compositions.

Neither is in the reference's operator inventory (it has no event-time
queries), but both are table-stakes for an analytics engine serving
event streams — the prompt-level engine brief names them explicitly —
and both have well-known naive forms that collapse at scale:

- a naive as-of join is a per-key ``theta`` join (``r.ts <= l.ts``) that
  Spark plans as BroadcastNestedLoop/cartesian — O(N·M) per key;
- a naive band join (``|l.ts − r.ts| <= w``) is the same.

The implementations here are the standard scale-safe reductions:

- **as-of** — the union-sort trick: tag both sides, union, ONE window
  sort per key, carry the last-seen right payload with
  ``last(ignorenulls)`` over rows-unbounded-preceding.  Cost: one
  shuffle of |L|+|R| rows on the key, no pair blowup, AQE-skew-safe.
- **band** — bin-bucketed equi-join: quantize time into ``band``-width
  bins, explode the probe side into its 3 candidate bins, equi-join on
  (key, bin), exact-filter.  Each true pair is found exactly once (the
  build side owns one bin), so no dedup pass; the theta join becomes a
  shuffle equi-join whose fan-out is bounded by bin occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = (),
    prefix: str = "asof_",
    tiebreak_col: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``r.ts <= l.ts`` in the same key group (point-in-time correctness:
    a right row is visible to left rows at or after its timestamp,
    never before).

    Output = all left columns + ``{prefix}ts`` + ``{prefix}{c}`` for
    each value column, null where no right row precedes.  If ``(key,
    ts)`` is not unique in ``right``, pass ``tiebreak_col`` — the row
    with the greatest tiebreak value wins (deterministic); otherwise
    equal-timestamp duplicates would make the carried payload
    order-dependent.  ``tolerance_seconds`` nulls out matches staler
    than the tolerance (the pandas ``merge_asof`` contract).
    """
    keys = list(key_cols)
    vcols = list(value_cols)
    if tiebreak_col is not None:
        r_rows = (
            right.groupBy(*keys, ts_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in vcols]), F.col(tiebreak_col)
                ).alias("_rv")
            )
        )
    else:
        r_rows = right.select(
            *keys, ts_col, F.struct(*[F.col(c) for c in vcols]).alias("_rv")
        )
    payload = F.struct(F.col(ts_col).alias("_ats"), F.col("_rv").alias("_v"))
    r_tagged = r_rows.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    r_type = r_tagged.schema["_r"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_type).alias("_r"),
        l_struct.alias("_l"),
    )
    l_type = l_tagged.schema["_l"].dataType
    u = l_tagged.unionByName(
        r_tagged.withColumn("_l", F.lit(None).cast(l_type))
    )
    # right rows sort before left at equal ts (r.ts <= l.ts is a match);
    # ties among left peers are harmless (they contribute null _r) and
    # right peers are unique per (key, ts) by construction above
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    matched = u.withColumn("_c", carried).where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col("_c._ats"))
        ) <= int(tolerance_seconds * 1_000_000)
        matched = matched.withColumn(
            "_c", F.when(fresh, F.col("_c"))
        )
    return matched.select(
        F.col("_l.*"),
        F.col("_c._ats").alias(f"{prefix}ts"),
        *[F.col(f"_c._v.{c}").alias(f"{prefix}{c}") for c in vcols],
    )


def band_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    band_seconds: int = 3600,
) -> DataFrame:
    """All (l, r) pairs in the same key group with
    ``|l.ts − r.ts| <= band_seconds``, as an equi-join.

    Returns left and right rows as ``l``/``r`` structs plus ``dt_us``
    (signed ``r.ts − l.ts`` in exact integer microseconds).  The probe
    (left) side explodes into its bin and both neighbors; the build
    side keeps its single bin, so every qualifying pair appears exactly
    once — no post-join dedup.  At 100 TB the only shuffle is the
    (key, bin) equi-join; skew is bounded by events-per-band-window.
    """
    band_us = band_seconds * 1_000_000
    l_bin = F.floor(F.unix_micros(F.col(ts_col)) / band_us)
    lb = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("l"),
        *key_cols,
        F.unix_micros(F.col(ts_col)).alias("_l_us"),
        F.explode(
            F.array(l_bin - 1, l_bin, l_bin + 1)
        ).alias("_bin"),
    )
    rb = right.select(
        F.struct(*[F.col(c) for c in right.columns]).alias("r"),
        *key_cols,
        F.unix_micros(F.col(ts_col)).alias("_r_us"),
        F.floor(F.unix_micros(F.col(ts_col)) / band_us).alias("_bin"),
    )
    return (
        lb.join(rb, [*key_cols, "_bin"])
        .where(F.abs(F.col("_r_us") - F.col("_l_us")) <= band_us)
        .select("l", "r", (F.col("_r_us") - F.col("_l_us")).alias("dt_us"))
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """First-touch ordered funnel: how many users reach each step of
    ``steps`` IN ORDER (each step strictly after the previous one's
    first qualifying occurrence).

    The product-analytics reduction Spark has no built-in for: per
    user, t1 = first step-1 event; t_k = first step-k event strictly
    after t_{k-1}; a user converts through step k iff t_k exists (and,
    with ``within`` — an INTERVAL literal like ``'7 days'`` — lands
    inside the horizon opened at t1).

    Returns one row per step: (step int, event_type, n_users,
    conversion — fraction of step-1 users, 6dp).

    100 TB shape: the event stream is hash-partitioned by user ONCE;
    each step is then a partial-agg min over that layout plus a
    broadcast-sized rejoin of the per-user step times (per-user state
    is k timestamps, never the events), so the plan is k conditional
    aggregations over one shuffle of the big relation — no self-join of
    the event stream against itself.
    """
    spark = events.sparkSession
    par = spark.sparkContext.defaultParallelism
    ev = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(type_col).alias("et"),
        )
        .where(F.col("et").isin(list(steps)))
        .repartition(par, "u")
        .localCheckpoint(eager=True)
    )
    horizon = (
        F.expr(f"_t1 + INTERVAL {within}") if within is not None else None
    )
    reached = None  # per-user frame: (u, _t1, ..., _ti)
    counts = []
    for i, step in enumerate(steps, start=1):
        if i == 1:
            reached = (
                ev.where(F.col("et") == step)
                .groupBy("u")
                .agg(F.min("t").alias("_t1"))
            )
        else:
            prev = f"_t{i - 1}"
            cand = ev.where(F.col("et") == step).join(reached, "u")
            cond = F.col("t") > F.col(prev)
            if horizon is not None:
                cond = cond & (F.col("t") <= horizon)
            reached = (
                cand.where(cond)
                .groupBy("u", *[f"_t{j}" for j in range(1, i)])
                .agg(F.min("t").alias(f"_t{i}"))
            )
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step"),
                F.lit(step).alias("event_type"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return finalize_funnel_counts(out)


def finalize_funnel_counts(out: DataFrame) -> DataFrame:
    """(step, event_type, n_users) union frame → the funnel answer with
    the guarded conversion column.  Shared by ``funnel_steps`` and the
    maintained-state index (``streaming/funnel_index.py``) so the
    zero-step-1 contract lives in one place: an empty funnel must
    report conversion 0.0, not raise — the sessions run ANSI mode,
    where a bare division by the step-1 count would be a hard
    DIVIDE_BY_ZERO error."""
    base = Window.partitionBy()
    n_first = F.first("n_users").over(base.orderBy("step"))
    return out.select(
        "step",
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(
            F.when(n_first > 0, F.col("n_users") / n_first).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("conversion"),
    ).orderBy("step")


def robust_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "hour",
    z: float = 3.0,
) -> DataFrame:
    """Robust time-series anomaly detection over per-key activity
    counts: median/MAD z-scores (Iglewicz & Hoaglin's modified z-score,
    the outlier rule monitoring pipelines use because mean/stddev are
    themselves corrupted by the outliers they're meant to find).

    Pipeline: bucket events to (key, bucket) counts — the ONE shuffle
    that touches the event stream; per-key median and MAD then aggregate
    the counts relation, which is keys x buckets rows (bounded by the
    calendar, never by event volume), and the per-key stats broadcast
    back onto it.  Exact ``percentile`` is therefore safe here even
    though it materializes each key's value list: the list holds one
    entry per time bucket.

    Counts sit on the integer grid and medians/MADs on the half-integer
    grid (both exactly representable), so the anomaly inequality
    ``|cnt - med| > z * 1.4826 * mad`` is a deterministic IEEE double
    comparison every engine replays identically.  A zero MAD (constant
    key) makes any deviation anomalous; for the SCORE the MAD floors at
    0.5 — half the integer count grid, the smallest deviation the series
    could express — so a constant key's outliers get a finite, ordered
    z instead of infinity.

    Returns only the anomalous rows: (key, bucket_ts, cnt, med, mad,
    robust_z) — at serving scale the result is alert-sized.
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return anomalies_from_counts(counts, key_col=key_col, z=z)


def anomalies_from_counts(
    counts: DataFrame, key_col: str = "key", z: float = 3.0
) -> DataFrame:
    """The median/MAD tail of ``robust_anomalies`` over an
    already-bucketed (key, bucket_ts, cnt) relation — the entry point a
    MAINTAINED counter view serves from (``streaming/counts_index.py``):
    the stats aggregate a keys x buckets relation, so serving never
    rescans the event history the counts were folded from."""
    stats = counts.groupBy("key").agg(
        F.expr("percentile(cnt, 0.5)").alias("med")
    )
    dev = counts.join(F.broadcast(stats), "key").withColumn(
        "abs_dev", F.abs(F.col("cnt") - F.col("med"))
    )
    mads = dev.groupBy("key").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad")
    )
    scale = 1.4826  # Gaussian consistency constant: MAD -> sigma
    flagged = dev.join(F.broadcast(mads), "key").where(
        (
            (F.col("mad") > 0)
            & (F.col("abs_dev") > F.lit(z) * F.lit(scale) * F.col("mad"))
        )
        | ((F.col("mad") == 0) & (F.col("abs_dev") > 0))
    )
    return flagged.select(
        F.col("key").alias(key_col),
        "bucket_ts",
        "cnt",
        "med",
        "mad",
        F.round(
            (F.col("cnt") - F.col("med"))
            / (F.lit(scale) * F.greatest(F.col("mad"), F.lit(0.5))),
            4,
        ).alias("robust_z"),
    )


def event_paths(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    top_n: int = 20,
    max_user_events: int = 1_000_000,
) -> DataFrame:
    """Top event-type PATHS: the ``top_n`` most frequent length-``k``
    consecutive event-type sequences across users — the "what do users
    actually do" Sankey/path-analysis reduction that sits beside the
    funnel (the funnel counts a DECLARED sequence; this discovers the
    frequent ones).

    Shape — one user-keyed shuffle, no self-joins: per user the events
    are gathered into one sorted array (``collect_list`` of
    (ts, tiebreak, type) structs + ``array_sort`` — struct ordering is
    field-lexicographic, so the ``tiebreak_col`` makes simultaneous
    events deterministic), the k-grams are sliced out map-side with
    ``transform(sequence(...))``, and a partial-agg count + ordered
    limit finishes.  The classic alternative — (k-1) self-joins of the
    event stream on consecutive row_numbers — shuffles the stream k
    times; this shuffles it once.

    Per-user array size is that user's own event count — and that bound
    is EXECUTABLE: a partial-agg count pass runs first, and any user
    above ``max_user_events`` raises a loud ValueError naming the
    offenders BEFORE any per-user array is built (same contract shape
    as the funnel index's orphan cap) — a single 10^8-event bot user is
    one straggler task otherwise, and silent truncation would bias the
    path counts.  The pre-check is map-side-combined over events, so it
    costs far less than the array shuffle it protects.

    NULL event types are kept, rendered as the ``(null)`` sentinel —
    ``concat_ws`` would otherwise silently DROP the null element,
    collapsing ``a>NULL>c`` into the 2-gram-looking ``a>c`` while a SQL
    ``||`` replay nulls the whole path; the sentinel pins one
    convention on both sides.  Ties at the ``top_n`` boundary are
    broken by path string ascending (round-before-rank determinism
    rule).

    Returns ``(path, n)`` ordered by n desc, path asc.
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(tiebreak_col).alias("tb"),
            F.coalesce(
                F.col(type_col).cast("string"), F.lit("(null)")
            ).alias("et"),
        ).alias("rec"),
    ).where(F.col("rec.t").isNotNull())
    offenders = (
        ev.groupBy("u")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .where(F.col("n_ev") > max_user_events)
        .orderBy(F.col("n_ev").desc(), "u")
        .limit(10)
        .collect()
    )
    if offenders:
        names = ", ".join(f"{r['u']}({r['n_ev']})" for r in offenders)
        raise ValueError(
            f"event_paths: user(s) above the max_user_events="
            f"{max_user_events} per-user array bound: {names} (top 10 "
            f"shown); filter or cap those users upstream, or raise the "
            f"bound if the executors have the memory for it"
        )
    seqs = ev.groupBy("u").agg(
        F.array_sort(F.collect_list("rec")).alias("recs")
    )
    types = F.transform(F.col("recs"), lambda r: r["et"])
    grams = seqs.select(
        F.explode(
            F.when(
                F.size("recs") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("recs") - F.lit(k)),
                    lambda i: F.concat_ws(
                        ">", *[F.element_at(types, i + j + 1) for j in range(k)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(top_n)
    )
