"""Temporal joins (operators/temporal.py): as-of and banded range.

The registry rows (events_asof, events_band_pairs) are oracle-checked
end-to-end; these tests pin the contract edges on crafted rows: the
inclusive <= visibility rule, null on no-prior, deterministic equal-ts
tiebreaks, tolerance staleness, band-boundary inclusivity, cross-bin
neighbor discovery, and exactly-once pair emission.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.operators.temporal import asof_join, band_join_binned


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (qid, key, ts, px) — two equal-ts rows for key b at 10:00
    rows = [
        (1, "a", ts("2024-01-01 09:00:00"), 10.0),
        (2, "a", ts("2024-01-01 10:00:00"), 11.0),
        (3, "b", ts("2024-01-01 10:00:00"), 20.0),
        (4, "b", ts("2024-01-01 10:00:00"), 21.0),
    ]
    return spark.createDataFrame(
        rows, "qid int, key string, ts timestamp, px double"
    )


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (10, "a", ts("2024-01-01 08:59:59")),  # before any quote
        (11, "a", ts("2024-01-01 09:30:00")),  # sees quote 1
        (12, "a", ts("2024-01-01 10:00:00")),  # equal ts: sees quote 2
        (13, "b", ts("2024-01-01 12:00:00")),  # sees the tiebreak winner
        (14, "c", ts("2024-01-01 12:00:00")),  # key with no quotes
    ]
    return spark.createDataFrame(rows, "tid int, key string, ts timestamp")


def test_asof_visibility_and_ties(spark, quotes, trades):
    out = {
        r.tid: r
        for r in asof_join(
            trades,
            quotes,
            ["key"],
            value_cols=("px", "qid"),
            tiebreak_col="qid",
        ).collect()
    }
    assert len(out) == 5  # every left row survives
    assert out[10].asof_px is None  # nothing at-or-before
    assert out[11].asof_px == 10.0
    assert out[12].asof_px == 11.0  # r.ts <= l.ts is INCLUSIVE
    assert out[13].asof_qid == 4  # equal-ts dup resolved to max tiebreak
    assert out[14].asof_px is None  # unknown key


def test_asof_tolerance(spark, quotes, trades):
    out = {
        r.tid: r
        for r in asof_join(
            trades,
            quotes,
            ["key"],
            value_cols=("px",),
            tiebreak_col="qid",
            tolerance_seconds=1800,
        ).collect()
    }
    assert out[11].asof_px == 10.0  # 30 min old: exactly at tolerance
    assert out[13].asof_px is None  # 2 h old: stale, nulled


def test_band_join_boundaries_and_uniqueness(spark):
    rows = [
        (1, "u", ts("2024-01-01 10:00:00")),
        (2, "u", ts("2024-01-01 11:00:00")),  # exactly band from 1
        (3, "u", ts("2024-01-01 11:00:01")),  # band+1s from 1
        (4, "v", ts("2024-01-01 10:30:00")),  # other key
    ]
    ev = spark.createDataFrame(rows, "event_id int, user_id string, ts timestamp")
    pairs = (
        band_join_binned(ev, ev, ["user_id"], band_seconds=3600)
        .where(F.col("l.event_id") < F.col("r.event_id"))
        .select(
            F.col("l.event_id").alias("lid"),
            F.col("r.event_id").alias("rid"),
            "dt_us",
        )
        .collect()
    )
    got = sorted((r.lid, r.rid) for r in pairs)
    # (1,2) exactly at the band (inclusive), (2,3) adjacent, (1,3) just
    # outside, key v isolated; each pair exactly once despite the
    # 3-bin probe explode
    assert got == [(1, 2), (2, 3)]
    assert len(got) == len(set(got))
    dt = {(r.lid, r.rid): r.dt_us for r in pairs}
    assert dt[(1, 2)] == 3600 * 1_000_000


def test_band_join_finds_cross_bin_neighbors(spark):
    # two events 2s apart straddling a bin boundary (bin = 3600s, so
    # 10:59:59 and 11:00:01 land in different bins)
    rows = [
        (1, "u", ts("2024-01-01 10:59:59")),
        (2, "u", ts("2024-01-01 11:00:01")),
    ]
    ev = spark.createDataFrame(rows, "event_id int, user_id string, ts timestamp")
    pairs = (
        band_join_binned(ev, ev, ["user_id"], band_seconds=3600)
        .where(F.col("l.event_id") < F.col("r.event_id"))
        .collect()
    )
    assert len(pairs) == 1 and pairs[0].dt_us == 2_000_000


# --- property tests: the reductions equal their naive references ---

from hypothesis import given, settings
from hypothesis import strategies as st

_events = st.lists(
    st.tuples(
        st.sampled_from(["u", "v"]),          # key
        st.integers(min_value=0, max_value=120),  # seconds offset
    ),
    min_size=0,
    max_size=12,
)


def _mk(spark, rows):
    data = [
        (i, k, datetime(2024, 1, 1, 0, s // 60, s % 60))
        for i, (k, s) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id int, user_id string, ts timestamp"
    )


@settings(max_examples=15, deadline=None)
@given(left=_events, right=_events)
def test_asof_equals_naive(spark, left, right):
    l_df, r_df = _mk(spark, left), _mk(spark, right)
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(
            l_df, r_df, ["user_id"], value_cols=("event_id",),
            tiebreak_col="event_id",
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [
            (rs, j) for j, (rk, rs) in enumerate(right) if rk == k and rs <= s
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (left, right, i)


@settings(max_examples=15, deadline=None)
@given(rows=_events, band=st.sampled_from([1, 7, 30]))
def test_band_join_equals_naive(spark, rows, band):
    df = _mk(spark, rows)
    got = sorted(
        (r.l.event_id, r.r.event_id)
        for r in band_join_binned(df, df, ["user_id"], band_seconds=band)
        .where(F.col("l.event_id") < F.col("r.event_id"))
        .collect()
    )
    want = sorted(
        (i, j)
        for i, (ki, si) in enumerate(rows)
        for j, (kj, sj) in enumerate(rows)
        if i < j and ki == kj and abs(si - sj) <= band
    )
    assert got == want, (rows, band)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The scale path for the events_quantiles row: approx_percentile
    returns an actual order statistic (no interpolation), so the right
    accuracy contract is RANK error, not value error — the fraction of
    group values at or below the approx answer must sit within ±2
    percentile points of the requested 0.95."""
    from nomenklatura_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    approx = (
        events.groupBy("event_type")
        .agg(F.approx_percentile("value", 0.95, 10000).alias("approx"))
    )
    ranked = (
        events.join(approx, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.count_if(F.col("value") <= F.col("approx"))
                / F.count(F.lit(1))
            ).alias("rank_frac")
        )
        .collect()
    )
    assert ranked
    for r in ranked:
        assert 0.93 <= r.rank_frac <= 0.97, r


# ---------------------------------------------------------------------------
# ordered funnel


def test_funnel_order_horizon_and_strictness(spark):
    from nomenklatura_spark.operators.temporal import funnel_steps

    rows = [
        # u1 converts fully in order
        ("u1", "2024-01-01 10:00:00", "view"),
        ("u1", "2024-01-01 11:00:00", "click"),
        ("u1", "2024-01-02 09:00:00", "purchase"),
        # u2 clicked BEFORE viewing: click must not count; no purchase
        ("u2", "2024-01-01 08:00:00", "click"),
        ("u2", "2024-01-01 09:00:00", "view"),
        # u3 views then clicks, but purchase is outside the 7-day horizon
        ("u3", "2024-01-01 00:00:00", "view"),
        ("u3", "2024-01-02 00:00:00", "click"),
        ("u3", "2024-01-20 00:00:00", "purchase"),
        # u4 view+click at the SAME timestamp: strictly-after fails
        ("u4", "2024-01-01 12:00:00", "view"),
        ("u4", "2024-01-01 12:00:00", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        r["step"]: (r["event_type"], r["n_users"], r["conversion"])
        for r in funnel_steps(
            df, ["view", "click", "purchase"], within="7 DAYS"
        ).collect()
    }
    assert got[1] == ("view", 4, 1.0)
    assert got[2] == ("click", 2, 0.5)     # u1 and u3 only
    assert got[3] == ("purchase", 1, 0.25)  # u1 only
    # without a horizon u3's late purchase counts
    free = {
        r["step"]: r["n_users"]
        for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
    }
    assert free[3] == 2


def test_funnel_second_occurrence_qualifies(spark):
    from nomenklatura_spark.operators.temporal import funnel_steps

    # the FIRST click precedes the view, but a second click follows it:
    # first-touch per step means first QUALIFYING touch, not first ever
    rows = [
        ("u", "2024-01-01 08:00:00", "click"),
        ("u", "2024-01-01 09:00:00", "view"),
        ("u", "2024-01-01 10:00:00", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {r["step"]: r["n_users"]
           for r in funnel_steps(df, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_partition_invariant(spark):
    from nomenklatura_spark.operators.temporal import funnel_steps

    import random

    rnd = random.Random(11)
    types = ["view", "click", "purchase"]
    rows = [
        (f"u{rnd.randrange(40)}",
         f"2024-01-{rnd.randrange(1, 28):02d} {rnd.randrange(24):02d}:00:00",
         types[rnd.randrange(3)])
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    base = sorted(
        tuple(r) for r in funnel_steps(df, types, within="7 DAYS").collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in funnel_steps(
            df.repartition(17), types, within="7 DAYS"
        ).collect()
    )
    assert base == shuffled and base[0][2] > 0


def _funnel_reference(rows, steps, within_days=None):
    """Driver-side replay: per user, first qualifying time per step."""
    from collections import defaultdict
    from datetime import datetime, timedelta

    by_user = defaultdict(list)
    for u, ts, et in rows:
        by_user[u].append((datetime.fromisoformat(ts), et))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        prev = None
        horizon = None
        for i, step in enumerate(steps):
            cand = [
                t for t, et in evs
                if et == step
                and (prev is None or t > prev)
                and (horizon is None or t <= horizon)
            ]
            if not cand:
                break
            prev = min(cand)
            if i == 0 and within_days is not None:
                horizon = prev + timedelta(days=within_days)
            counts[i] += 1
    return counts


def test_funnel_matches_reference_on_random_streams(spark):
    import random

    from nomenklatura_spark.operators.temporal import funnel_steps

    steps = ["view", "click", "purchase"]
    for seed in (3, 17, 29):
        rnd = random.Random(seed)
        rows = [
            (f"u{rnd.randrange(25)}",
             f"2024-01-{rnd.randrange(1, 28):02d}T{rnd.randrange(24):02d}:"
             f"{rnd.randrange(60):02d}:00",
             steps[rnd.randrange(3)])
            for _ in range(300)
        ]
        df = spark.createDataFrame(
            rows, "user_id string, ts string, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        got = [
            r["n_users"]
            for r in funnel_steps(df, steps, within="7 DAYS")
            .orderBy("step").collect()
        ]
        assert got == _funnel_reference(rows, steps, within_days=7), seed


def test_funnel_repeated_step_types(spark):
    """A funnel may name the same event type twice (view -> view):
    step 2 needs a SECOND occurrence strictly after the first."""
    from nomenklatura_spark.operators.temporal import funnel_steps

    rows = [
        ("u1", "2024-01-01 10:00:00", "view"),
        ("u1", "2024-01-01 11:00:00", "view"),   # converts
        ("u2", "2024-01-01 10:00:00", "view"),   # only one view
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["step"]: r["n_users"]
           for r in funnel_steps(df, ["view", "view"]).collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_empty_first_step_reports_zero_conversion(spark):
    """ANSI mode is on in get_spark sessions: a stream where NO user
    reaches step 1 must report conversion 0.0, not raise
    DIVIDE_BY_ZERO (the denominator is the step-1 user count)."""
    from nomenklatura_spark.operators.temporal import funnel_steps

    rows = [
        ("u1", "2024-01-01 10:00:00", "click"),
        ("u2", "2024-01-01 11:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["step"]: (r["n_users"], r["conversion"])
        for r in funnel_steps(
            df, ["view", "click", "purchase"], within="7 DAYS"
        ).collect()
    }
    assert got == {1: (0, 0.0), 2: (0, 0.0), 3: (0, 0.0)}
    # fully empty stream: same contract
    empty = df.where(F.lit(False))
    got2 = {
        r["step"]: (r["n_users"], r["conversion"])
        for r in funnel_steps(empty, ["view", "click"]).collect()
    }
    assert got2 == {1: (0, 0.0), 2: (0, 0.0)}


def test_event_paths_crafted_and_short_users(spark):
    """k-gram extraction per user: ties broken by the tiebreak column,
    users with fewer than k events contribute nothing, counts add
    across users."""
    from nomenklatura_spark.operators.temporal import event_paths

    rows = [
        # u1: a b c d -> a>b>c, b>c>d
        ("u1", "2024-01-01 10:00:00", 1, "a"),
        ("u1", "2024-01-01 10:01:00", 2, "b"),
        ("u1", "2024-01-01 10:02:00", 3, "c"),
        ("u1", "2024-01-01 10:03:00", 4, "d"),
        # u2: same ts, order fixed by event_id -> a>b>c
        ("u2", "2024-01-01 11:00:00", 10, "a"),
        ("u2", "2024-01-01 11:00:00", 11, "b"),
        ("u2", "2024-01-01 11:00:00", 12, "c"),
        # u3: too short for k=3
        ("u3", "2024-01-01 12:00:00", 20, "a"),
        ("u3", "2024-01-01 12:01:00", 21, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["path"]: r["n"] for r in event_paths(df, k=3).collect()
    }
    assert got == {"a>b>c": 2, "b>c>d": 1}
    # k=2 sees u3 too
    got2 = {r["path"]: r["n"] for r in event_paths(df, k=2).collect()}
    assert got2 == {"a>b": 3, "b>c": 2, "c>d": 1}


def test_event_paths_null_type_sentinel(spark):
    """A NULL event_type must ride the path as the '(null)' sentinel —
    NOT be silently dropped by concat_ws (which would collapse
    a>NULL>c into a fake 'a>c') and NOT null the whole path (the SQL
    || convention); both sides pin the sentinel."""
    from nomenklatura_spark.operators.temporal import event_paths

    rows = [
        ("u1", "2024-01-01 10:00:00", 1, "a"),
        ("u1", "2024-01-01 10:01:00", 2, None),
        ("u1", "2024-01-01 10:02:00", 3, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["path"]: r["n"] for r in event_paths(df, k=3).collect()}
    assert got == {"a>(null)>c": 1}
    got2 = {r["path"]: r["n"] for r in event_paths(df, k=2).collect()}
    assert got2 == {"a>(null)": 1, "(null)>c": 1}


def test_event_paths_bot_user_cap_raises(spark):
    """The executable per-user bound: a user past max_user_events must
    raise loudly (naming the user and count) BEFORE any per-user array
    is built; capped-but-legal users still work."""
    import pytest

    from nomenklatura_spark.operators.temporal import event_paths

    rows = [
        ("bot", f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}", i, "x")
        for i in range(40)
    ] + [
        ("ok", "2024-01-01 10:00:00", 100, "a"),
        ("ok", "2024-01-01 10:01:00", 101, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match=r"bot\(40\).*max_user_events|max_user_events.*bot\(40\)"):
        event_paths(df, k=2, max_user_events=30)
    # at the bound exactly: allowed
    got = {
        r["path"]: r["n"]
        for r in event_paths(df, k=2, max_user_events=40).collect()
    }
    assert got["a>b"] == 1 and got["x>x"] == 39


def test_event_paths_topn_tiebreak_deterministic(spark):
    from nomenklatura_spark.operators.temporal import event_paths

    # two paths with equal counts: limit 1 must take the lexicographic
    # smaller one, every run
    rows = [
        ("u1", "2024-01-01 10:00:00", 1, "z"),
        ("u1", "2024-01-01 10:01:00", 2, "z"),
        ("u2", "2024-01-01 10:00:00", 3, "a"),
        ("u2", "2024-01-01 10:01:00", 4, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    for _ in range(3):
        (row,) = event_paths(df, k=2, top_n=1).collect()
        assert (row["path"], row["n"]) == ("a>a", 1)
