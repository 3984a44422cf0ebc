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
