"""Robust anomaly detection (operators/temporal.robust_anomalies):
injected spikes flagged, baseline hours quiet, zero-MAD convention,
broadcast stats in the plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from nomenklatura_spark.operators.temporal import robust_anomalies


def _events(spark):
    """14 days x 24h of 'steady' (5 events/hour), one 50-event spike;
    plus a 'constant' key at exactly 1/hour with a single 3-event hour."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(14 * 24):
        ts = base + dt.timedelta(hours=h)
        n = 50 if h == 100 else 5
        for _ in range(n):
            rows.append(Row(event_type="steady", ts=ts, event_id=eid))
            eid += 1
        for _ in range(3 if h == 7 else 1):
            rows.append(Row(event_type="constant", ts=ts, event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def test_spike_flagged_baseline_quiet(spark):
    out = robust_anomalies(_events(spark), "event_type", "ts").collect()
    steady = [r for r in out if r["event_type"] == "steady"]
    assert len(steady) == 1
    r = steady[0]
    assert r["bucket_ts"] == dt.datetime(2024, 3, 1) + dt.timedelta(hours=100)
    assert r["cnt"] == 50 and r["med"] == 5.0
    # mad = 0 for the steady series (all non-spike hours identical), so
    # the score uses the 0.5 floor: (50-5)/(1.4826*0.5)
    assert abs(r["robust_z"] - round(45 / (1.4826 * 0.5), 4)) < 1e-9


def test_zero_mad_constant_key(spark):
    out = robust_anomalies(_events(spark), "event_type", "ts").collect()
    const = [r for r in out if r["event_type"] == "constant"]
    assert len(const) == 1
    assert const[0]["cnt"] == 3 and const[0]["mad"] == 0.0
    assert const[0]["robust_z"] > 0


def test_no_false_positives_without_outliers(spark):
    rows = [
        Row(event_type="flat", ts=dt.datetime(2024, 3, 1, h), event_id=h)
        for h in range(24)
    ]
    out = robust_anomalies(spark.createDataFrame(rows), "event_type", "ts")
    assert out.count() == 0


def test_stats_joins_are_broadcast(spark):
    plan = (
        robust_anomalies(_events(spark), "event_type", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
