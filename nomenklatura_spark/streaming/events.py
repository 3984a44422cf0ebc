"""Streaming analytics over event streams: watermarked tumbling-window
aggregation and stateful sessionization.

The reference has no stream runtime (SURVEY.md §2.12) — these are the
Spark-native equivalents of its incremental patterns, and the windowed
aggregation is the streaming twin of the batch ``events_hourly`` query
(same groupBy, plus watermark for late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data handling.

    Works identically on a batch frame (window() is a plain function) and
    a stream (watermark bounds state). State per window×type is tiny; the
    shuffle key is (window, event_type).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session (session_window — Spark's built-in stateful session
    operator; no applyInPandasWithState needed for this shape).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, gap)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
