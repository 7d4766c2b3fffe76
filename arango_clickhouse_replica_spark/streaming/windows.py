"""Event-time windowed aggregations on a stream (SURVEY §2.8 T5 — the
engine's addition; the reference has no event-time processing).

The builders are the SAME expressions as the batch queries in
``queries/windows.py`` — one definition, certified by the batch DuckDB
oracle, executed here under Structured Streaming with a watermark for
late-data eviction. ``applyInPandasWithState`` is intentionally NOT needed:
tumbling/sliding/session windows are all built-in stateful operators.

Scale notes: state lives in the state store keyed by (window, group);
the watermark bounds state size — without it a 100 TB stream accretes
state forever. Session windows merge state per key; skewed users are
handled by AQE on the shuffle feeding the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_unique_users(events: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(F.col("window.start").alias("window_start"), "approx_users")
    )


def session_values(events: DataFrame, *, gap: str = "5 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
