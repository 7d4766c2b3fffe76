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


def global_lateness_seconds(
    rows: DataFrame, *, ts_col: str = "ts", arrival_col: str = "_ver"
) -> int:
    """Worst GLOBAL event-time lateness of ``rows`` in whole seconds
    (ceiling): replay arrival order (``arrival_col``), track the running
    max event time over ALL keys, and measure how far behind it any
    row's event time falls. This — not the per-user census — is the
    quantity a ``withWatermark`` delay must cover, because Spark's
    watermark is global: max(event time seen) - delay, regardless of
    grouping keys (a per-key lateness under-sizes it whenever another
    key has already advanced the clock). One single-partition window
    pass; at 100 TB run it over a time-bounded sample of the stream,
    not the world."""
    from pyspark.sql.window import Window

    ts_us = F.unix_micros(ts_col)
    w = Window.orderBy(arrival_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    worst = (
        rows.select(ts_us.alias("t"), F.max(ts_us).over(w).alias("hw"))
        .select(
            F.max(
                F.when(F.col("hw") > F.col("t"), F.col("hw") - F.col("t"))
                .otherwise(0)
            ).alias("m")
        )
        .collect()[0].m
    ) or 0
    return -(-int(worst) // 1_000_000)  # ceil micro -> whole seconds


def size_watermark_from_lateness(
    spark, sf_dir: str, *, safety_factor: float = 1.25, floor_s: int = 60
) -> str:
    """Data-driven ``withWatermark`` delay (VERDICT r8 item 6 — closes
    the loop between the late-arrival census and T5): measures the WAL
    change stream's worst global event-time lateness (the same relation
    ``cdc_late_arrival_report`` censuses — that report names WHICH users
    cause the disorder; this helper sizes the bound a global watermark
    needs, which is the running max over ALL keys, never smaller than
    any per-user figure) and returns a Spark interval string:

    - +1 s so a sub-second remainder can't poke past the whole-second
      measurement;
    - times ``safety_factor`` for drift beyond the sample;
    - never below ``floor_s``.

    An event-time window using the returned delay admits every late
    event the measurement saw (proved end to end in
    tests/test_watermark.py: split the stream at the arrival-order
    midpoint so the checkpointed watermark advances between runs, then
    batch-compare; a zero-delay control drops rows on the same data).
    """
    import math

    from ..queries.cdc_queries import (
        preprocess_envelopes,
        synthetic_event_envelopes,
    )

    rows = preprocess_envelopes(
        synthetic_event_envelopes(spark, sf_dir),
        tracked_cuids=["c_events"], initial_tick=0,
    )
    worst = global_lateness_seconds(rows)
    secs = max(int(floor_s), int(math.ceil((worst + 1) * safety_factor)))
    return f"{secs} seconds"


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
