"""Event-time window analytics on the events stream (SURVEY §2.8 T5).

The reference has no event-time processing (order comes from WAL ticks);
these are the engine's additions: tumbling / sliding / session windows,
expressed with the SAME functions Structured Streaming uses
(``F.window`` / ``F.session_window``), so the batch oracle here certifies
the streaming path's window semantics too (streaming/windows.py reuses
these builders on a readStream DataFrame with a watermark).

Scale: windowed aggregation shuffles on (window, keys) with map-side
partial aggregation; sliding windows multiply rows by window/slide before
the shuffle (x2 here) — Catalyst expands them JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_DEC = "CAST(value AS DECIMAL(18,2))"


@query(
    "q_tumbling_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM({_DEC}) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
    tags=("window-time", "tumbling"),
    doc="Tumbling 1-hour window per event type (T5): epoch-aligned, "
        "identical to the streaming groupBy(window(ts, '1 hour')).",
)
def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = F.window("ts", "1 hour")
    return ev.groupBy(w, "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "q_sliding_hourly_30m",
    oracle=f"""
    WITH slid AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - to_minutes(30 * g) AS window_start,
             user_id, value, ts
      FROM events, generate_series(0, 1) AS t(g)
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS unique_users,
           CAST(SUM({_DEC}) AS DOUBLE) AS total_value
    FROM slid
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
    tags=("window-time", "sliding"),
    doc="Sliding window (1 h length, 30 min slide): each event lands in 2 "
        "windows; matches streaming window(ts, '1 hour', '30 minutes').",
)
def q_sliding_hourly_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = F.window("ts", "1 hour", "30 minutes")
    return ev.groupBy(w).agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("unique_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
        "unique_users",
        "total_value",
    )


@query(
    "q_session_windows_5m",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             -- Spark session_window ends are EXCLUSIVE ([start, last+gap)):
             -- a gap of exactly 5 minutes starts a NEW session, hence >=.
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM({_DEC}) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window-time", "session"),
    doc="Session windows with 5-minute gap (T5): F.session_window "
        "(streaming-stateful in the stream path) vs. classic "
        "lag+cumsum sessionization as the SQL oracle. Spark's session end "
        "= last event + gap, mirrored as MAX(ts) + 5 min.",
)
def q_session_windows_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(F.session_window("ts", "5 minutes"), "user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    ).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "session_value",
    )
