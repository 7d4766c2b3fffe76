"""Stream-stream interval join + watermark-bounded dedup (SURVEY §2.8
extensions — the reference's pipeline is single-stream CDC; these are
the two stateful multi-stream operators an event-analytics engine adds).

Both builders run the SAME expressions on a batch frame (where
``withWatermark`` is a no-op) and on a stream — the batch twin is
certified against the DuckDB oracle (queries/analytics.py
``q_click_purchase_attribution``), the streaming run must match it
(tests/test_streaming_joins.py), same pattern as streaming/windows.py.

Scale notes (100 TB/day stream):

- The interval join keys state by user_id; each side buffers only rows
  younger than (watermark + interval) — the join condition's time bound
  is what lets Spark evict, so it MUST be a range on both event-times,
  never a bare equi-join on user_id.
- ``dropDuplicatesWithinWatermark`` holds one state row per key seen in
  the watermark horizon — unlike ``dropDuplicates`` on a stream, state
  is evicted, so it survives unbounded streams. Exactly the CDC
  redelivery-suppression shape (a key redelivered within the horizon is
  dropped; one delivered much later is a NEW logical event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_pairs(
    events: DataFrame,
    *,
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Attribution pairs: every (click, purchase) by the same user where
    the click lands in the ``lookback`` window before the purchase.

    On a stream, both sides carry watermarks and the join condition
    bounds both event-times, so state for a user is evicted once the
    watermark passes (purchase_ts - lookback). On a batch frame the
    same expression is a plain range join.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def watermark_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first delivery of each key within the watermark horizon.

    ``dropDuplicatesWithinWatermark``: state per key is DROPPED once the
    watermark passes its event time — bounded state on an unbounded
    stream, which plain ``dropDuplicates`` cannot guarantee. The batch
    twin picks the SAME survivor the streaming path keeps — the first
    delivery, i.e. the minimum (ts, event_id) per key — via a
    row_number window rather than ``dropDuplicates`` (which keeps an
    ARBITRARY row per key for non-key columns, so payload columns of
    the twin would not be replay-stable).
    """
    keys = keys or ["event_id"]
    wm = events.withWatermark("ts", watermark)
    if wm.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    from pyspark.sql.window import Window

    order = [F.asc("ts")] + (
        [F.asc("event_id")] if "event_id" in events.columns else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        wm.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
