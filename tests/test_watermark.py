"""Watermark semantics under a real stream: once the watermark has
advanced past a window (persisted in the checkpoint), a later-arriving
event inside that window must not reopen it (append-mode eviction),
while in-order data flows through batch-equivalently."""

import os

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming.windows import tumbling_counts


def _drain_to_parquet(spark, src, schema, out_dir, ckpt):
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        tumbling_counts(stream, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_late_event_does_not_reopen_closed_window(spark, sf_dir, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    ev = load_table(spark, "events", sf_dir).select("ts", "event_type", "value")
    t0 = ev.agg(F.min("ts")).collect()[0][0]
    hour1 = F.lit(t0) + F.expr("INTERVAL 1 HOUR")

    # RUN 1: everything except the first hour -> watermark (checkpointed)
    # advances to max(ts) - 10min, far past hour zero
    ev.filter(F.col("ts") >= hour1).coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, ev.schema, out, ckpt)

    # RUN 2 (same checkpoint): hour-zero events arrive — hopelessly late
    ev.filter(F.col("ts") < hour1).coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, ev.schema, out, ckpt)

    got = spark.read.parquet(out)
    # hour-zero windows start at floor(t0); run 1's earliest legitimate
    # window starts one hour later — nothing before that may exist
    run1_first = F.date_trunc("hour", F.lit(t0)) + F.expr("INTERVAL 1 HOUR")
    late = got.filter(F.col("window_start") < run1_first)
    assert late.count() == 0
    # and run 1's on-time windows were finalized and emitted
    assert got.count() > 0


def test_in_order_stream_matches_batch(spark, sf_dir, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    ev = load_table(spark, "events", sf_dir).select("ts", "event_type", "value")
    ev.coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, ev.schema, out, ckpt)
    # run 2: a sentinel far in the future closes every remaining window
    sentinel = ev.limit(1).select(
        (F.col("ts") + F.expr("INTERVAL 100 DAYS")).alias("ts"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, ev.schema, out, ckpt)

    got = spark.read.parquet(out).filter(F.col("event_type") != "sentinel")
    want = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "total_value")
    )
    g = {(r.window_start, r.event_type): (r.n, r.total_value) for r in got.collect()}
    w = {(r.window_start, r.event_type): (r.n, r.total_value) for r in want.collect()}
    assert g == w and len(g) > 0
