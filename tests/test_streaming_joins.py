"""Stream-stream interval join and watermark dedup must match their
batch twins (the attribution twin is oracle-certified against DuckDB via
q_click_purchase_attribution)."""

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming.joins import (
    click_purchase_pairs,
    watermark_dedup,
)


@pytest.fixture
def event_stream(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    path = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(path)
    return spark.readStream.schema(ev.schema).parquet(path), ev


def _run_append(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_stream_interval_join_matches_batch(spark, event_stream):
    stream, ev = event_stream
    got = _run_append(spark, click_purchase_pairs(stream), "t_attrib")
    want = click_purchase_pairs(ev)
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.count() > 0


def test_watermark_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    """A doubled stream (every event delivered twice) collapses back to
    the exact batch dedup result."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    path = str(tmp_path / "doubled")
    ev.unionAll(ev).repartition(4).write.parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)

    got = _run_append(spark, watermark_dedup(stream, ["event_id"]), "t_wmdedup")
    assert got.count() == ev.count()
    # same key set, not just the same cardinality
    assert got.select("event_id").distinct().count() == ev.count()


def test_watermark_dedup_batch_twin_is_exact_dedup(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    doubled = ev.unionAll(ev)
    assert watermark_dedup(doubled, ["event_id"]).count() == ev.count()


def test_watermark_dedup_batch_twin_keeps_first_delivery_payload(spark, sf_dir):
    """The batch twin must pick the SAME survivor as the streaming path
    (first delivery = min ts per key), including payload columns — not an
    arbitrary row per key."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    # second delivery of every key, one hour later, with a poisoned payload
    redelivered = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")) \
                    .withColumn("user_id", F.lit(-1).cast("long"))
    got = watermark_dedup(ev.unionAll(redelivered), ["event_id"])
    assert got.filter(F.col("user_id") == -1).count() == 0
    assert sorted(got.collect()) == sorted(ev.collect())


def test_stream_stream_join_checkpoint_restart_incremental(spark, sf_dir, tmp_path):
    """Checkpointed restarts: a second run with no new input emits
    nothing; appending new events emits ONLY the new pairs (exactly-once
    across restarts, the CDC T2/T3 property on the interval join)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    # Split by TIME, not by key: the second delivery must be FUTURE data.
    # A key-interleaved split would deliver events older than run 1's
    # final watermark, which streaming correctly drops as late — the
    # restart property under test is incremental progress, not late-data
    # recovery.
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    first = ev.filter(F.col("ts") <= F.lit(cut))
    second = ev.filter(F.col("ts") > F.lit(cut))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    first.repartition(2).write.mode("append").parquet(src)

    def run_once():
        q = (
            click_purchase_pairs(
                spark.readStream.schema(ev.schema).parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = run_once()
    assert n1 == click_purchase_pairs(first).count()

    # restart with no new data: nothing new is emitted
    assert run_once() == n1

    # append the second half: only the incremental pairs appear
    second.repartition(2).write.mode("append").parquet(src)
    n3 = run_once()
    assert n3 == click_purchase_pairs(ev).count()
    assert n3 > n1
