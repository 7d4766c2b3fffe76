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
