"""Streaming window aggregations must produce the same results as their
batch twins (which are oracle-certified against DuckDB)."""

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming.windows import session_values, tumbling_counts


@pytest.fixture
def event_stream(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(path)
    return spark.readStream.schema(ev.schema).parquet(path), ev


def _run_complete(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_streaming_tumbling_matches_batch(spark, event_stream):
    stream, ev = event_stream
    got = _run_complete(spark, tumbling_counts(stream), "t_tumble")
    want = tumbling_counts(ev)  # same builder on the batch frame
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.count() > 0


def test_streaming_sessions_match_batch(spark, event_stream):
    stream, ev = event_stream
    got = _run_complete(spark, session_values(stream), "t_sess")
    want = session_values(ev)
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.count() > 0
