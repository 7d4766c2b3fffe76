"""End-to-end Structured Streaming CDC tests: file-based envelope stream ->
foreachBatch apply -> append-only target -> merge-on-read latest views.
Mirrors the reference's producer->consumer flow with checkpoint-based
progress instead of Redis ticks / Kafka commits."""

import os

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.cdc import latest_alive
from arango_clickhouse_replica_spark.sources.cdc_envelopes import synthetic_event_envelopes
from arango_clickhouse_replica_spark.streaming import CdcPipeline


@pytest.fixture
def dirs(tmp_path):
    d = {
        "env": str(tmp_path / "envelopes"),
        "target": str(tmp_path / "target"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["env"])
    return d


def _write_envelopes(spark, sf_dir, env_dir, n_files=3):
    env = synthetic_event_envelopes(spark, sf_dir)
    env.repartition(n_files).write.mode("append").parquet(env_dir)
    return env.schema


def test_stream_matches_batch_pipeline(spark, sf_dir, dirs):
    schema = _write_envelopes(spark, sf_dir, dirs["env"])
    pipe = CdcPipeline(
        spark,
        target_dir=dirs["target"],
        checkpoint_dir=dirs["ckpt"],
        keys=["event_id"],
        initial_tick=0,
    )
    pipe.run_until_drained(dirs["env"], schema)

    # batch-computed expectation over the same envelopes
    from arango_clickhouse_replica_spark.operators.cdc import preprocess_envelopes

    batch = latest_alive(
        preprocess_envelopes(
            spark.read.schema(schema).parquet(dirs["env"]), initial_tick=0
        ),
        keys=["event_id"],
    )
    got = {(r.event_id, r.value) for r in pipe.latest_alive().collect()}
    want = {(r.event_id, r.value) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_restart_is_idempotent(spark, sf_dir, dirs):
    """New files after a restart are processed exactly once; re-delivered
    envelopes are absorbed by version dedup (T2/T3)."""
    schema = _write_envelopes(spark, sf_dir, dirs["env"])
    pipe = CdcPipeline(
        spark,
        target_dir=dirs["target"],
        checkpoint_dir=dirs["ckpt"],
        keys=["event_id"],
        initial_tick=0,
    )
    pipe.run_until_drained(dirs["env"], schema)
    first = {(r.event_id, r.value) for r in pipe.latest_alive().collect()}

    # restart with the same checkpoint: nothing new -> state unchanged
    pipe.run_until_drained(dirs["env"], schema)
    assert {(r.event_id, r.value) for r in pipe.latest_alive().collect()} == first

    # write a late update for one key and restart again
    one = (
        spark.read.schema(schema).parquet(dirs["env"])
        .filter(F.col("type") == 2300)
        .orderBy("tick")
        .limit(1)
    )
    bump = one.withColumn("tick", F.col("tick") + 1_000_000).withColumn(
        "data", F.col("data").withField("value", F.lit(9999.0))
    )
    bump.write.mode("append").parquet(dirs["env"])
    pipe.run_until_drained(dirs["env"], schema)
    updated = {r.event_id: r.value for r in pipe.latest_alive().collect()}
    bumped_key = one.collect()[0].data.event_id
    assert updated[bumped_key] == 9999.0


def test_compact_preserves_latest_state(spark, sf_dir, dirs):
    schema = _write_envelopes(spark, sf_dir, dirs["env"])
    pipe = CdcPipeline(
        spark,
        target_dir=dirs["target"],
        checkpoint_dir=dirs["ckpt"],
        keys=["event_id"],
        initial_tick=0,
    )
    pipe.run_until_drained(dirs["env"], schema)
    before = {(r.event_id, r.value) for r in pipe.latest_alive().collect()}
    raw_before = pipe.raw().count()
    pipe.compact()
    after = {(r.event_id, r.value) for r in pipe.latest_alive().collect()}
    assert after == before
    assert pipe.raw().count() < raw_before  # duplicates physically removed


def test_schema_evolution_across_restarts(spark, tmp_path):
    """A field added to the source collection between runs must surface in
    latest() (null-backfilled for pre-evolution rows) — parquet footers in
    the append-only target disagree after evolution, so raw() merges them."""
    from arango_clickhouse_replica_spark.streaming import CdcPipeline

    pipe = CdcPipeline(
        spark,
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        keys=["id"],
    )
    v1 = spark.createDataFrame(
        [(1, 2300, "c1", (10, "a"))],
        "tick long, type int, cuid string, data struct<id:long, name:string>",
    )
    v2 = spark.createDataFrame(
        [(2, 2300, "c1", (20, "b", "x@y.z"))],
        "tick long, type int, cuid string, "
        "data struct<id:long, name:string, email:string>",
    )
    pipe._apply_batch(v1, batch_id=0)
    pipe._apply_batch(v2, batch_id=1)

    rows = {r.id: r for r in pipe.latest().collect()}
    assert set(rows) == {10, 20}
    assert rows[20].email == "x@y.z"
    assert rows[10].email is None  # pre-evolution row, null-backfilled
