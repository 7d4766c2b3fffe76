"""Tick-gap detection (streaming/monitor.py, SURVEY §2.10 A2): the
'ticks lost asked for X but got Y' alarm of the reference's WAL tail
(publisher.py:140-141), driven through both direct observe() calls and a
real gapped envelope stream via CdcPipeline."""

import os

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.sources.cdc_envelopes import (
    synthetic_event_envelopes,
)
from arango_clickhouse_replica_spark.streaming import CdcPipeline
from arango_clickhouse_replica_spark.streaming.monitor import TickGapMonitor


def _env(spark, ticks):
    rows = [(t, 2300, "c1", {"k": str(t)}) for t in ticks]
    return spark.createDataFrame(
        rows, "tick long, type int, cuid string, data map<string,string>"
    )


def test_contiguous_batches_no_gap(spark):
    mon = TickGapMonitor()
    assert mon.observe(_env(spark, [1, 2, 3]), 0) is None
    assert mon.observe(_env(spark, [4, 5]), 1) is None
    assert mon.gaps == [] and mon.last_tick == 5


def test_gap_between_batches_detected(spark):
    mon = TickGapMonitor()
    mon.observe(_env(spark, [1, 2, 3]), 0)
    gap = mon.observe(_env(spark, [8, 9]), 1)
    assert gap is not None
    assert (gap.expected_from, gap.observed_from, gap.missing) == (4, 8, 4)
    assert mon.gaps == [gap]
    assert mon.last_tick == 9


def test_empty_batch_is_ignored(spark):
    mon = TickGapMonitor()
    mon.observe(_env(spark, [1, 2]), 0)
    assert mon.observe(_env(spark, []), 1) is None
    assert mon.last_tick == 2 and mon.gaps == []


def test_gap_alarm_fires_through_pipeline(spark, sf_dir, tmp_path):
    """A gapped envelope directory drives the monitor via foreachBatch."""
    env_dir = str(tmp_path / "env")
    os.makedirs(env_dir)
    env = synthetic_event_envelopes(spark, sf_dir).filter(F.col("data").isNotNull())
    lo = env.filter(F.col("tick") <= 20)
    hi = env.filter(F.col("tick") > 1000)  # ticks 21..1000 lost
    lo.coalesce(1).write.mode("append").parquet(env_dir)
    first_files = set(os.listdir(env_dir))

    alarms = []
    mon = TickGapMonitor(on_gap=alarms.append)
    pipe = CdcPipeline(
        spark,
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        keys=["event_id"],
        tick_monitor=mon,
    )
    pipe.run_until_drained(env_dir, env.schema)
    assert mon.gaps == []  # first range alone is gap-free at its start

    hi.coalesce(1).write.mode("append").parquet(env_dir)
    assert set(os.listdir(env_dir)) != first_files
    pipe.run_until_drained(env_dir, env.schema)
    assert len(mon.gaps) >= 1
    assert alarms == mon.gaps
    assert mon.gaps[0].expected_from == 21
    assert mon.gaps[0].observed_from > 1000


def test_batch_progress_records(spark):
    """Per-batch progress (the reference's 'processed X-Y: overall N docs'
    log, publisher.py:155-156) accumulates alongside gap detection."""
    mon = TickGapMonitor()
    mon.observe(_env(spark, [1, 2, 3]), 0)
    mon.observe(_env(spark, []), 1)
    mon.observe(_env(spark, [8, 9]), 2)
    assert [(p.batch_id, p.tick_from, p.tick_to, p.n_envelopes)
            for p in mon.progress] == [(0, 1, 3, 3), (2, 8, 9, 2)]
