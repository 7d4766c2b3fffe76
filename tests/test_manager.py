"""Control-plane tests: supervised per-table queries (status / restart
policy) and full-resync orchestration."""

import os
import time

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.cdc import preprocess_envelopes
from arango_clickhouse_replica_spark.sources.cdc_envelopes import synthetic_event_envelopes
from arango_clickhouse_replica_spark.streaming import CdcPipeline
from arango_clickhouse_replica_spark.streaming.manager import (
    ReplicationManager,
    RestartPolicy,
    TableRunner,
)


@pytest.fixture
def runner(spark, sf_dir, tmp_path):
    env_dir = str(tmp_path / "env")
    os.makedirs(env_dir)
    env = synthetic_event_envelopes(spark, sf_dir)
    env.write.mode("append").parquet(env_dir)
    pipe = CdcPipeline(
        spark,
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        keys=["event_id"],
        initial_tick=0,
    )
    return TableRunner(
        name="events",
        pipeline=pipe,
        envelope_dir=env_dir,
        envelope_schema=env.schema,
        policy=RestartPolicy(max_restarts=2, min_up_time_s=0.0, restart_delay_s=0.0),
    )


def _wait_for_rows(pipe, timeout=60):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            if pipe.raw().count() > 0:
                return True
        except Exception:
            pass
        time.sleep(0.5)
    return False


def test_runner_status_and_stop(spark, runner):
    runner.start()
    try:
        assert _wait_for_rows(runner.pipeline)
        st = runner.status()
        assert st["table"] == "events" and st["active"]
    finally:
        runner.stop()
    assert not runner.status()["active"]


def test_supervisor_restarts_dead_query(spark, runner):
    runner.start()
    try:
        assert _wait_for_rows(runner.pipeline)
        runner.query.stop()  # simulated crash
        assert runner.supervise_once()  # restarted
        assert runner.status()["active"]
        assert runner.restarts in (0, 1)
        # give up after max_restarts consecutive fast deaths
        runner.policy.min_up_time_s = 1e9  # uptime never counts as healthy
        runner.query.stop()
        assert runner.supervise_once()
        runner.query.stop()
        assert not runner.supervise_once()  # cap reached
    finally:
        runner.stop()


def test_resync_rebuilds_and_restarts(spark, sf_dir, runner):
    mgr = ReplicationManager(spark)
    mgr.add(runner)
    mgr.start_all()
    try:
        assert _wait_for_rows(runner.pipeline)
        before = runner.pipeline.latest_alive().count()

        # snapshot = the preprocessed envelopes themselves (schema match)
        snap = preprocess_envelopes(
            spark.read.schema(runner.envelope_schema).parquet(runner.envelope_dir),
            initial_tick=0,
        )
        mgr.resync("events", snap)
        assert _wait_for_rows(runner.pipeline)
        assert runner.status()["active"]
        after = runner.pipeline.latest_alive().count()
        assert after == before  # snapshot ∪ replay collapses to the same state
    finally:
        mgr.stop_all()


# ---------------------------------------------------------------------------
# C7 analogue: failure records on induced crash (streaming/alerts.py)
# ---------------------------------------------------------------------------


def test_listener_records_failure_on_induced_crash(spark, tmp_path):
    from arango_clickhouse_replica_spark.streaming.alerts import FailureLog

    mgr = ReplicationManager(spark)
    log_path = str(tmp_path / "failures.jsonl")
    notified = []
    listener = mgr.attach_alerts(log_path, notifiers=[notified.append])
    try:
        src = str(tmp_path / "src")
        spark.range(10).write.parquet(src)

        def boom(it):
            raise RuntimeError("induced crash for alert test")
            yield  # pragma: no cover

        q = (
            spark.readStream.schema("id long").parquet(src)
            .mapInPandas(boom, "id long")
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception):
            q.awaitTermination()

        deadline = time.monotonic() + 30
        records = []
        while time.monotonic() < deadline:
            records = [r for r in FailureLog(log_path).records() if r["failed"]]
            if records:
                break
            time.sleep(0.5)
        assert records, "no failure record captured"
        rec = records[0]
        assert rec["event"] == "query_terminated"
        assert rec["run_id"] == str(q.runId)
        assert "induced crash" in (rec["exception"] or "")
        assert notified and notified[0]["run_id"] == rec["run_id"]
    finally:
        spark.streams.removeListener(listener)


def test_smtp_notifier_gate_and_transport():
    from arango_clickhouse_replica_spark.streaming.alerts import (
        MailConfig,
        smtp_notifier,
    )

    sent = []

    def fake_transport(cfg, subject, body):
        sent.append((cfg.host, subject, body))
        return {}

    record = {"event": "query_terminated", "query_id": "q1", "failed": True}
    # disabled: returns False, transport never touched (mailer.py:26-27)
    off = smtp_notifier(MailConfig(enabled=False), transport=fake_transport)
    assert off(record) is False and sent == []
    # enabled: transport called with the record serialized into the body
    on = smtp_notifier(
        MailConfig(host="mx", enabled=True, to=("ops@example.com",)),
        transport=fake_transport,
    )
    assert on(record) == {}
    assert sent[0][0] == "mx" and "q1" in sent[0][1] and "q1" in sent[0][2]
