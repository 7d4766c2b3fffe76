"""Transaction-atomic CDC apply (r12, VERDICT r11 item 5): a micro-batch
never exposes part of a WAL transaction — rows gate on their tid's
commit marker, aborted txns never land, unterminated txns defer in the
pending buffer across batch cuts."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arango_clickhouse_replica_spark.operators.cdc import (
    latest_alive,
    preprocess_envelopes,
    txn_atomic_split,
)
from arango_clickhouse_replica_spark.sources.cdc_envelopes import (
    synthetic_txn_envelopes,
)
from arango_clickhouse_replica_spark.streaming import CdcPipeline

_DATA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)
_ENV = T.StructType(
    [
        T.StructField("tick", T.LongType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("cuid", T.StringType()),
        T.StructField("tid", T.StringType()),
        T.StructField("data", _DATA),
    ]
)


def _env_df(spark, rows):
    return spark.createDataFrame(
        [
            (t, ty, "c", tid, (eid, val) if eid is not None else None)
            for (t, ty, tid, eid, val) in rows
        ],
        _ENV,
    )


@pytest.fixture
def dirs(tmp_path):
    d = {
        "env": str(tmp_path / "envelopes"),
        "target": str(tmp_path / "target"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["env"])
    return d


def test_no_partial_txn_visible_across_batches(spark, dirs):
    """Txn T2 spans two micro-batches: its first row must stay INVISIBLE
    in latest_alive after batch 1 and appear (whole) only once batch 2
    delivers the commit marker. Aborted T3 never lands; non-txn rows
    apply immediately."""
    pipe = CdcPipeline(
        spark,
        target_dir=dirs["target"],
        checkpoint_dir=dirs["ckpt"],
        keys=["event_id"],
        txn_atomic=True,
    )
    # batch 1: T1 (rows 1,2 + commit), T2's FIRST row (no terminator yet)
    _env_df(spark, [
        (10, 2300, "T1", 1, 1.0),
        (11, 2300, "T1", 2, 2.0),
        (12, 2201, "T1", None, None),   # T1 commit
        (13, 2300, "T2", 3, 3.0),       # T2 cut mid-transaction
    ]).coalesce(1).write.mode("append").parquet(dirs["env"])
    pipe.run_until_drained(dirs["env"], _ENV)

    alive1 = {r.event_id for r in pipe.latest_alive().collect()}
    assert alive1 == {1, 2}, "half of T2 leaked into latest_state"
    pending = pipe.pending()
    assert pending is not None
    assert [(r.tid, r.data.event_id) for r in pending.collect()] == [
        ("T2", 3)
    ]

    # batch 2: T2's second row + commit; T3 aborts; one non-txn row
    _env_df(spark, [
        (14, 2300, "T2", 4, 4.0),
        (15, 2201, "T2", None, None),   # T2 commit
        (16, 2300, "T3", 5, 5.0),
        (17, 2202, "T3", None, None),   # T3 abort
        (18, 2300, None, 6, 6.0),       # non-transactional
    ]).coalesce(1).write.mode("append").parquet(dirs["env"])
    pipe.run_until_drained(dirs["env"], _ENV)

    alive2 = {r.event_id for r in pipe.latest_alive().collect()}
    assert alive2 == {1, 2, 3, 4, 6}   # T2 whole, T3 never, non-txn in
    assert pipe.pending().count() == 0


def test_txn_pipeline_matches_batch_split(spark, sf_dir, dirs):
    """Streamed txn-atomic apply over the synthetic txn envelopes equals
    the batch txn_atomic_split + latest_alive over the same envelopes,
    however the stream is micro-batched."""
    env = synthetic_txn_envelopes(spark, sf_dir).cache()
    env.count()
    # micro-batches must be CONTIGUOUS tick ranges (the WAL is totally
    # ordered; a terminator follows its transaction's rows) — write four
    # tick-range chunks as separately-committed files so the file source
    # replays them in order
    q1, q2, q3 = env.selectExpr(
        "percentile_approx(tick, array(0.25, 0.5, 0.75)) AS q"
    ).first().q
    chunks = [
        env.filter(F.col("tick") <= q1),
        env.filter((F.col("tick") > q1) & (F.col("tick") <= q2)),
        env.filter((F.col("tick") > q2) & (F.col("tick") <= q3)),
        env.filter(F.col("tick") > q3),
    ]
    for c in chunks:
        c.coalesce(1).write.mode("append").parquet(dirs["env"])
    schema = env.schema

    pipe = CdcPipeline(
        spark,
        target_dir=dirs["target"],
        checkpoint_dir=dirs["ckpt"],
        keys=["event_id"],
        initial_tick=0,
        txn_atomic=True,
    )
    q = pipe.start(dirs["env"], schema, max_files_per_trigger=1)
    q.awaitTermination()

    batch = latest_alive(
        preprocess_envelopes(
            txn_atomic_split(
                spark.read.schema(schema).parquet(dirs["env"])
            ).applyable,
            initial_tick=0,
        ),
        keys=["event_id"],
    )
    got = {(r.event_id, r.value) for r in pipe.latest_alive().collect()}
    want = {(r.event_id, r.value) for r in batch.collect()}
    assert got == want and len(got) > 0
    # the open transactions' rows are exactly what is still pending
    open_rows = txn_atomic_split(
        spark.read.schema(schema).parquet(dirs["env"])
    ).deferred
    assert pipe.pending().count() == open_rows.count() > 0
