"""Round-13 semantics tests: the beam-graph sub-block cap contract, the
txn-atomic persist-handle fix, and the live/batch uniq-estimate floor
parity (ADVICE r12 items)."""

import math

from pyspark.sql import functions as F


def test_graph_cell_cap_holds_at_oracle_scales(spark):
    """ann_graph_beam_topk's DuckDB oracle replays the edge build WITHOUT
    the sub-block term; that is exact only while every IVF cell stays
    under _GRAPH_CELL_CAP. Assert the contract at every scale the driver
    hash-verifies (sf0.001 and sf0.01) so a future overflow fails here by
    name instead of as a mystery hash mismatch."""
    from arango_clickhouse_replica_spark.queries.embed_ops import (
        _GRAPH_CELL_CAP,
        _graph_members,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        _, _, members = _graph_members(spark, sf_dir)
        worst = (
            members.groupBy("cell")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        assert worst <= _GRAPH_CELL_CAP, (
            f"{sf_dir}: largest graph cell {worst} exceeds the "
            f"{_GRAPH_CELL_CAP} sub-block cap — the oracle no longer "
            "replays the edge build; model the sub-block split in the "
            "oracle or re-balance the cells"
        )


def test_uniq_estimate_floor_matches_batch_semantics():
    """The live twin must compute floor(NUM / sum_u) exactly like the
    batch F.floor(lit / col): Python's float // is fmod-based and can
    differ by 1 from floor-of-IEEE-quotient (the 0.5 // 0.1 class)."""
    # a sum_u where x/y rounds to an exact integer above the true
    # quotient: float-// gives floor(fmod-corrected) = n-1, floor(x/y)=n
    cases = [(0.5, 0.1), (2.7, 0.9), (1.2, 0.4)]
    assert any(math.floor(x / y) != x // y for x, y in cases)
    # the shipped expression uses math.floor of the quotient
    import inspect

    from arango_clickhouse_replica_spark.streaming import stateful

    src = inspect.getsource(stateful)
    assert "math.floor(_AGGSTATE_NUM / float(sum(u)))" in src
    assert "_AGGSTATE_NUM // " not in src


def test_txn_atomic_batch_unpersists_raw_handle(spark, tmp_path):
    """ADVICE r12: _txn_gate rebinds the local `batch` name, so the
    finally-block unpersist used to release the WRONG frame and the
    pinned raw batch leaked every micro-batch. Drive one txn-atomic
    batch and assert nothing is left in the storage layer."""
    from pyspark.sql import types as T

    from arango_clickhouse_replica_spark.streaming import CdcPipeline

    env = T.StructType([
        T.StructField("tick", T.LongType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("cuid", T.StringType()),
        T.StructField("tid", T.StringType()),
        T.StructField("data", T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ])),
    ])
    batch = spark.createDataFrame(
        [
            (10, 2300, "c", "T1", (1, 1.0)),
            (11, 2201, "c", "T1", None),  # commit marker
        ],
        env,
    )
    pipe = CdcPipeline(
        spark,
        target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "cp"),
        keys=["event_id"],
        txn_atomic=True,
    )
    before = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    pipe._apply_batch(batch, 0)
    after = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    leaked = [r for r in after if r.id() not in before]
    assert leaked == [], f"persisted RDDs leaked by _apply_batch: {leaked}"
