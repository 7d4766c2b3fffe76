"""Round-9 semantics tests: the ANN query-set Q_MAX cap (VERDICT r8
items 1-2) must structurally bind — not just be policy prose.

The sf fixtures never exceed Q_MAX/100 qualifying vectors, so the
driver-oracle rows can't distinguish capped from uncapped; these tests
build a synthetic table where the vec_id % 100 == 0 slice EXCEEDS
Q_MAX and prove the collected/broadcast query set stays at exactly
Q_MAX rows — the smallest vec_ids, per the orderBy.
"""

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries.embed_ops import (
    _shortlist_candidates,
)
from arango_clickhouse_replica_spark.queries.llm_ops import Q_MAX


def _synthetic_base(spark, n):
    # every vec_id is a multiple of 100 -> the whole table qualifies as
    # a query; embeddings are deterministic non-degenerate 2-vectors
    return spark.range(n).select(
        (F.col("id") * 100).alias("vec_id"),
        F.array(
            ((F.col("id") % 7) + 1).cast("double"),
            ((F.col("id") % 5) + 1).cast("double"),
        ).alias("embedding"),
    )


def test_shortlist_query_set_cap_binds(spark):
    n = Q_MAX + 400
    base = _synthetic_base(spark, n)
    out = _shortlist_candidates(spark, base, k=1, exclude="self")
    qs = [r.query_id for r in out.select("query_id").distinct().collect()]
    assert len(qs) == Q_MAX
    # orderBy("vec_id") before the limit -> exactly the smallest ids
    assert max(qs) == (Q_MAX - 1) * 100
    # every shortlist row's query is inside the capped set
    assert min(qs) == 0


def test_streaming_zscore_skips_null_values(spark, tmp_path):
    """ADVICE r8: a null event value must neither crash the scorer
    (NaN -> Decimal quantize raised) nor occupy a frame slot — both
    engines now exclude nulls BEFORE the window, so stream == batch
    bit for bit on data WITH nulls."""
    import datetime

    from arango_clickhouse_replica_spark.queries.analytics import (
        anomaly_scored_events,
    )
    from arango_clickhouse_replica_spark.streaming.stateful import (
        streaming_anomaly_zscore,
    )

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    for i in range(30):
        # nulls sprinkled mid-window: positions 3, 12, 17
        v = None if i in (3, 12, 17) else float((i * 7) % 13) + 0.5
        rows.append((i, t0 + datetime.timedelta(seconds=i), 1, v))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    src, ckpt, out = (
        str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    ev.coalesce(1).write.parquet(src)
    q = (
        streaming_anomaly_zscore(
            spark.readStream.schema(ev.schema).parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: r.z for r in spark.read.parquet(out).collect()
    }
    want = {r.event_id: r.z for r in anomaly_scored_events(ev).collect()}
    assert got == want and len(want) > 0
    assert not any(eid in got for eid in (3, 12, 17))


def test_bruteforce_query_side_is_bounded(spark, sf_dir):
    """The broadcast q side of ann_cosine_topk_bruteforce must carry a
    GlobalLimit/TakeOrdered bound so the BNLJ loop is O(Q_MAX*N)."""
    from arango_clickhouse_replica_spark.queries import QUERIES

    df = QUERIES["ann_cosine_topk_bruteforce"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert f"GlobalLimit {Q_MAX}" in plan or f"limit={Q_MAX}" in plan, plan
