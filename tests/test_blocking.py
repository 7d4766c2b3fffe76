"""Blocking guards (operators/blocking.py): the two quadratic-blowup
protections for pairwise similarity — hot-shingle df caps and label
sub-blocking — exercised on deliberately skewed synthetic fixtures
(the real fixtures are too benign to trigger them)."""

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.blocking import (
    drop_hot_shingles,
    with_sub_block,
)


def test_drop_hot_shingles_drops_only_hot(spark):
    rows = [("d%d" % d, s) for s in ("hot",) for d in range(10)]
    rows += [("d%d" % d, "warm") for d in range(3)]
    rows += [("d0", "cold")]
    sh = spark.createDataFrame(rows, "doc_id string, s string")
    kept = drop_hot_shingles(sh, df_cap=3)
    assert sorted({r.s for r in kept.collect()}) == ["cold", "warm"]
    assert kept.count() == 4


def test_drop_hot_shingles_relation_cap_plans_broadcast_hash(spark):
    """The 1-row relation-cap attach must plan as a BroadcastHashJoin on
    the constant key, never a BroadcastNestedLoopJoin (r15, ADVICE r14:
    the least(1, greatest(1, x)) clamp relies on Catalyst having no
    simplification rule for it — if a future Spark folds it, this test
    points at the function instead of a distant whole-query plan lint)."""
    rows = [("d%d" % d, s) for s in ("hot",) for d in range(10)]
    rows += [("d0", "cold")]
    sh = spark.createDataFrame(rows, "doc_id string, s string")
    # Aggregate-derived cap, like the real callers: a LITERAL cap column
    # constant-folds the least/greatest clamp key and regresses the
    # attach to BroadcastNestedLoopJoin — the guarantee under test only
    # holds for attribute-derived caps.
    cap_rel = spark.range(30).agg(
        F.expr("greatest(1, least(3, count(*) div 10))").alias("__cap")
    )
    kept = drop_hot_shingles(sh, cap_rel)
    # Execute first: under AQE the pre-execution plan is not final (the
    # cap attach only shows as BroadcastHashJoin in the finalized plan).
    assert sorted({r.s for r in kept.collect()}) == ["cold"]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sub_block_inactive_below_cap(spark):
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=1) for _ in range(4)]).alias("embedding"),
        (F.col("id") % 5).cast("int").alias("label"),
    )
    out = with_sub_block(emb, dim=4, label_cap=100)
    assert out.filter(F.col("sub") != "").count() == 0
    assert out.count() == 50


def test_sub_block_splits_oversized_label(spark):
    # one giant label (800 rows) + one small (50): only the giant splits
    emb = spark.range(850).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.col("id") * (i + 1) % 97 / 48.5 - 1.0) for i in range(8)]
        ).alias("embedding"),
        F.when(F.col("id") < 800, 0).otherwise(1).cast("int").alias("label"),
    )
    out = with_sub_block(emb, dim=8, label_cap=100).cache()
    small = out.filter(F.col("label") == 1)
    assert small.filter(F.col("sub") != "").count() == 0
    giant = out.filter(F.col("label") == 0)
    sizes = [r.n for r in giant.groupBy("sub").agg(F.count("*").alias("n")).collect()]
    # 800/100 -> 3 signature bits -> 8 buckets; every bucket well below
    # the unsplit size, so per-block pair cost is bounded
    assert len(sizes) > 1
    assert max(sizes) < 800
    assert sum(sizes) == 800
    # pair-join cost with sub-blocking strictly below the quadratic blowup
    pairs_split = sum(n * (n - 1) // 2 for n in sizes)
    assert pairs_split < 800 * 799 // 2
    out.unpersist()


def test_sub_block_key_is_deterministic(spark):
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 3) % 101 / 50.5 - 1.0) for i in range(8)]).alias(
            "embedding"
        ),
        F.lit(0).alias("label"),
    )
    a = {r.vec_id: r.sub for r in with_sub_block(emb, dim=8, label_cap=100).collect()}
    b = {r.vec_id: r.sub for r in with_sub_block(emb, dim=8, label_cap=100).collect()}
    assert a == b
    assert all(len(v) > 0 for v in a.values())


@pytest.mark.parametrize("name", ["dedup_embedding_cosine_blocked"])
def test_cosine_blocked_matches_unguarded_at_fixture_scale(spark, sf_dir, name):
    """The registered query's guard must be a no-op on fixture data
    (labels are far below the cap), so results equal the plain
    label-blocked join."""
    from arango_clickhouse_replica_spark.queries import QUERIES

    guarded = QUERIES[name].build(spark, sf_dir)
    assert guarded.filter(F.col("cos_sim").isNull()).count() == 0
    assert guarded.select("vec_a").distinct().count() > 0
