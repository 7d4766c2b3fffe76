"""Semantic properties of the round-3 operators — invariants that hold
regardless of the fixture, complementing the DuckDB hash-parity gate
(which cannot catch both engines being wrong the same way)."""

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES
from arango_clickhouse_replica_spark.sources.tables import load_table


def test_zipf_slope_is_negative(spark, sf_dir):
    row = QUERIES["text_zipf_slope"].build(spark, sf_dir).collect()[0]
    assert row.n_points > 1
    assert row.zipf_slope < 0, "frequency must decay with rank"


def test_oov_rates_are_probabilities_and_nonvacuous(spark, sf_dir):
    df = QUERIES["text_oov_rate"].build(spark, sf_dir)
    assert df.filter((F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)).count() == 0
    assert df.filter(F.col("n_oov") > 0).count() > 0, (
        "the relative vocab head must leave some tokens out-of-vocab"
    )


def test_kmeans_partitions_every_vector(spark, sf_dir):
    n = load_table(spark, "embeddings", sf_dir).count()
    df = QUERIES["embed_kmeans_lloyd"].build(spark, sf_dir)
    agg = df.agg(F.sum("n_members").alias("s"), F.count("*").alias("k")).collect()[0]
    assert agg.s == n, "every vector lands in exactly one cell"
    assert agg.k <= 16
    assert df.filter((F.col("mean_cohesion") < -1) | (F.col("mean_cohesion") > 1)).count() == 0


def test_dim_stats_cover_all_dimensions(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    dim = len(emb.select("embedding").first().embedding)
    df = QUERIES["embed_dim_stats"].build(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == dim
    assert all(r.n == n for r in rows)
    assert all(r.std >= 0 for r in rows)


def test_pq_codes_cover_every_subvector(spark, sf_dir):
    n = load_table(spark, "embeddings", sf_dir).count()
    df = QUERIES["embed_pq_codebooks"].build(spark, sf_dir)
    agg = df.agg(F.sum("n_vectors").alias("s")).collect()[0]
    assert agg.s == 8 * n, "every vector contributes one code per subspace"
    bad = df.filter((F.col("code") < 0) | (F.col("code") >= 16)
                    | (F.col("m") < 0) | (F.col("m") >= 8)).count()
    assert bad == 0
    assert df.filter(F.col("mean_qerr") < 0).count() == 0


def test_recall_report_bounds_and_methods(spark, sf_dir):
    df = QUERIES["ann_recall_report"].build(spark, sf_dir)
    assert {r.method for r in df.select("method").distinct().collect()} == {
        # binary popcount lane added r10; graph beam search added r12
        "binary", "graph", "lsh", "ivf", "pq"
    }
    assert df.filter((F.col("recall") < 0) | (F.col("recall") > 1)).count() == 0
    assert df.filter(F.col("n_hit") > F.col("n_exact")).count() == 0


def test_split_fractions_near_design(spark, sf_dir):
    rows = QUERIES["curation_train_val_test_split"].build(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    frac = {}
    for r in rows:
        frac[r.split] = frac.get(r.split, 0) + r.n_docs
    assert set(frac) <= {"train", "val", "test"}
    assert abs(frac.get("train", 0) / total - 0.80) < 0.10
    assert abs(frac.get("val", 0) / total - 0.10) < 0.07
    assert abs(frac.get("test", 0) / total - 0.10) < 0.07


def test_importance_sample_keeps_a_weighted_subset(spark, sf_dir):
    rows = QUERIES["curation_importance_sample"].build(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_kept <= r.n_candidates
        assert 0.0 <= r.kept_frac <= 1.0
    assert sum(r.n_kept for r in rows) > 0


def test_prefix_filter_pairs_are_verified_jaccard(spark, sf_dir):
    df = QUERIES["dedup_prefix_filter_pairs"].build(spark, sf_dir)
    assert df.filter((F.col("jaccard") < 0) | (F.col("jaccard") > 1)).count() == 0
    assert df.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_mode_is_the_max_count(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    got = {r.o_orderstatus: (r.mode_priority, r.mode_n)
           for r in QUERIES["q_mode_ship_priority"].build(spark, sf_dir).collect()}
    counts = (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n")).collect()
    )
    best = {}
    for r in counts:
        cur = best.get(r.o_orderstatus)
        cand = (-r.n, r.o_orderpriority)
        if cur is None or cand < cur:
            best[r.o_orderstatus] = cand
    for status, (prio, n) in got.items():
        assert best[status] == (-n, prio)


def test_scd2_intervals_chain_per_key(spark, sf_dir):
    df = QUERIES["cdc_scd2_history"].build(spark, sf_dir)
    # exactly one open (current or tombstoned-final) interval per key
    open_per_key = (
        df.filter(F.col("valid_to_ver").isNull())
        .groupBy("event_id").agg(F.count("*").alias("n"))
        .filter(F.col("n") != 1).count()
    )
    assert open_per_key == 0
    # closed intervals end strictly after they start
    assert df.filter(F.col("valid_to_ver") <= F.col("valid_from_ver")).count() == 0
