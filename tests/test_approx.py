"""Approximate-aggregate quality: the sketch queries now emit their
error-bound assertions as boolean output columns (so the driver can
hash-match them against a literal-TRUE oracle); these tests assert the
booleans actually come back TRUE and the exact columns agree with
independently computed exact answers."""

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES
from arango_clickhouse_replica_spark.sources.tables import load_table


def test_approx_percentiles_within_bound(spark, sf_dir):
    rows = QUERIES["q_approx_percentile_sketch"].build(spark, sf_dir).collect()
    assert rows
    exact_counts = {
        r.c_mktsegment: r.n
        for r in load_table(spark, "customer", sf_dir)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.p25_ok and r.p50_ok and r.p75_ok, r
        assert r.n_customers == exact_counts[r.c_mktsegment]


def test_approx_count_distinct_within_bound(spark, sf_dir):
    rows = QUERIES["q_approx_distinct_customers"].build(spark, sf_dir).collect()
    assert rows
    exact = {
        r.o_orderstatus: r.n
        for r in load_table(spark, "orders", sf_dir)
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.approx_within_5pct, r
        assert r.exact_customers == exact[r.o_orderstatus]
