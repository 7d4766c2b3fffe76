"""Approximate-aggregate quality: sketch estimates must stay within
documented error of the exact answers (the property an oracle can't
hash-check)."""

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES
from arango_clickhouse_replica_spark.sources.tables import load_table


def test_approx_percentiles_near_exact(spark, sf_dir):
    approx = {
        r.c_mktsegment: r.approx_pcts
        for r in QUERIES["q_approx_percentile_sketch"].build(spark, sf_dir).collect()
    }
    exact = {
        r.c_mktsegment: (r.p25, r.p50, r.p75)
        for r in QUERIES["q_percentiles_by_segment"].build(spark, sf_dir).collect()
    }
    cust = load_table(spark, "customer", sf_dir)
    spread = cust.agg(
        (F.max("c_acctbal") - F.min("c_acctbal")).alias("s")
    ).collect()[0].s
    assert set(approx) == set(exact)
    for seg, (p25, p50, p75) in exact.items():
        for got, want in zip(approx[seg], (p25, p50, p75)):
            # accuracy=100 => rank error <= 1/100; value error bounded by
            # a generous fraction of the data spread at fixture sizes
            assert abs(got - want) <= spread * 0.25, (seg, got, want)


def test_approx_count_distinct_near_exact(spark, sf_dir):
    approx = {
        r.c_mktsegment: r.approx_customers
        for r in QUERIES["q_approx_percentile_sketch"].build(spark, sf_dir).collect()
    }
    exact = {
        r.c_mktsegment: r.n
        for r in load_table(spark, "customer", sf_dir)
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    for seg, n in exact.items():
        assert abs(approx[seg] - n) <= max(2, n * 0.05)  # HLL++ default ~2% rsd
