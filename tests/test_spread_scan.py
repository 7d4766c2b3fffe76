"""spread_small_scan (sources/tables.py): the guide-§2.6 under-split
spread added in the r14 optimization round. Three contracts:

- an under-split relation is hash-spread to the session parallelism with
  the row multiset unchanged;
- an already-split relation is returned untouched (at real scale the
  file splits provide the parallelism — the corpus is never reshuffled);
- the partition key is the synthetic pmod(xxhash64(key), 100n), never
  the raw key: a raw-key hashpartitioning claim let the planner elide a
  required exchange under a union of two spread branches (sort-merge
  join zipping 32- and 64-partition RDDs), and a synthetic key is also
  deterministic under task retry where round-robin is not (guide §2.5).
"""

from arango_clickhouse_replica_spark.sources.tables import spread_small_scan


def test_spreads_an_under_split_scan(spark):
    df = spark.range(0, 1000).coalesce(1).withColumnRenamed("id", "k")
    out = spread_small_scan(df, "k")
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == n
    assert sorted(r["k"] for r in out.collect()) == list(range(1000))


def test_leaves_an_already_split_scan_alone(spark):
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, numPartitions=n + 3).withColumnRenamed("id", "k")
    out = spread_small_scan(df, "k")
    assert out is df
    assert out.rdd.getNumPartitions() == n + 3


def test_partition_key_is_synthetic_not_the_raw_column(spark):
    df = spark.range(0, 100).coalesce(1).withColumnRenamed("id", "k")
    plan = spread_small_scan(df, "k")._jdf.queryExecution().toString()
    assert "xxhash64" in plan and "pmod" in plan
