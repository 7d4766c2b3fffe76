"""Batch table loaders for the driver-provided parquet fixtures.

Maps the reference's full-collection snapshot scan
(replication/replicator/store.py:16-22 — AQL ``FOR d IN col RETURN d``
streamed in batches) onto ``spark.read.parquet``: Spark's splittable
columnar scan already gives batched, parallel, column-pruned,
predicate-pushed reads, so there is nothing to hand-roll.

At 100 TB the same call works unchanged: parquet footers give partition
planning, ``spark.sql.files.maxPartitionBytes`` controls split size, and
Catalyst pushes filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# All fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-able in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped with several physical types for ts across
        # fixture generations: TIMESTAMP(NANOS) (Spark 4 refuses outright —
        # PARQUET_TYPE_ILLEGAL — unless read nanos-as-long), TIMESTAMP(MICROS)
        # isAdjustedToUTC=false (reads as TIMESTAMP_NTZ), and plain TIMESTAMP.
        # Normalize all of them to session-tz TimestampType at microsecond
        # precision — the same value DuckDB produces for each encoding — so
        # oracle comparisons stay bit-identical regardless of fixture vintage.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos-as-long: floor-divide to micros (DuckDB's truncation).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            # TIMESTAMP_NTZ (or anything else): naive wall-clock -> session-tz
            # timestamp. Sessions here run UTC, so the instant is unchanged and
            # pandas round-trips the identical naive value.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_small_scan(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-spread an UNDER-SPLIT scan across the session parallelism
    before per-row-expensive work (guide §2.6 — the multimodal
    ``_spread_ids`` lesson generalized): a small fixture file arrives as
    one input split, so a JSON-synth / shingle-explode / md5 chain over
    it runs on ONE core while the rest idle. The repartition fires ONLY
    when the scan has fewer partitions than the session parallelism — at
    real scale the file splits already provide the parallelism and the
    corpus is never reshuffled. The partition key is the guide-§2.5
    synthetic key — ``pmod(xxhash64(key), 100 * n)`` — deterministic
    under task retry (never round-robin or rand-derived over a re-read
    scan) with 100x more distinct values than partitions so the hash
    spreads evenly; deriving it (rather than hashing the raw key column)
    also keeps the exchange's partitioning claim disjoint from every
    downstream JOIN key, so the planner can never elide a required
    exchange against this claim (observed: a union of two raw-key-spread
    branches fed a sort-merge join that tried to zip 32- and
    64-partition RDDs).

    INPUT CONTRACT (r15, ADVICE r14): ``df`` must be a bare file-source
    scan (optionally with narrow projections/filters) — the
    ``df.rdd.getNumPartitions()`` probe below finalizes the physical
    plan, and under AQE a plan containing Exchanges would eagerly
    materialize its upstream query stages (running real jobs) just to
    answer the partition-count question. Every caller passes a
    ``load_table`` scan; pass nothing wider."""
    from pyspark.sql import functions as F

    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(
            n, F.pmod(F.xxhash64(F.col(key_col)), F.lit(100 * n))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table keyed by name."""
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each fixture table as a temp view for ``spark.sql`` use —
    the engine's AQL-pass-through analog (SURVEY.md §2.1 S4:
    arangodb/connect.py:28-63 runs arbitrary AQL; we expose full Spark SQL).
    """
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
