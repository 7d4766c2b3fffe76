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
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 refuses
        # outright (PARQUET_TYPE_ILLEGAL). Read nanos as long, then floor-divide
        # to microseconds — exactly DuckDB's nanos->micros truncation, so oracle
        # comparisons stay bit-identical.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
