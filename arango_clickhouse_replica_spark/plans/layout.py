"""Physical data layout strategies for 100 TB-scale tables.

The reference gets its layout for free from ClickHouse MergeTree:
``ORDER BY`` sort keys + ``index_granularity`` give range-scan locality
(``tables/test.yaml:14-16``), and background merges bound part counts.
On Spark the equivalent levers are explicit, and this module packages
them:

- ``write_bucketed``: hash-bucket a fact table on its join/merge key.
  Two tables bucketed the same way join WITHOUT a shuffle on either
  side — the 100 TB lineitem-orders join becomes an exchange-free
  sort-merge (the single biggest shuffle eliminated). Also the right
  layout for the CDC latest-state dedup: buckets align with the
  ``partitionBy(pk)`` window so merge-on-read needs no exchange.
- ``write_partitioned``: directory partitioning on a low-cardinality
  column (date, collection) -> static + dynamic partition PRUNING at
  scan time; the analogue of MergeTree's PARTITION BY.
- ``write_clustered``: repartition-by-range + sort-within-partitions on
  a key (Z-order-lite): row-group min/max statistics become selective,
  so point/range predicates skip most of the file — the analogue of the
  MergeTree primary index.
- ``compact_small_files``: bound file counts after many streaming
  micro-batch appends (the OPTIMIZE/background-merge analogue, M3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    path: str,
    buckets: int,
    bucket_cols: str | Sequence[str],
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed table registered in the catalog.

    Joins/aggregations keyed on ``bucket_cols`` between tables with the
    same bucket count read co-located buckets and skip the exchange.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols is not None:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    *,
    path: str,
    partition_cols: str | Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet: scans with a predicate on the
    partition column read only matching directories (PartitionFilters)."""
    partition_cols = (
        [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_clustered(
    df: DataFrame,
    *,
    path: str,
    cluster_cols: str | Sequence[str],
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-repartition + sort within partitions on ``cluster_cols`` so
    parquet row-group min/max stats are tight -> predicate skipping."""
    cluster_cols = (
        [cluster_cols] if isinstance(cluster_cols, str) else list(cluster_cols)
    )
    out = (
        df.repartitionByRange(num_partitions, *cluster_cols)
        if num_partitions
        else df.repartitionByRange(*cluster_cols)
    )
    out.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    target_partitions: int,
) -> None:
    """Rewrite a parquet directory into ``target_partitions`` files.

    Streaming appends produce one file per micro-batch per partition;
    periodic compaction keeps scan task counts bounded (the
    ClickHouse background-merge / OPTIMIZE analogue, M3
    clickhouse/connect.py:55-57). Atomic swap via temp dir, like the
    reference's snapshot loader (K4, store.py:25-27,87-89).
    """
    import os
    import shutil
    import uuid

    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(target_partitions).write.mode(
        "overwrite"
    ).parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
