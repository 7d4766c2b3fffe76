"""JDBC sink for ClickHouse-compatible targets (SURVEY §2.2 K2/K3).

The reference bulk-inserts transformed rows over the ClickHouse native
protocol in 10k-row chunks (``clickhouse/connect.py:28-49``). The Spark
path is partition-parallel JDBC appends — each executor core writes its
partition in ``batchsize`` chunks, so cluster-wide insert throughput
scales with parallelism instead of the reference's one writer thread
per table.

Used from ``foreachBatch`` in the streaming pipeline: the target stays
append-only (``ReplacingMergeTree`` dedups by ``_ver`` downstream,
readme.md:89-91), so retried micro-batches are absorbed by the same
version-replacing semantics that make our parquet path idempotent (M1)
— effective exactly-once without two-phase commit.

No ClickHouse server or JDBC driver exists in the test environment:
``jdbc_batch_writer`` only CONFIGURES the writer (Spark connects lazily
on ``.save()``); ``write_jdbc_append`` raises a clear error if the
driver class is absent.

Bootstrapping a fresh target: generate the ``ReplacingMergeTree(_ver)``
DDL (and the optional Buffer-table DDL) from the same ``TableMapping``
the pipeline uses via ``schema.ddl.create_table_ddl`` /
``buffer_table_ddl``, execute it over JDBC once, then point this sink at
the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: ClickHouse's official JDBC driver class (com.clickhouse:clickhouse-jdbc).
CLICKHOUSE_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def jdbc_batch_writer(
    df: DataFrame,
    *,
    url: str,
    table: str,
    driver: str = CLICKHOUSE_DRIVER,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
):
    """Configured (unsaved) JDBC append writer.

    ``batch_size`` mirrors the reference's 10k-row INSERT chunks
    (clickhouse/connect.py:33); ``num_partitions`` caps concurrent
    connections against the target (repartition before write).
    """
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "NONE")  # ClickHouse has no transactions
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer


def write_jdbc_append(df: DataFrame, *, url: str, table: str, **kwargs) -> None:
    """Append ``df`` to a JDBC table; clear error when no driver is on
    the classpath (this offline environment ships none)."""
    try:
        jdbc_batch_writer(df, url=url, table=table, **kwargs).save()
    except Exception as e:  # pragma: no cover - needs a live target
        if "ClassNotFoundException" in str(e) or "No suitable driver" in str(e):
            raise RuntimeError(
                "JDBC driver not on the Spark classpath; add the ClickHouse "
                "JDBC jar (com.clickhouse:clickhouse-jdbc) via spark.jars"
            ) from e
        raise
