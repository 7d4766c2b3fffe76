"""Env-gated LIVE connector round-trips (VERDICT r8 item 5) — the two
SURVEY rows that the sandbox can only injection-test (S5/K1 Kafka
envelope path, K2 JDBC columnar insert) driven against real services,
mirroring the reference's live tests (reference/test/test_kafka.py:9-14,
reference/test/test_clickhouse.py:27-49).

In the sandbox no services exist and every test SKIPS cleanly. To run
live, start ``compose.live.yml`` and export the env vars it documents —
including ``SPARK_GRAFT_EXTRA_PACKAGES`` (connector jars must be on the
classpath BEFORE the first SparkSession of the process, so run this file
in its own pytest invocation, not inside the main suite).
"""

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F

KAFKA = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
CH_URL = os.environ.get("SPARK_GRAFT_CLICKHOUSE_JDBC_URL")

pytestmark = pytest.mark.skipif(
    not (KAFKA or CH_URL),
    reason="live backends not configured "
           "(SPARK_GRAFT_KAFKA_BOOTSTRAP / SPARK_GRAFT_CLICKHOUSE_JDBC_URL)",
)


def _envelope_frame(spark):
    """Five WAL envelopes shaped like the reference's producer output
    (test/test_consumer.py:8-26): keyed, per-collection topic column."""
    rows = [
        (i, 2300 + i, 2, "db", "c_events", str(100 + i),
         json.dumps({"_key": str(100 + i), "v": i}))
        for i in range(5)
    ]
    return spark.createDataFrame(
        rows, "i long, tick long, type int, db string, cuid string, "
              "tid string, data string",
    ).select(
        F.lit("acs_live_smoke").alias("topic"),
        F.col("tid").alias("key"),
        "tick", "type", "db", "cuid", "tid", "data",
    )


@pytest.mark.skipif(not KAFKA, reason="no Kafka bootstrap configured")
def test_kafka_envelope_roundtrip_live(spark):
    """K1 -> S5 against a real broker: produce keyed JSON envelopes with
    the engine's encoder, read the topic back as a batch, decode with
    the engine's schema, and compare tick-for-tick."""
    from arango_clickhouse_replica_spark.sources.kafka import (
        decode_envelopes,
        encode_envelopes,
        kafka_batch_writer,
    )
    from pyspark.sql import types as T

    env = _envelope_frame(spark)
    kafka_batch_writer(
        encode_envelopes(env), bootstrap_servers=KAFKA
    ).save()

    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", "acs_live_smoke")
        .option("startingOffsets", "earliest")
        .load()
    )
    got = decode_envelopes(raw, T.StringType())
    ticks = {r.tick for r in got.select("tick").collect()}
    assert {2300 + i for i in range(5)} <= ticks
    keys = {r.key for r in got.select("key").collect()}
    assert {str(100 + i) for i in range(5)} <= keys


@pytest.mark.skipif(not CH_URL, reason="no ClickHouse JDBC URL configured")
def test_jdbc_clickhouse_connection_live(spark):
    """The reference's test_clickhouse_connection (SELECT 1) over the
    Spark JDBC surface."""
    ok = (
        spark.read.format("jdbc")
        .option("url", CH_URL)
        .option("query", "SELECT 1 AS ok")
        .load()
        .collect()
    )
    assert ok[0].ok == 1


@pytest.mark.skipif(not CH_URL, reason="no ClickHouse JDBC URL configured")
def test_jdbc_clickhouse_append_and_readback(spark):
    """K2 round-trip using only Spark JDBC surfaces: Overwrite creates
    the table (driver maps types), append adds partition-parallel
    batches, read-back compares."""
    table = f"acs_live_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    (
        df.write.format("jdbc")
        .option("url", CH_URL)
        .option("dbtable", table)
        .option("createTableOptions", "ENGINE = MergeTree ORDER BY k")
        .option("batchsize", "10000")
        .mode("overwrite")
        .save()
    )
    from arango_clickhouse_replica_spark.sources.jdbc_sink import (
        write_jdbc_append,
    )

    write_jdbc_append(
        df.select(F.col("k") + 100, F.col("v")), url=CH_URL, table=table
    )
    back = (
        spark.read.format("jdbc")
        .option("url", CH_URL)
        .option("dbtable", table)
        .load()
    )
    assert back.count() == 200
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(100)) * 2
