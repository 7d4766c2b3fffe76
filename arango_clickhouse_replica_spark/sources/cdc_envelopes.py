"""Deterministic synthetic WAL-envelope streams over the fixture tables.

The driver provides no live ArangoDB/Kafka, so CDC correctness is proven
on synthetic change streams derived from a keyed fixture table, following
the FIXTURES.md recipe (§"CDC-apply fixture recipe"):

- every row becomes an upsert envelope (``type=2300``, ``tick=2*key``);
- keys with ``key % 10 == 0`` get a later update (``tick=2*key+1``) with a
  mutated value column (update wins);
- keys with ``key % 20 == 7`` get a delete (``type=2302``,
  ``tick=2*key+1``) (delete wins);
- a sample of null-payload tombstones is appended (dropped by P2).

The same construction is expressible in plain SQL, so the full CDC
pipeline (preprocess -> version dedup -> soft-delete filter) has a DuckDB
oracle. Envelope wire shape mirrors test/test_consumer.py:8-26.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cdc import REMOVE_DOCUMENT, UPSERT_DOCUMENT
from .tables import load_table

EVENTS_CUID = "c_events"


def synthetic_event_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL envelopes (tick, type, cuid, data struct) from the events table."""
    ev = load_table(spark, "events", sf_dir)
    cols = ev.columns

    def envelope(df: DataFrame, tick, op: int) -> DataFrame:
        return df.select(
            tick.cast("long").alias("tick"),
            F.lit(op).alias("type"),
            F.lit(EVENTS_CUID).alias("cuid"),
            F.struct(*[F.col(c) for c in cols]).alias("data"),
        )

    two_id = F.col("event_id") * 2
    base = envelope(ev, two_id, UPSERT_DOCUMENT)
    updates = envelope(
        ev.filter(F.col("event_id") % 10 == 0).withColumn("value", F.col("value") + 1000),
        two_id + 1,
        UPSERT_DOCUMENT,
    )
    deletes = envelope(ev.filter(F.col("event_id") % 20 == 7), two_id + 1, REMOVE_DOCUMENT)
    tombstones = (
        ev.filter(F.col("event_id") % 50 == 3)
        .select(
            F.lit(1).cast("long").alias("tick"),
            F.lit(UPSERT_DOCUMENT).alias("type"),
            F.lit(EVENTS_CUID).alias("cuid"),
            F.lit(None).cast(base.schema["data"].dataType).alias("data"),
        )
    )
    return base.unionByName(updates).unionByName(deletes).unionByName(tombstones)


# The same change stream in DuckDB SQL (for oracles). Produces the flattened
# post-preprocess shape: payload columns + _ver + _deleted.
CHANGES_SQL = """
  SELECT 2*event_id AS _ver, 0 AS _deleted,
         event_id, ts, user_id, event_type, value, props
  FROM events
  UNION ALL
  SELECT 2*event_id+1, 0, event_id, ts, user_id, event_type, value+1000, props
  FROM events WHERE event_id % 10 = 0
  UNION ALL
  SELECT 2*event_id+1, 1, event_id, ts, user_id, event_type, value, props
  FROM events WHERE event_id % 20 = 7
"""


# ---------------------------------------------------------------------------
# JSONL envelope files (the reference's exact wire shape)
# ---------------------------------------------------------------------------

def envelope_schema(data_schema: T.DataType) -> T.StructType:
    """The WAL envelope wire schema (test/test_consumer.py:8-26): ``tick``
    is a STRING-encoded integer on the wire (reader.py:53), ``data`` holds
    the full post-image document."""
    return T.StructType(
        [
            T.StructField("tick", T.StringType()),
            T.StructField("type", T.IntegerType()),
            T.StructField("db", T.StringType()),
            T.StructField("cuid", T.StringType()),
            T.StructField("tid", T.StringType()),
            T.StructField("data", data_schema),
        ]
    )


def _normalize(env: DataFrame) -> DataFrame:
    """Wire shape -> the pipeline's envelope columns (tick LONG)."""
    return env.select(
        F.col("tick").cast("long").alias("tick"),
        "type",
        "cuid",
        "data",
    )


def read_envelopes_jsonl(
    spark: SparkSession, path: str, data_schema: T.DataType
) -> DataFrame:
    """Batch-read newline-delimited JSON envelopes (one orjson-encoded
    envelope per line — the Kafka message value format, reader.py:27-28),
    normalized for ``preprocess_envelopes``."""
    return _normalize(spark.read.schema(envelope_schema(data_schema)).json(path))


def stream_envelopes_jsonl(
    spark: SparkSession,
    path: str,
    data_schema: T.DataType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant of :func:`read_envelopes_jsonl` — the file-drop
    ingest path (S1 without a broker): tail a directory of JSONL envelope
    files exactly as the Kafka source tails topics."""
    reader = spark.readStream.schema(envelope_schema(data_schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize(reader.json(path))


# ---------------------------------------------------------------------------
# CSV envelope files (flat dump shape: JSON payload in a string column)
# ---------------------------------------------------------------------------

def _csv_wire_schema() -> T.StructType:
    """CSV wire columns: same envelope fields as JSONL, but ``data`` is an
    orjson-encoded STRING cell (CSV has no nested types). This is the
    flat-file dump shape WAL archives land in when the broker sink writes
    CSV instead of JSONL."""
    return T.StructType(
        [
            T.StructField("tick", T.StringType()),
            T.StructField("type", T.IntegerType()),
            T.StructField("db", T.StringType()),
            T.StructField("cuid", T.StringType()),
            T.StructField("tid", T.StringType()),
            T.StructField("data", T.StringType()),
        ]
    )


def _parse_csv(env: DataFrame, data_schema: T.DataType) -> DataFrame:
    """CSV wire shape -> pipeline envelope columns: the JSON payload cell
    parses JVM-side (``from_json``, whole-stage codegen — no Python); a
    NULL/empty cell becomes a NULL struct, exactly the tombstone shape
    P2 drops."""
    return env.select(
        F.col("tick").cast("long").alias("tick"),
        "type",
        "cuid",
        F.from_json("data", data_schema).alias("data"),
    )


def read_envelopes_csv(
    spark: SparkSession, path: str, data_schema: T.DataType
) -> DataFrame:
    """Batch-read CSV envelope dumps (header row, quoted JSON payload
    column), normalized for ``preprocess_envelopes``."""
    reader = (
        spark.read.schema(_csv_wire_schema())
        .option("header", "true")
        # RFC-4180 dumps escape quotes by doubling them; Spark's default
        # escape is backslash, so the JSON payload cell needs this or it
        # truncates at the first embedded quote
        .option("escape", '"')
    )
    return _parse_csv(reader.csv(path), data_schema)


def stream_envelopes_csv(
    spark: SparkSession,
    path: str,
    data_schema: T.DataType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant of :func:`read_envelopes_csv` — tail a directory
    of CSV envelope dumps (S1 without a broker), same file-drop mechanics
    as the JSONL source."""
    reader = (
        spark.readStream.schema(_csv_wire_schema())
        .option("header", "true")
        .option("escape", '"')  # RFC-4180 doubled quotes (see batch reader)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _parse_csv(reader.csv(path), data_schema)


# ---------------------------------------------------------------------------
# ORC envelope archives (columnar WAL-archive shape: nested data struct,
# predicate pushdown + column pruning on cold replay)
# ---------------------------------------------------------------------------

def read_envelopes_orc(
    spark: SparkSession, path: str, data_schema: T.DataType
) -> DataFrame:
    """Batch-read ORC envelope archives. ORC keeps the nested ``data``
    struct natively (no JSON cell like CSV), and a cold WAL replay gets
    columnar pruning + predicate pushdown: a tick-range or op-type
    replay filter reaches the ORC stripe index instead of re-reading
    the full archive — the property that makes ORC/parquet the archive
    format of choice for multi-year WAL retention at 100 TB."""
    return _normalize(
        spark.read.schema(envelope_schema(data_schema)).orc(path)
    )


def stream_envelopes_orc(
    spark: SparkSession,
    path: str,
    data_schema: T.DataType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant of :func:`read_envelopes_orc` — tail a directory
    of ORC envelope archives (S1 without a broker), same file-drop
    mechanics as the JSONL/CSV sources."""
    reader = spark.readStream.schema(envelope_schema(data_schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize(reader.orc(path))


# Deterministic transaction lanes for the txn-atomic fixtures: 4
# consecutive event_ids share a transaction; every 7th txn is left OPEN
# (no terminator — the micro-batch cut mid-transaction), every 5th of
# the rest ABORTS, the remainder COMMIT. The same arithmetic is plain
# SQL, so the atomic-apply semantics have a DuckDB oracle.
TXN_GROUP = 4
TXN_STATUS_SQL = """
  CASE WHEN (event_id // {g}) % 7 = 3 THEN 'open'
       WHEN (event_id // {g}) % 5 = 1 THEN 'aborted'
       ELSE 'committed' END
""".format(g=TXN_GROUP)


def synthetic_txn_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic change stream with WAL transaction envelopes: every
    document row carries its ``tid`` (string on the wire, like ``tick``
    — reader.py:53), and each non-open transaction is terminated by a
    commit (2201) or abort (2202) marker row with a tick AFTER all of
    the transaction's document ticks (WAL order: rows precede their
    terminator)."""
    from ..operators.cdc import TXN_ABORT, TXN_COMMIT

    env = synthetic_event_envelopes(spark, sf_dir)
    tid_num = F.expr(f"data.event_id div {TXN_GROUP}")
    with_tid = env.select(
        "tick", "type", "cuid",
        F.when(F.col("data").isNotNull(), tid_num.cast("string"))
        .alias("tid"),
        "data",
    )
    tids = (
        load_table(spark, "events", sf_dir)
        .select(F.expr(f"event_id div {TXN_GROUP}").alias("t"))
        .distinct()
    )
    markers = (
        tids.filter((F.col("t") % 7) != 3)  # open txns get no terminator
        .select(
            # WAL order: the terminator follows every document tick of
            # its transaction (docs of txn t are events 4t..4t+3 with
            # ticks <= 2*(4t+3)+1 = 8t+7)
            (F.col("t") * 8 + 8).cast("long").alias("tick"),
            F.when((F.col("t") % 5) == 1, TXN_ABORT)
            .otherwise(TXN_COMMIT).alias("type"),
            F.lit(EVENTS_CUID).alias("cuid"),
            F.col("t").cast("string").alias("tid"),
            F.lit(None).cast(env.schema["data"].dataType).alias("data"),
        )
    )
    return with_tid.unionByName(markers)
