"""Multi-table replication end to end: two collections, per-table mapping
DSL, supervised queries, isolated targets — the reference's full consumer
topology (one task per table, loader.py:224-231) as managed streams."""

import os

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.cdc import UPSERT_DOCUMENT
from arango_clickhouse_replica_spark.schema.dsl import TableMapping
from arango_clickhouse_replica_spark.sources.cdc_envelopes import synthetic_event_envelopes
from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming import CdcPipeline
from arango_clickhouse_replica_spark.streaming.manager import ReplicationManager, TableRunner


def _doc_envelopes(spark, sf_dir):
    """Upsert envelopes for documents; every 9th doc gets a null-text
    update that the mapping's required check must dead-letter."""
    docs = load_table(spark, "documents", sf_dir)

    def env(df, tick):
        return df.select(
            tick.cast("long").alias("tick"),
            F.lit(UPSERT_DOCUMENT).alias("type"),
            F.lit("c_documents").alias("cuid"),
            F.struct("doc_id", "text", "lang", "source", "n_chars").alias("data"),
        )

    base = env(docs, F.col("doc_id") * 2)
    broken = env(
        docs.filter(F.col("doc_id") % 9 == 0).withColumn("text", F.lit(None).cast("string")),
        F.col("doc_id") * 2 + 1,
    )
    return base.unionByName(broken)


DOC_MAPPING = TableMapping.from_dict(
    {
        "table_name": "documents",
        "schema": {
            "primary_key": ["doc_id"],
            "properties": {
                "doc_id": {"type": "int"},
                "body": {"type": "str", "ref": "text", "required": True},
                "lang": {"type": "str", "default": "und"},
                "_ver": {"type": "int"},
                "_deleted": {"type": "int"},
            },
        },
    }
)


@pytest.fixture
def setup(spark, sf_dir, tmp_path):
    paths = {}
    for name in ("events", "documents"):
        paths[name] = {
            "env": str(tmp_path / name / "env"),
            "target": str(tmp_path / name / "target"),
            "ckpt": str(tmp_path / name / "ckpt"),
            "dead": str(tmp_path / name / "dead"),
        }
        os.makedirs(paths[name]["env"])
    ev_env = synthetic_event_envelopes(spark, sf_dir)
    ev_env.write.mode("append").parquet(paths["events"]["env"])
    doc_env = _doc_envelopes(spark, sf_dir)
    doc_env.write.mode("append").parquet(paths["documents"]["env"])
    return paths, ev_env.schema, doc_env.schema


def test_two_tables_replicate_in_isolation(spark, sf_dir, setup):
    paths, ev_schema, doc_schema = setup
    ev_pipe = CdcPipeline(
        spark, target_dir=paths["events"]["target"],
        checkpoint_dir=paths["events"]["ckpt"], keys=["event_id"], initial_tick=0,
    )
    doc_pipe = CdcPipeline(
        spark, target_dir=paths["documents"]["target"],
        checkpoint_dir=paths["documents"]["ckpt"], keys=["doc_id"],
        mapping=DOC_MAPPING, initial_tick=0,
        dead_letter_dir=paths["documents"]["dead"],
    )
    mgr = ReplicationManager(spark)
    mgr.add(TableRunner("events", ev_pipe, paths["events"]["env"], ev_schema))
    mgr.add(TableRunner("documents", doc_pipe, paths["documents"]["env"], doc_schema))
    try:
        # drain both (deterministic): run as available-now batches
        ev_pipe.run_until_drained(paths["events"]["env"], ev_schema)
        doc_pipe.run_until_drained(paths["documents"]["env"], doc_schema)

        docs = load_table(spark, "documents", sf_dir)
        n_docs = docs.count()

        # documents: mapped schema, renamed column, latest-state per key
        latest_docs = doc_pipe.latest_alive()
        assert set(latest_docs.columns) >= {"doc_id", "body", "lang"}
        assert latest_docs.count() == n_docs  # broken updates dead-lettered
        # the null-text updates must NOT have won (their _ver is higher but
        # they were rejected before the merge)
        assert latest_docs.filter(F.col("body").isNull()).count() == 0

        # dead letters: exactly the corrupted every-9th updates
        dead = spark.read.parquet(paths["documents"]["dead"])
        assert dead.count() == docs.filter(F.col("doc_id") % 9 == 0).count()

        # events: untouched by the documents mapping
        latest_ev = ev_pipe.latest_alive()
        assert "body" not in latest_ev.columns
        assert latest_ev.count() > 0

        assert {s["table"] for s in mgr.statuses()} == {"events", "documents"}
    finally:
        mgr.stop_all()


def test_mapping_without_meta_columns_keeps_merge_semantics(spark, sf_dir, tmp_path):
    """A mapping that does NOT declare _ver/_deleted must still merge by
    version and filter soft deletes: the pipeline re-attaches them
    (CompiledMapping.apply passthrough) instead of silently dropping."""
    env_dir = str(tmp_path / "env")
    os.makedirs(env_dir)
    env = synthetic_event_envelopes(spark, sf_dir)
    env.write.mode("append").parquet(env_dir)

    bare = TableMapping.from_dict(
        {
            "table_name": "events_bare",
            "schema": {
                "primary_key": ["event_id"],
                "properties": {
                    "event_id": {"type": "int"},
                    "value": {"type": "float"},
                },
            },
        }
    )
    pipe = CdcPipeline(
        spark,
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        keys=["event_id"],
        mapping=bare,
    )
    pipe.run_until_drained(env_dir, env.schema)

    assert {"_ver", "_deleted"} <= set(pipe.raw().columns)
    alive = pipe.latest_alive()
    # deletes (key % 20 == 7) are filtered, updates (key % 10 == 0) win
    assert alive.filter(F.col("event_id") % 20 == 7).count() == 0
    from arango_clickhouse_replica_spark.sources.tables import load_table as _lt

    ev = _lt(spark, "events", sf_dir)
    updated = (
        alive.join(ev.select("event_id", F.col("value").alias("orig")), "event_id")
        .filter((F.col("event_id") % 10 == 0))
    )
    assert updated.count() > 0
    assert updated.filter(F.col("value") != F.col("orig") + 1000).count() == 0
