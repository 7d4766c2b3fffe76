"""tools/ingest.py — the streaming-ingest CLI must equal a directly
process_batch-driven gate with the same constructor inputs, and its
reports must be self-consistent."""

import json

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.sources.tables import load_table


def test_ingest_cli_end_to_end(spark, sf_dir, tmp_path):
    from tools.ingest import ingest

    docs = load_table(spark, "documents", sf_dir)
    src = str(tmp_path / "incoming")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(src)

    out = tmp_path / "run"
    summary = ingest(spark, src, str(out), sf_dir=sf_dir)

    assert summary["n_ingested"] == docs.count()
    funnel = json.loads((out / "reports" / "funnel.json").read_text())
    assert funnel == summary["funnel"]
    kept = spark.read.parquet(str(out / "keep"))
    assert kept.count() == summary["n_kept"]

    # parity with a directly-driven gate over the same corpus + inputs
    from arango_clickhouse_replica_spark.streaming.curation import (
        StreamingCurationGate,
        hot_shingle_list,
    )

    twin = StreamingCurationGate(
        spark,
        out_root=str(tmp_path / "twin"),
        eval_docs=docs.filter(F.col("doc_id") % 97 == 0),
        hot_shingles=hot_shingle_list(docs),
    )
    twin.process_doc_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    twin.process_doc_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == \
        {r.doc_id for r in twin.keep_list().select("doc_id").collect()}


def test_ingest_cli_media_stage(spark, sf_dir, tmp_path):
    from tools.ingest import ingest

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 60)
    src = str(tmp_path / "incoming_m")
    docs.coalesce(1).write.mode("append").parquet(src)

    summary = ingest(spark, src, str(tmp_path / "runm"),
                     sf_dir=sf_dir, media=True)
    assert summary["media"] is True
    # grouped PNG fixtures guarantee perceptual near-dups -> drops
    assert summary["funnel"]["image_dup_dropped"] > 0
    assert summary["n_kept"] < summary["n_ingested"]


def test_ingest_cli_wal_path(spark, sf_dir, tmp_path):
    """--wal-file mode: the WAL -> DSL -> gate chain drained by the CLI
    equals a directly process_batch-driven gate over the same docs."""
    from tests import wal_fake
    from tools.ingest import ingest_wal

    from arango_clickhouse_replica_spark.sources.arango_wal import (
        UPSERT_DOCUMENT,
    )

    docs = load_table(spark, "documents", sf_dir)
    rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    entries = [
        {"tick": str(10 + i), "type": UPSERT_DOCUMENT, "db": "testdb",
         "cuid": "c_documents", "tid": "0",
         "data": {"_key": str(r.doc_id), "doc_id": r.doc_id,
                  "text": r.text}}
        for i, r in enumerate(rows)
    ]
    wal = str(tmp_path / "wal.json")
    wal_fake.write_wal(wal, entries, page_size=128)

    out = tmp_path / "wal_run"
    summary = ingest_wal(
        spark, str(out), sf_dir=sf_dir,
        wal_options={"transportFactory": "tests.wal_fake:make_transport",
                     "walFile": wal, "host": "scripted"},
        collections=["c_documents"],
    )
    assert summary["n_ingested"] == len(rows)
    kept = spark.read.parquet(str(out / "keep"))
    assert kept.count() == summary["n_kept"] > 0

    from arango_clickhouse_replica_spark.streaming.curation import (
        StreamingCurationGate,
        hot_shingle_list,
    )

    twin = StreamingCurationGate(
        spark,
        out_root=str(tmp_path / "wal_twin"),
        eval_docs=docs.filter(F.col("doc_id") % 97 == 0),
        hot_shingles=hot_shingle_list(docs),
    )
    twin.process_doc_batch(docs.select("doc_id", "text"), 0)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == \
        {r.doc_id for r in twin.keep_list().select("doc_id").collect()}


def test_ingest_cli_wal_path_empty_wal_drains_fast(spark, sf_dir, tmp_path):
    """An empty WAL (no envelopes for the tracked collections) must not
    spin until timeout_s: the no-progress escape drains in seconds."""
    import time

    from tests import wal_fake
    from tools.ingest import ingest_wal

    wal = str(tmp_path / "empty_wal.json")
    wal_fake.write_wal(wal, [], page_size=128)
    t0 = time.monotonic()
    summary = ingest_wal(
        spark, str(tmp_path / "empty_run"), sf_dir=sf_dir,
        wal_options={"transportFactory": "tests.wal_fake:make_transport",
                     "walFile": wal, "host": "scripted"},
        collections=["c_documents"],
        timeout_s=120.0,
    )
    assert summary["n_ingested"] == 0
    assert time.monotonic() - t0 < 90
