"""WAL -> DSL -> curation-gate composition (VERDICT r7 item 8): the
native ``arango_wal`` streaming source, the DSL cast kernel, and the
StreamingCurationGate chained in ONE streaming query must reproduce the
decisions of running the stages separately — the full reference-shape
ingest (WAL tail -> typed transform) fused with the LLM curation gate.

Parity bar: keep_list() over a scripted WAL carrying the sf0.001
documents equals keep_list() from feeding the SAME documents through
the same compiled mapping and process_doc_batch directly; malformed
envelopes land in the dead-letter dir and never reach the ledger.
"""

import json
import time
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests import wal_fake
from arango_clickhouse_replica_spark.schema.dsl import TableMapping
from arango_clickhouse_replica_spark.sources.arango_wal import (
    REMOVE_DOCUMENT,
    UPSERT_DOCUMENT,
)
from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming.curation import (
    StreamingCurationGate,
    hot_shingle_list,
)

SF = "/root/testdata/sf0.001"

MAPPING = TableMapping.from_dict({
    "table_name": "documents",
    "schema": {
        "primary_key": "doc_id",
        "properties": {
            "doc_id": {"type": "int", "required": True},
            "text": {"type": "str", "required": True},
        },
    },
})

DATA_SCHEMA = T.StructType([
    T.StructField("_key", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _doc_entries(docs):
    return [
        {
            "tick": str(10 + i),
            "type": UPSERT_DOCUMENT,
            "db": "testdb",
            "cuid": "c_documents",
            "tid": "0",
            "data": {"_key": str(r.doc_id), "doc_id": r.doc_id,
                     "text": r.text},
        }
        for i, r in enumerate(docs)
    ]


def _gate(spark, corpus, tmp_path, name):
    return StreamingCurationGate(
        spark,
        out_root=str(tmp_path / name),
        hot_shingles=hot_shingle_list(corpus),
    )


def _drain(gate, q, want: int, timeout_s: float = 120.0):
    """Poll the quality ledger until `want` docs have been ingested,
    then wait for the stream to go idle: the ledger is written FIRST in
    process_doc_batch, so stopping on ledger count alone can kill the
    final batch's dedup/decontam stages mid-write."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            if gate._ledger().count() >= want:
                break
        except Exception:
            pass
        time.sleep(0.5)
    idle = 0
    while time.monotonic() < deadline and idle < 3:
        st = q.status
        if not st["isDataAvailable"] and not st["isTriggerActive"]:
            idle += 1
        else:
            idle = 0
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)


def test_wal_dsl_gate_matches_separate_stages(spark, tmp_path):
    corpus = load_table(spark, "documents", SF)
    rows = corpus.select("doc_id", "text").orderBy("doc_id").collect()

    entries = _doc_entries(rows)
    # adversarial envelopes the composition must handle in-stream:
    # a remove op (filtered before the DSL) and a doc with no text
    # (DSL dead-letter, never reaches the ledger)
    entries.insert(3, {
        "tick": "5", "type": REMOVE_DOCUMENT, "db": "testdb",
        "cuid": "c_documents", "tid": "0", "data": {"_key": "gone"},
    })
    entries.append({
        "tick": str(10_000), "type": UPSERT_DOCUMENT, "db": "testdb",
        "cuid": "c_documents", "tid": "0",
        "data": {"_key": "bad", "doc_id": 999_999},
    })
    wal = str(tmp_path / "wal.json")
    wal_fake.write_wal(wal, entries, page_size=64)

    fused = _gate(spark, corpus, tmp_path, "fused")
    q = fused.attach_wal(
        mapping=MAPPING,
        data_schema=DATA_SCHEMA,
        wal_options={
            "transportFactory": "tests.wal_fake:make_transport",
            "walFile": wal,
            "host": "scripted",
        },
        collections=["c_documents"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        processing_time="200 milliseconds",
    )
    _drain(fused, q, want=len(rows))

    # the separate-stages twin: same docs, same mapping, direct feed
    ref = _gate(spark, corpus, tmp_path, "ref")
    ref.process_doc_batch(corpus.select("doc_id", "text"), 0)

    got = {r.doc_id for r in fused.keep_list().collect()}
    want = {r.doc_id for r in ref.keep_list().collect()}
    assert got == want and len(want) > 0

    # the funnel agrees stage by stage
    f_got = {r.stage: r.n for r in fused.funnel_report().collect()}
    f_want = {r.stage: r.n for r in ref.funnel_report().collect()}
    assert f_got == f_want
    assert f_got["ingested"] == len(rows)  # bad doc never reached ledger

    # the textless envelope is in the dead letter with the DSL's reason
    dead = spark.read.json(str(Path(tmp_path / "fused" / "dead_letter")))
    bad = dead.filter(F.col("tick") == 10_000).collect()
    assert len(bad) == 1
    assert any("text" in e for e in bad[0]["_errors"])
    assert json.loads(bad[0]["doc"])["doc_id"] == 999_999
