"""Streaming ingest-time decontamination (streaming/decontam.py):
batch-vs-streaming verdict parity, replay idempotency, and a real
Structured Streaming drive over file micro-batches."""

import os
import shutil

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.minhash import (
    LANES,
    band_signatures,
    lane_mins,
    word_shingles,
)
from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming.decontam import StreamingDecontam


def _split(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    return docs.filter(~is_eval), docs.filter(is_eval)


def _flags(df):
    return {(r.train_doc, r.eval_doc): (r.lanes_eq, r.contaminated) for r in df.collect()}


def _batch_twin(train, eval_docs):
    """The one-shot batch equivalent with the SAME (uncapped) shingles."""
    t_sh = word_shingles(train)
    e_sh = word_shingles(eval_docs)
    bands_t = band_signatures(t_sh).withColumnRenamed("doc_id", "train_doc")
    bands_e = band_signatures(e_sh).withColumnRenamed("doc_id", "eval_doc")
    cand = bands_t.join(bands_e, ["band", "sig"]).select("train_doc", "eval_doc").distinct()
    mt = lane_mins(t_sh).withColumnRenamed("doc_id", "train_doc")
    me = lane_mins(e_sh).withColumnRenamed("doc_id", "eval_doc")
    lanes_eq = None
    for g in range(LANES):
        term = F.when(F.col(f"mt.m{g}") == F.col(f"me.m{g}"), 1).otherwise(0)
        lanes_eq = term if lanes_eq is None else lanes_eq + term
    return (
        cand.join(mt.alias("mt"), "train_doc")
        .join(me.alias("me"), "eval_doc")
        .select(
            "train_doc", "eval_doc",
            lanes_eq.cast("int").alias("lanes_eq"),
            (lanes_eq >= LANES // 2).alias("contaminated"),
        )
    )


def test_streaming_verdicts_match_batch_twin(spark, sf_dir, tmp_path):
    train, eval_docs = _split(spark, sf_dir)
    sd = StreamingDecontam(spark, eval_docs, flags_dir=str(tmp_path / "flags"))
    sd.process_batch(train.filter(F.col("doc_id") % 2 == 0), 0)
    sd.process_batch(train.filter(F.col("doc_id") % 2 == 1), 1)
    assert _flags(sd.all_flags()) == _flags(_batch_twin(train, eval_docs))


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    train, eval_docs = _split(spark, sf_dir)
    sd = StreamingDecontam(spark, eval_docs, flags_dir=str(tmp_path / "flags"))
    sd.process_batch(train, 0)
    first = _flags(sd.all_flags())
    sd.process_batch(train, 0)  # at-least-once redelivery
    assert _flags(sd.all_flags()) == first


def test_designed_leak_is_flagged_at_ingest(spark, tmp_path):
    common = "the quick brown fox jumps over the lazy dog again and again today"
    eval_docs = spark.createDataFrame([(0, common)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, common), (2, "entirely different words compose this document here now")],
        "doc_id long, text string",
    )
    sd = StreamingDecontam(spark, eval_docs, flags_dir=str(tmp_path / "flags"))
    sd.process_batch(batch, 0)
    assert _flags(sd.all_flags()) == {(1, 0): (LANES, True)}


def test_structured_streaming_drive(spark, sf_dir, tmp_path):
    train, eval_docs = _split(spark, sf_dir)
    src = str(tmp_path / "src")
    # two file micro-batches
    train.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{src}/b0")
    train.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{src}/b1")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    sd = StreamingDecontam(spark, eval_docs, flags_dir=str(tmp_path / "flags"))
    q = sd.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _flags(sd.all_flags())
    assert got == _flags(_batch_twin(train, eval_docs))
    shutil.rmtree(src, ignore_errors=True)


def test_empty_flags_dir_yields_typed_empty_frame(spark, tmp_path):
    eval_docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    sd = StreamingDecontam(spark, eval_docs, flags_dir=str(tmp_path / "nonexistent"))
    df = sd.all_flags()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "train_doc", "eval_doc", "lanes_eq", "contaminated",
    ]
