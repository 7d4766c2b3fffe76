#!/usr/bin/env python
"""Streaming-ingest curation CLI — the ingest-time twin of tools/curate.py.

Where ``curate.py`` runs the release pipeline as a batch over a resting
corpus, this command tails a DIRECTORY of document files as a Structured
Streaming source, pushes every arriving micro-batch through the
:class:`~arango_clickhouse_replica_spark.streaming.curation.StreamingCurationGate`
(contamination gate + incremental text dedup + incremental image dedup +
quality ledger), and on drain finalizes the release decision from the
accumulated sketch state:

    python tools/ingest.py --src /data/incoming --out /data/ingest_run \\
        [--sf-dir /root/testdata/sf0.01] [--eval-mod 97] [--quality-min 2] \\
        [--max-files-per-trigger 1] [--media]

- ``--src``: directory of parquet files with at least (doc_id, text)
  columns; new files become micro-batches (the file-queue analogue of a
  Kafka topic — swap in ``readStream.format('kafka')`` + the envelope
  parser for the broker deployment).
- ``--sf-dir``: corpus root used for two constructor-time inputs the
  production run derives from its rolling sketches: the benchmark eval
  set (``doc_id % eval_mod == 0``) and the hot-shingle df-cap list.
- ``--media``: also stream the deterministic PNG media fixtures for the
  perceptual-dedup stage (the file-source stand-in for an image topic).

Outputs under ``--out``: the gate's state dirs (``docs/ text_store/
text_pairs/ flags/ image_store/ image_pairs/``), ``keep/`` (the final
keep list as parquet), and ``reports/funnel.json``; one JSON summary
line prints to stdout. Replayed batches overwrite their own outputs —
re-running after a crash is safe (at-least-once absorbed).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ingest(spark, src: str, out: str, *, sf_dir: str, eval_mod: int = 97,
           quality_min: int = 2, max_files_per_trigger: int = 1,
           media: bool = False) -> dict:
    from pyspark.sql import functions as F

    from arango_clickhouse_replica_spark.sources.tables import load_table
    from arango_clickhouse_replica_spark.streaming.curation import (
        StreamingCurationGate,
        hot_shingle_list,
    )

    out_dir = Path(out)
    (out_dir / "reports").mkdir(parents=True, exist_ok=True)

    corpus = load_table(spark, "documents", sf_dir)
    gate = StreamingCurationGate(
        spark,
        out_root=str(out_dir),
        eval_docs=corpus.filter(F.col("doc_id") % eval_mod == 0),
        hot_shingles=hot_shingle_list(corpus),
        quality_min=quality_min,
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src)
    )
    q = gate.attach_docs(
        stream, checkpoint_dir=str(out_dir / "ckpt_docs"), available_now=True
    )
    queries = [q]
    if media:
        from arango_clickhouse_replica_spark.operators.multimodal import (
            synth_group_png_media,
        )

        media_stream = synth_group_png_media(
            stream.select("doc_id")
        )
        queries.append(gate.attach_media(
            media_stream, checkpoint_dir=str(out_dir / "ckpt_media"),
            available_now=True,
        ))
    for q_ in queries:
        q_.awaitTermination()

    keep = gate.keep_list()
    keep.write.mode("overwrite").parquet(str(out_dir / "keep"))
    funnel = {r.stage: r.n for r in gate.funnel_report().collect()}
    (out_dir / "reports" / "funnel.json").write_text(
        json.dumps(funnel, indent=2)
    )
    summary = {
        "src": src,
        "out": str(out_dir),
        "n_ingested": funnel.get("ingested", 0),
        "n_kept": funnel.get("kept", 0),
        "funnel": funnel,
        "quality_min": quality_min,
        "eval_mod": eval_mod,
        "media": media,
    }
    (out_dir / "reports" / "summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    return summary


def ingest_wal(spark, out: str, *, sf_dir: str, wal_options: dict,
               collections=None, eval_mod: int = 97,
               quality_min: int = 2, timeout_s: float = 300.0) -> dict:
    """The full reference-shape ingest fused with the LLM gate (VERDICT
    r7 item 8, CLI form): native ``arango_wal`` source -> DSL cast
    kernel -> curation gate, in one streaming query, drained to idle.
    The document mapping is the standard (doc_id int pk, text str)
    pair; swap in a TableMapping yaml for custom schemas."""
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from arango_clickhouse_replica_spark.schema.dsl import TableMapping
    from arango_clickhouse_replica_spark.sources.tables import load_table
    from arango_clickhouse_replica_spark.streaming.curation import (
        StreamingCurationGate,
        hot_shingle_list,
    )

    out_dir = Path(out)
    (out_dir / "reports").mkdir(parents=True, exist_ok=True)
    corpus = load_table(spark, "documents", sf_dir)
    gate = StreamingCurationGate(
        spark,
        out_root=str(out_dir),
        eval_docs=corpus.filter(F.col("doc_id") % eval_mod == 0),
        hot_shingles=hot_shingle_list(corpus),
        quality_min=quality_min,
    )
    mapping = TableMapping.from_dict({
        "table_name": "documents",
        "schema": {
            "primary_key": "doc_id",
            "properties": {
                "doc_id": {"type": "int", "required": True},
                "text": {"type": "str", "required": True},
            },
        },
    })
    data_schema = T.StructType([
        T.StructField("_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    q = gate.attach_wal(
        mapping=mapping,
        data_schema=data_schema,
        wal_options=wal_options,
        collections=collections,
        checkpoint_dir=str(out_dir / "ckpt_wal"),
    )
    # Drain: the stream must first PROGRESS (a committed micro-batch —
    # source init can take seconds under load, and "no data yet" is
    # indistinguishable from "drained" before batch 0 lands), then the
    # ledger must stall across 3 consecutive idle polls. Declaring idle
    # before the first progress event stopped the query empty-handed
    # when the suite ran under contention.
    deadline = _time.monotonic() + timeout_s
    last, idle, progressed, idle_noprog = -1, 0, False, 0
    while _time.monotonic() < deadline and idle < 3:
        lp = q.lastProgress
        if lp is not None and (
            lp.get("batchId", 0) >= 1 or lp.get("numInputRows", 0) > 0
        ):
            progressed = True
        try:
            n = gate._ledger().count()
        except Exception:
            n = -1
        st = q.status
        stream_idle = (not st["isDataAvailable"]
                       and not st["isTriggerActive"])
        if progressed and n == last and stream_idle:
            idle += 1
        else:
            idle = 0
        # Empty-source escape: a WAL with nothing for the tracked
        # collections never commits a batch, so `progressed` never
        # latches — without this, the loop would spin for the full
        # timeout instead of draining in seconds. 20 consecutive idle
        # polls (~10 s) with zero progress means there is nothing
        # coming; source init alone flips isTriggerActive and resets
        # the counter.
        idle_noprog = idle_noprog + 1 if (not progressed and stream_idle
                                          ) else 0
        if idle_noprog >= 20:
            break
        last = n
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    keep = gate.keep_list()
    keep.write.mode("overwrite").parquet(str(out_dir / "keep"))
    funnel = {r.stage: r.n for r in gate.funnel_report().collect()}
    (out_dir / "reports" / "funnel.json").write_text(
        json.dumps(funnel, indent=2)
    )
    summary = {
        "src": "arango_wal",
        "out": str(out_dir),
        "n_ingested": funnel.get("ingested", 0),
        "n_kept": funnel.get("kept", 0),
        "funnel": funnel,
        "quality_min": quality_min,
        "eval_mod": eval_mod,
    }
    (out_dir / "reports" / "summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src",
                    help="directory of parquet doc files to tail")
    ap.add_argument("--out", required=True,
                    help="output root: gate state + keep/ + reports/")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="corpus root for eval set + hot-shingle list")
    ap.add_argument("--eval-mod", type=int, default=97)
    ap.add_argument("--quality-min", type=int, default=2)
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument("--media", action="store_true",
                    help="also run the perceptual image-dedup stage")
    ap.add_argument("--wal-host", default="",
                    help="ingest from the native arango_wal source "
                         "instead of --src (WAL -> DSL -> gate in one "
                         "streaming query); ArangoDB host URL, or any "
                         "value when --wal-transport is set")
    ap.add_argument("--wal-db", default="_system")
    ap.add_argument("--wal-file", default="",
                    help="scripted WAL file (test transport)")
    ap.add_argument("--wal-transport", default="",
                    help="module:callable transport factory override")
    ap.add_argument("--collections", default="",
                    help="comma-separated collections to ingest")
    args = ap.parse_args()

    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("ingest")
    spark.sparkContext.setLogLevel("ERROR")
    if args.wal_host or args.wal_file:
        wal_options = {"host": args.wal_host or "scripted",
                       "db": args.wal_db}
        if args.wal_file:
            wal_options["walFile"] = args.wal_file
        if args.wal_transport:
            wal_options["transportFactory"] = args.wal_transport
        summary = ingest_wal(
            spark, args.out, sf_dir=args.sf_dir, wal_options=wal_options,
            collections=[c for c in args.collections.split(",") if c] or None,
            eval_mod=args.eval_mod, quality_min=args.quality_min,
        )
    else:
        if not args.src:
            ap.error("--src is required unless --wal-host/--wal-file is set")
        summary = ingest(
            spark, args.src, args.out, sf_dir=args.sf_dir,
            eval_mod=args.eval_mod, quality_min=args.quality_min,
            max_files_per_trigger=args.max_files_per_trigger,
            media=args.media,
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
