"""Streaming curation gate (streaming/curation.py): the end-to-end
ingest composition — decontam gate + incremental text dedup +
incremental image dedup + quality ledger — must reproduce the BATCH
product surface on the same corpus:

- ``keep_list()`` == the doc set ``tools/curate.py`` exports (the
  streaming twin of the r5/r6 product-surface runs);
- the contamination stage == the registered ``decontam_minhash_fuzzy``
  batch query's verdicts, row for row;
- the image stage == a one-shot recomputation over all media at once;
- batch replay leaves every decision unchanged (idempotent);
- a real Structured Streaming drive (file source, 2 micro-batches)
  matches the process_batch-driven result.
"""

import os

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.sources.tables import load_table
from arango_clickhouse_replica_spark.streaming.curation import (
    StreamingCurationGate,
    hot_shingle_list,
)


def _docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir)


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).collect()}


def _gate(spark, docs, tmp_path, name, **kw):
    return StreamingCurationGate(
        spark,
        out_root=str(tmp_path / name),
        hot_shingles=hot_shingle_list(docs),
        **kw,
    )


def _feed_halves(gate, docs):
    gate.process_doc_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    gate.process_doc_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)


def test_keep_list_matches_curate_cli(spark, sf_dir, tmp_path):
    """The headline parity: gate keep set == curate.py's exported docs."""
    from tools.curate import curate

    docs = _docs(spark, sf_dir)
    gate = _gate(spark, docs, tmp_path, "gate")
    _feed_halves(gate, docs)

    summary = curate(spark, sf_dir, str(tmp_path / "batch"))
    exported = _ids(spark.read.parquet(str(tmp_path / "batch" / "shards")))
    assert _ids(gate.keep_list()) == exported
    assert summary["n_kept_docs"] == gate.keep_list().count()


def test_decontam_stage_matches_batch_query(spark, sf_dir, tmp_path):
    """Gate flags over a train-only ingest == the registered
    decontam_minhash_fuzzy query (same df cap, bands, lane arithmetic)."""
    from arango_clickhouse_replica_spark.queries.llm_ops import (
        decontam_minhash_fuzzy,
    )

    docs = _docs(spark, sf_dir)
    is_eval = F.col("doc_id") % 97 == 0
    gate = _gate(
        spark, docs, tmp_path, "gate_dc", eval_docs=docs.filter(is_eval)
    )
    _feed_halves(gate, docs.filter(~is_eval))

    got = {
        (r.train_doc, r.eval_doc, r.lanes_eq, r.contaminated)
        for r in gate.decontam.all_flags().collect()
    }
    want = {
        (r.train_doc, r.eval_doc, r.lanes_eq, r.contaminated)
        for r in decontam_minhash_fuzzy(spark, sf_dir).collect()
    }
    assert got == want

    # and the keep list actually excludes the contaminated train docs
    contaminated = {t for t, _, _, c in want if c}
    assert _ids(gate.keep_list()) & contaminated == set()


def test_image_stage_matches_one_shot(spark, sf_dir, tmp_path):
    """Cross-batch image near-dup drops == a one-shot pass over ALL
    media at once (completeness of the incremental store), and the keep
    list excludes exactly the non-canonical cluster members."""
    from arango_clickhouse_replica_spark.operators.components import (
        connected_components,
    )
    from arango_clickhouse_replica_spark.operators.minhash import (
        candidate_pairs,
    )
    from arango_clickhouse_replica_spark.operators.multimodal import (
        extract_ahash,
        synth_group_png_media,
    )
    from arango_clickhouse_replica_spark.streaming.dedup import (
        IncrementalAHashDedup,
    )

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    media = synth_group_png_media(docs).localCheckpoint(eager=True)
    gate = _gate(spark, _docs(spark, sf_dir), tmp_path, "gate_img")
    _feed_halves(gate, _docs(spark, sf_dir))
    gate.process_media_batch(media.filter(F.col("media_id") % 2 == 0), 0)
    gate.process_media_batch(media.filter(F.col("media_id") % 2 == 1), 1)

    # one-shot twin: every signature at once, same band join + verify
    sigs = extract_ahash(media)
    bands = IncrementalAHashDedup._bands(sigs)
    cand = candidate_pairs(bands)
    one_shot = gate.images._verified(cand, sigs)
    comp = connected_components(one_shot, src="doc_a", dst="doc_b")
    want_drops = {
        r.node for r in comp.filter(F.col("node") != F.col("component"))
        .collect()
    }
    assert _ids(gate._image_drops()) == want_drops
    assert want_drops  # the grouped fixture must actually produce dups
    assert _ids(gate.keep_list()) & want_drops == set()


def test_replayed_batches_are_idempotent(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    is_eval = F.col("doc_id") % 97 == 0
    gate = _gate(
        spark, docs, tmp_path, "gate_replay", eval_docs=docs.filter(is_eval)
    )
    train = docs.filter(~is_eval)
    _feed_halves(gate, train)
    media = None
    from arango_clickhouse_replica_spark.operators.multimodal import (
        synth_group_png_media,
    )

    media = synth_group_png_media(docs.filter(F.col("doc_id") < 50))
    gate.process_media_batch(media, 0)

    before_keep = _ids(gate.keep_list())
    before_funnel = {(r.stage, r.n) for r in gate.funnel_report().collect()}

    # at-least-once redelivery of one doc batch and the media batch
    gate.process_doc_batch(train.filter(F.col("doc_id") % 2 == 1), 1)
    gate.process_media_batch(media, 0)

    assert _ids(gate.keep_list()) == before_keep
    assert {(r.stage, r.n) for r in gate.funnel_report().collect()} == before_funnel


def test_streaming_drive_matches_process_batch(spark, sf_dir, tmp_path):
    """Real writeStream drive (file source, maxFilesPerTrigger=1) lands
    the same keep list as direct process_batch calls."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(src)

    gate = _gate(spark, docs, tmp_path, "gate_drive")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = gate.attach_docs(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert len(os.listdir(gate.text.store_dir)) >= 2  # >1 micro-batch ran

    twin = _gate(spark, docs, tmp_path, "gate_twin")
    _feed_halves(twin, docs)
    assert _ids(gate.keep_list()) == _ids(twin.keep_list())


def test_funnel_report_is_consistent(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    gate = _gate(spark, docs, tmp_path, "gate_funnel")
    _feed_halves(gate, docs)
    rows = {r.stage: r.n for r in gate.funnel_report().collect()}
    assert rows["ingested"] == docs.count()
    assert rows["kept"] == gate.keep_list().count()
    assert rows["kept"] <= rows["ingested"]
    assert rows["text_dup_dropped"] > 0  # fixture corpus has near-dups


def test_drop_sets_computed_once_per_state_version(spark, sf_dir, tmp_path):
    """keep_list() then funnel_report() (the tools/ingest.py sequence)
    must share one checkpointed drop graph per engine, and a new batch
    must invalidate the cache (ADVICE r7)."""
    docs = _docs(spark, sf_dir)
    gate = _gate(spark, docs, tmp_path, "gate_cache")
    gate.process_doc_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)

    first = gate._text_drops()
    assert gate._text_drops() is first  # memoized, not rebuilt
    before = _ids(first)
    gate.keep_list().count()
    gate.funnel_report().count()
    assert gate._text_drops() is first  # still the same checkpoint

    gate.process_doc_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    second = gate._text_drops()
    assert second is not first  # new state version -> rebuilt
    assert _ids(second) >= before
