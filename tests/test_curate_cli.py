"""End-to-end curation CLI (tools/curate.py): the composed pipeline must
equal the composition of its registered stages, and the artifacts a
release needs (shards, cluster relation, reports) must all land."""

import importlib.util
import json
from pathlib import Path

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES

_spec = importlib.util.spec_from_file_location(
    "acs_tools_curate",
    Path(__file__).resolve().parent.parent / "tools" / "curate.py",
)
_curate_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_curate_mod)

SF = "/root/testdata/sf0.001"


def test_curate_end_to_end(spark, tmp_path):
    curate = _curate_mod.curate

    out = tmp_path / "run"
    summary = curate(spark, SF, str(out), shards=8, quality_min=2,
                     decontam=True)

    # artifacts
    assert (out / "clusters").exists()
    assert (out / "reports" / "funnel.json").exists()
    assert (out / "reports" / "dedup_by_source.json").exists()
    assert (out / "reports" / "contamination.json").exists()
    shards = spark.read.parquet(str(out / "shards"))
    assert summary["n_kept_docs"] == shards.count() > 0
    assert summary["n_kept_docs"] <= summary["n_raw_docs"]

    # shard routing is the registered operator's routing
    assert shards.select("shard").distinct().count() <= 8
    bad = shards.withColumn(
        "expect",
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long") % 8).cast("int"),
    ).filter(F.col("shard") != F.col("expect")).count()
    assert bad == 0

    # keep decision == composition of the registered stages
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clusters = spark.read.parquet(str(out / "clusters"))
    dropped_dup = {r.doc_id for r in
                   clusters.filter("is_canonical = 0").collect()}
    quality_ok = {r.doc_id for r in
                  QUERIES["text_quality_score"].build(spark, SF)
                  .filter("quality_score >= 2").collect()}
    contaminated = set()
    for name, col in [("decontam_ngram_overlap", "doc_id"),
                      ("decontam_minhash_fuzzy", "train_doc"),
                      ("decontam_substring_spans", "doc_id")]:
        df = QUERIES[name].build(spark, SF)
        if "contaminated" in df.columns:
            df = df.filter("contaminated")
        contaminated |= {getattr(r, col) for r in df.collect()}
    expect = ({r.doc_id for r in docs.collect()} - dropped_dup) \
        & quality_ok - contaminated
    got = {r.doc_id for r in shards.select("doc_id").collect()}
    assert got == expect


def test_curate_keep_best_swaps_canonicals(spark, tmp_path):
    curate = _curate_mod.curate

    out = tmp_path / "runb"
    s = curate(spark, SF, str(out), shards=4, quality_min=0, keep_best=True)
    shards = spark.read.parquet(str(out / "shards"))
    reps = {r.rep_doc_id for r in
            QUERIES["curation_cluster_representatives"].build(spark, SF)
            .collect()}
    clustered = {r.doc_id for r in
                 spark.read.parquet(str(out / "clusters")).collect()}
    kept = {r.doc_id for r in shards.select("doc_id").collect()}
    # every kept clustered doc must be a quality-chosen representative
    assert (kept & clustered) == (reps & kept)
    assert s["n_kept_docs"] == len(kept)
