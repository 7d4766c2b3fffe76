#!/usr/bin/env python
"""Corpus-curation CLI — the training-data twin of tools/replicate.py.

One command takes a raw document corpus through the full curation
pipeline this engine implements as registered queries, and materializes
the kept corpus as training shards plus the audit reports a data team
publishes with a release:

    python tools/curate.py --sf-dir /root/testdata/sf0.01 --out /data/run1 \\
        [--shards 64] [--quality-min 2] [--decontam] [--keep-best]

Stages (each one IS a registered, oracle-checked operator — the CLI
only composes them):

1. Near-dup clustering: MinHash/LSH candidates -> connected components,
   materialized ONCE to ``<out>/clusters`` parquet
   (llm_ops.materialize_clusters) and reused by every later stage.
2. Keep decision: canonical-or-unclustered (with ``--keep-best``, the
   quality-aware representative from curation_cluster_representatives
   instead of min-id), quality score >= ``--quality-min``
   (text_quality_score), and — with ``--decontam`` — not flagged by any
   of the three decontamination probes (the curation_contamination_report
   union).
3. Shard export: kept documents hash-route to ``--shards`` shards with a
   reproducible within-shard order (curation_shard_export's md5 routing),
   written ``partitionBy(shard)`` to ``<out>/shards``.
4. Reports: the curation funnel, per-source drop audit, and (with
   --decontam) the per-method contamination report land as JSON under
   ``<out>/reports``; a one-line JSON summary prints to stdout.

Scale shape: no driver-side loops over data — the only collects are the
fixed-size report relations (4-row funnel, per-source audit, 4-row
contamination report) and the final count.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def curate(spark, sf_dir: str, out: str, *, shards: int = 64,
           quality_min: int = 2, decontam: bool = False,
           keep_best: bool = False) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from arango_clickhouse_replica_spark.queries.llm_ops import (
        curation_cluster_representatives,
        curation_contamination_report,
        decontam_minhash_fuzzy,
        decontam_ngram_overlap,
        decontam_substring_spans,
        materialize_clusters,
        text_quality_score,
    )
    from arango_clickhouse_replica_spark.queries.quality_filters import (
        curation_dedup_keep_list,
        curation_funnel_report,
    )
    from arango_clickhouse_replica_spark.sources.tables import load_table

    out_dir = Path(out)
    (out_dir / "reports").mkdir(parents=True, exist_ok=True)

    # 1. cluster relation, computed once, durable
    clusters = materialize_clusters(spark, sf_dir, str(out_dir / "clusters"))

    # 2. keep decision
    docs = load_table(spark, "documents", sf_dir)
    if keep_best:
        reps = curation_cluster_representatives(spark, sf_dir).select(
            F.col("rep_doc_id").alias("doc_id"), F.lit(1).alias("rep")
        )
        clustered = clusters.select("doc_id").join(
            reps, "doc_id", "left"
        ).select("doc_id", F.coalesce("rep", F.lit(0)).alias("keep_flag"))
    else:
        clustered = clusters.select(
            "doc_id", F.col("is_canonical").alias("keep_flag")
        )
    quality = text_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    kept = (
        docs.join(clustered, "doc_id", "left")
        .filter(F.coalesce("keep_flag", F.lit(1)) == 1)
        .join(quality, "doc_id")
        .filter(F.col("quality_score") >= quality_min)
        .select(docs["*"])
    )
    if decontam:
        flagged = (
            decontam_ngram_overlap(spark, sf_dir)
            .filter("contaminated").select("doc_id")
            .unionByName(
                decontam_minhash_fuzzy(spark, sf_dir)
                .filter("contaminated")
                .select(F.col("train_doc").alias("doc_id")))
            .unionByName(
                decontam_substring_spans(spark, sf_dir).select("doc_id"))
            .distinct()
        )
        kept = kept.join(flagged, "doc_id", "left_anti")

    # 3. shard export (md5 routing + reproducible within-shard order)
    digest = F.md5(F.col("doc_id").cast("string"))
    routed = kept.withColumn("digest", digest).withColumn(
        "shard",
        (F.conv(F.substring("digest", 1, 8), 16, 10).cast("long")
         % shards).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("digest")
    routed = routed.withColumn("seq", F.row_number().over(w)).drop("digest")
    routed.write.mode("overwrite").partitionBy("shard").parquet(
        str(out_dir / "shards")
    )

    # 4. reports
    reports: dict = {
        "funnel": _rows(curation_funnel_report(spark, sf_dir)),
        "dedup_by_source": _rows(curation_dedup_keep_list(spark, sf_dir)),
    }
    if decontam:
        reports["contamination"] = _rows(
            curation_contamination_report(spark, sf_dir)
        )
    for name, rows in reports.items():
        (out_dir / "reports" / f"{name}.json").write_text(
            json.dumps(rows, indent=2, default=str)
        )

    n_raw = docs.count()
    n_kept = spark.read.parquet(str(out_dir / "shards")).count()
    summary = {
        "sf_dir": sf_dir,
        "out": str(out_dir),
        "n_raw_docs": n_raw,
        "n_kept_docs": n_kept,
        "kept_frac": round(n_kept / n_raw, 6) if n_raw else None,
        "shards": shards,
        "quality_min": quality_min,
        "decontam": decontam,
        "keep_best": keep_best,
        "reports": sorted(reports),
    }
    (out_dir / "reports" / "summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True,
                    help="input corpus root (documents.parquet + friends)")
    ap.add_argument("--out", required=True,
                    help="output root: clusters/, shards/, reports/")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--quality-min", type=int, default=2,
                    help="minimum text_quality_score (0-3) to keep")
    ap.add_argument("--decontam", action="store_true",
                    help="drop docs flagged by ANY of the three "
                         "decontamination probes")
    ap.add_argument("--keep-best", action="store_true",
                    help="keep each cluster's best-quality member "
                         "(curation_cluster_representatives) instead of "
                         "the min-id canonical")
    args = ap.parse_args()

    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")
    summary = curate(
        spark, args.sf_dir, args.out,
        shards=args.shards, quality_min=args.quality_min,
        decontam=args.decontam, keep_best=args.keep_best,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
