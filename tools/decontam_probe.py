#!/usr/bin/env python
"""Eval-set-scale probe for the decontamination family (r5 verdict item
#4): all three decontam pipelines BROADCAST the eval side, which is
structurally sound for real benchmark suites (fixed, small) but the
fixture's ``doc_id % 97`` stand-in grows with the corpus. This probe
measures the same pipelines (the queries' own builders, via their
``eval_mod`` parameter) on a K x sf0.1 corpus at the fixture density
(~1%, eval_mod=97) AND at a 10x-denser eval set (eval_mod=10 — the
"100x larger eval relation" when combined with the 10x corpus), records
the broadcast side's actual row count and estimated bytes, and appends
the table to docs/SCALING.md.

What "holds" means: wall time scales with the train-side join, the
driver survives the broadcast build, and the eval-side bytes stay
within Spark's default 8 GB broadcast-table hard cap with documented
headroom; past that, the written cutover is removing the hint so AQE
keeps a shuffle join (the r5 blocking.py rule).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
K = int(os.environ.get("DECONTAM_PROBE_K", "10"))
EVAL_MODS = (97, 10)


def synthesize_documents(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{BASE}/documents.parquet")
    span = df.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(K):
        d = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * span).cast("long"))
        if i > 0:
            d = d.withColumn("text", F.concat(F.col("text"), F.lit(f" r{i}")))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def eval_side_size(spark, sf_dir: str, eval_mod: int) -> dict:
    """Rows and estimated bytes of each pipeline's broadcast relation."""
    from pyspark.sql import functions as F

    from arango_clickhouse_replica_spark.operators.minhash import band_signatures
    from arango_clickhouse_replica_spark.queries.llm_ops import (
        _doc_shingles,
        _doc_shingles_capped,
        _rolling_windows,
    )

    sh = _doc_shingles(spark, sf_dir)
    eval_sh = (
        sh.filter(F.col("doc_id") % eval_mod == 0).select("s").distinct()
    )
    ng = eval_sh.agg(
        F.count("*").alias("rows"), F.sum(F.length("s")).alias("chars")
    ).collect()[0]
    bands = band_signatures(_doc_shingles_capped(spark, sf_dir))
    fz_rows = bands.filter(F.col("doc_id") % eval_mod == 0).count()
    wins = _rolling_windows(spark, sf_dir)
    ss_rows = (
        wins.filter(F.col("doc_id") % eval_mod == 0).select("h").distinct().count()
    )
    return {
        "ngram_eval_rows": int(ng["rows"]),
        "ngram_eval_mb": round((ng["chars"] or 0) / 1e6, 1),
        "fuzzy_eval_sig_rows": int(fz_rows),
        "substr_eval_hash_rows": int(ss_rows),
        "substr_eval_mb": round(ss_rows * 32 / 1e6, 1),  # md5 hex strings
    }


def time_pipelines(spark, sf_dir: str, eval_mod: int) -> dict[str, float]:
    from arango_clickhouse_replica_spark.queries.llm_ops import (
        decontam_minhash_fuzzy,
        decontam_ngram_overlap,
        decontam_substring_spans,
    )

    out = {}
    for name, fn in (
        ("decontam_ngram_overlap", decontam_ngram_overlap),
        ("decontam_minhash_fuzzy", decontam_minhash_fuzzy),
        ("decontam_substring_spans", decontam_substring_spans),
    ):
        fn(spark, sf_dir, eval_mod=eval_mod).write.format("noop").mode(
            "overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir, eval_mod=eval_mod).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
    return out


def main() -> None:
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("decontam-probe")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = tempfile.mkdtemp(prefix="decontam_probe_")
    try:
        print(f"synthesizing {K}x sf0.1 documents into {big_dir} ...",
              file=sys.stderr)
        synthesize_documents(spark, big_dir)
        results = {}
        for mod in EVAL_MODS:
            results[mod] = {
                "sizes": eval_side_size(spark, big_dir, mod),
                "times": time_pipelines(spark, big_dir, mod),
            }
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)

    lines = [
        "",
        f"## Eval-set-scale probe — decontam family at {K}x sf0.1",
        "",
        f"{K}x sf0.1 documents (~{5000 * K // 1000}k docs, salted "
        "replicas); each pipeline driven through its own builder with "
        "eval_mod in {97, 10}: 1% vs 10% of all documents marked eval — "
        "the broadcast side grows ~10x in rows and, with the 10x corpus, "
        "~100x vs the registered fixture rule. min-of-3 warm runs.",
        "",
        "| eval_mod | eval frac | ngram eval rows (MB) | fuzzy sig rows | "
        "substr hash rows (MB) | ngram s | fuzzy s | substr s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for mod in EVAL_MODS:
        s, t = results[mod]["sizes"], results[mod]["times"]
        lines.append(
            f"| {mod} | ~{100 // mod}% | {s['ngram_eval_rows']:,} "
            f"({s['ngram_eval_mb']}) | {s['fuzzy_eval_sig_rows']:,} | "
            f"{s['substr_eval_hash_rows']:,} ({s['substr_eval_mb']}) | "
            f"{t['decontam_ngram_overlap']} | "
            f"{t['decontam_minhash_fuzzy']} | "
            f"{t['decontam_substring_spans']} |"
        )
    with open("docs/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"K": K, "results": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
