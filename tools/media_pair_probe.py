#!/usr/bin/env python
"""Media pair-join stress probe: synthesize K x sf0.1 documents (default
100x) and measure the image/video band-join dedup operators' wall time
AND candidate-pair counts, appending a section to docs/SCALING.md.

The point (the r7 verdict's 100x bar, extended to the media family): the
occupancy caps must keep candidate volume LINEAR in the corpus. Group
structure is constant-size (4-5 members), so true-dup pairs grow
linearly with docs; any super-linear candidate growth would be a cap
defect. Candidate counts rebuild each query's OWN blocking stage from
the same extractors, with the occupancy caps IMPORTED from
multimodal_queries (band_occupancy_cap / frame_sig_occupancy_cap) — a
cap change re-measures here automatically instead of drifting.
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
K = int(os.environ.get("MEDIA_PAIR_PROBE_K", "100"))

OPS = ["mm_phash_dct_near_dup", "mm_video_frame_dedup",
       "mm_color_ahash_near_dup"]


def synthesize_docs(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(K):
        parts.append(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * span).cast("long")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def candidate_count(spark, sf_dir: str, op: str) -> int:
    """Rebuild the op's banding/blocking stage and count candidates
    BEFORE the verification filter."""
    from pyspark.sql import functions as F

    from arango_clickhouse_replica_spark.operators.multimodal import (
        extract_ahash,
        extract_phash,
        sample_mjpeg_dc_signatures,
        synth_group_rgb_png_media,
        synth_mjpeg_group_media,
        synth_phash_group_media,
    )
    from arango_clickhouse_replica_spark.queries.multimodal_queries import (
        band_occupancy_cap,
        frame_sig_occupancy_cap,
    )
    from arango_clickhouse_replica_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()

    if op == "mm_video_frame_dedup":
        occ_cap = frame_sig_occupancy_cap(n_docs)
        sig = sample_mjpeg_dc_signatures(
            synth_mjpeg_group_media(docs), every_n=1
        ).select(
            F.col("media_id").alias("doc_id"),
            F.col("sum_pixels").alias("s"),
            F.col("px_min").alias("mn"),
            F.col("px_max").alias("mx"),
        ).distinct()
        hot = (
            sig.groupBy("s", "mn", "mx").agg(F.count("*").alias("n"))
            .filter(F.col("n") > occ_cap).select("s", "mn", "mx")
        )
        cold = sig.join(hot, ["s", "mn", "mx"], "left_anti")
        return (
            cold.alias("a")
            .join(cold.alias("b"),
                  (F.col("a.s") == F.col("b.s"))
                  & (F.col("a.mn") == F.col("b.mn"))
                  & (F.col("a.mx") == F.col("b.mx"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select("a.doc_id", "b.doc_id").distinct().count()
        )

    occ_cap = band_occupancy_cap(n_docs)
    if op == "mm_phash_dct_near_dup":
        sigs = extract_phash(synth_phash_group_media(docs))
    else:
        sigs = extract_ahash(synth_group_rgb_png_media(docs))
    bands = sigs.select(
        F.col("media_id").alias("doc_id"),
        F.expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band, sig)"),
    )
    hot = (
        bands.groupBy("band", "sig").agg(F.count("*").alias("n"))
        .filter(F.col("n") > occ_cap).select("band", "sig")
    )
    cold = bands.join(hot, ["band", "sig"], "left_anti")
    return (
        cold.alias("a")
        .join(cold.alias("b"),
              (F.col("a.band") == F.col("b.band"))
              & (F.col("a.sig") == F.col("b.sig"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )


def main() -> None:
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("media_pair_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # thresholds stated in the emitted section; the occupancy caps are
    # IMPORTED from multimodal_queries (band_occupancy_cap /
    # frame_sig_occupancy_cap), so a cap change re-measures here
    # automatically instead of drifting
    import arango_clickhouse_replica_spark.queries.multimodal_queries as mq
    print(f"thresholds: phash<={mq._PHASH_HAMMING_MAX} "
          f"ahash<={mq._AHASH_HAMMING_MAX}", file=sys.stderr)

    tmp = tempfile.mkdtemp(prefix="media_pair_probe_")
    try:
        print(f"synthesizing {K}x sf0.1 documents into {tmp} ...",
              file=sys.stderr)
        synthesize_docs(spark, tmp)

        rows = []
        for op in OPS:
            q = QUERIES[op]
            for label, sf_dir in (("base", BASE), (f"{K}x", tmp)):
                t0 = time.time()
                n_pairs = q.build(spark, sf_dir).count()
                wall = time.time() - t0
                n_cand = candidate_count(spark, sf_dir, op)
                rows.append(
                    {"op": op, "scale": label, "wall_s": round(wall, 2),
                     "pairs": n_pairs, "candidates": n_cand}
                )
                print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"K": K, "rows": rows}))

        md = Path(__file__).resolve().parent.parent / "docs" / "SCALING.md"
        lines = [
            "",
            f"## Image/video band joins at {K}x (round 8)",
            "",
            f"`tools/media_pair_probe.py`, {K}x sf0.1 documents "
            f"({K * 5}k docs). Group structure is constant-size, so true "
            "pairs grow linearly; candidates are counted from the same "
            "blocking stages the queries run. Candidates per doc must "
            "stay flat for the occupancy caps to hold.",
            "",
            "| op | scale | wall (s) | result pairs | candidates | cand/doc |",
            "|---|---|---|---|---|---|",
        ]
        import duckdb
        base_docs = duckdb.sql(
            f"SELECT COUNT(*) FROM '{BASE}/documents.parquet'"
        ).fetchone()[0]
        for r in rows:
            n_docs = base_docs if r["scale"] == "base" else base_docs * K
            lines.append(
                f"| {r['op']} | {r['scale']} | {r['wall_s']} | "
                f"{r['pairs']} | {r['candidates']} | "
                f"{r['candidates'] / n_docs:.2f} |"
            )
        with md.open("a") as f:
            f.write("\n".join(lines) + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
