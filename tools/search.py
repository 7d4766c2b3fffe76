#!/usr/bin/env python
"""Retrieval-serving CLI — the search twin of tools/curate.py and
tools/ingest.py.

Two commands split retrieval the way a production search stack does:
an offline INDEX build (the expensive corpus aggregates, written once
as parquet), and online QUERY serving that reads only the index —
never the raw corpus:

    python tools/search.py index --sf-dir /root/testdata/sf0.01 --out /idx
    python tools/search.py text   --index /idx [--terms w1,w2] [-k 20]
    python tools/search.py vector --index /idx --query-id 300 [--nprobe 3]
    python tools/search.py hybrid --index /idx --query-id 300 [--terms ...]

Every scoring path IS a registered, oracle-checked operator's logic
(the CLI only re-reads its inputs from parquet instead of recomputing
them):

- ``text``   = text_bm25_topk's BM25 (same decimal log2 idf lane, same
  rank-11..13 auto term set when ``--terms`` is omitted).
- ``vector`` = ann_ivf_probed's IVF probe (same seed centroids, same
  sequential-fold cosine, same rounded-domain rank order).
- ``hybrid`` = text_rrf_fusion's reciprocal-rank rule (1/(60+rank))
  over the two lists above. Fusion assumes the dense ids are document
  ids (vec_id == doc_id, which the fixture tables satisfy); a corpus
  with a separate vector id space needs the mapping joined in first.

Index layout and the 100 TB story:

- ``tf/``        (doc_id, w, tf)   — the inverted-index postings;
  queries read it with ``w IN (...)`` so parquet row-group stats prune
  everything but the query terms' postings.
- ``vocab/``     (w, df_w, c_w)    — per-term stats for idf; same
  pushdown.
- ``doclen/``    (doc_id, dl), ``stats.json`` (n_docs, total_len).
- ``vectors/``   (vec_id, embedding, nrm) PARTITIONED BY cell — an IVF
  probe reads ONLY its nprobe cell directories (partition pruning at
  the source: nprobe/C of the data touched, exactly the fraction
  ann_ivf_probed's plan argues).
- ``centroids/`` (cell, c_emb)     — 16 rows; cell selection for a
  single query vector is driver-side Python over these 16 rows (a
  bounded left fold, bit-identical to the registered F.aggregate
  fold), so serving one query launches one pruned scan, not a
  broadcast join.

Scale shape: the index build is the registered queries' own
aggregates (one explode -> (doc, w) hash aggregate; one broadcast
centroid assignment); serving is bounded by postings/cells read, not
corpus size. No driver-side loop ever touches unbounded data — the
only collects are the 16-row centroid table, the <= |terms|-row vocab
slice, the 1-row stats, and the final top-k.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_K1 = 1.2
_B = 0.75
_RRF_K = 60


def _spark():
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("search-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# ---------------------------------------------------------------------------
# index build
# ---------------------------------------------------------------------------


def build_index(spark, sf_dir: str, out: str) -> dict:
    """Materialize the sparse + dense indexes. Each relation is the
    SAME one the registered queries build in-flight (retrieval.py's
    _query_term_parts, llm_ops._ivf_topk's seed/assign)."""
    from pyspark.sql import functions as F

    from arango_clickhouse_replica_spark.queries.llm_ops import _dot, _norm
    from arango_clickhouse_replica_spark.queries.text_lm import _doc_words
    from arango_clickhouse_replica_spark.sources.tables import load_table

    words = _doc_words(spark, sf_dir)
    dw = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    # Range-partition + sort the postings BY TERM before writing: each
    # parquet file/row-group then covers a narrow lexicographic w-range,
    # so a `w IN (...)` query skips every file whose [min_w, max_w]
    # stats miss the terms — file-level pruning measured by
    # tools/search_probe.py, not just asserted.
    (dw.repartitionByRange(8, F.col("w"))
       .sortWithinPartitions("w")
       .write.mode("overwrite").parquet(f"{out}/tf"))
    dw = spark.read.parquet(f"{out}/tf")  # re-read: one source of truth

    cw = dw.groupBy("w").agg(
        F.count("*").alias("df_w"), F.sum("tf").alias("c_w")
    )
    cw.write.mode("overwrite").parquet(f"{out}/vocab")

    dl = dw.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dl.write.mode("overwrite").parquet(f"{out}/doclen")

    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    ).collect()[0]
    Path(out, "stats.json").write_text(json.dumps(
        {"n_docs": stats["n_docs"], "total_len": stats["total_len"]}
    ))

    # dense side: IVF seed centroids + cell-partitioned vectors
    from pyspark.sql.window import Window

    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    n_cells = 16
    w_seed = Window.partitionBy(F.col("vec_id") % n_cells).orderBy("vec_id")
    centroids = (
        emb.withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") == 1)
        .select((F.col("vec_id") % n_cells).cast("int").alias("cell"),
                F.col("embedding").alias("c_emb"))
    )
    centroids.write.mode("overwrite").parquet(f"{out}/centroids")
    centroids = spark.read.parquet(f"{out}/centroids")

    sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("c_sim"), F.asc("cell")
    )
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", sim)
        .withColumn("c_rank", F.row_number().over(w_assign))
        .filter(F.col("c_rank") == 1)
        .select("vec_id", "embedding", "nrm", "cell")
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{out}/vectors"
    )
    n_vecs = spark.read.parquet(f"{out}/vectors").count()
    return {"n_docs": int(stats["n_docs"]), "n_vectors": int(n_vecs),
            "n_cells": n_cells}


# ---------------------------------------------------------------------------
# text (BM25) serving
# ---------------------------------------------------------------------------


def _auto_terms(spark, index: str) -> list[str]:
    """The registered deterministic query-term set: corpus-frequency
    ranks 11..13 (c_w desc, w asc) — text_bm25_topk's _QTERM_LO..HI."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{index}/vocab")
        .orderBy(F.desc("c_w"), F.asc("w"))
        .limit(13)
        .collect()
    )
    return [r["w"] for r in rows[10:13]]


def bm25_search(spark, index: str, terms: list[str], k: int = 20):
    """BM25 top-k from the prebuilt postings — the same decimal lanes
    as text_bm25_topk: idf through the round+DECIMAL log2 lane,
    per-term scores rounded to 6-dp decimals before the cross-term
    sum."""
    from pyspark.sql import functions as F

    from arango_clickhouse_replica_spark.queries.text_lm import _LOG2_DEC

    stats = json.loads(Path(index, "stats.json").read_text())
    n_docs, total_len = stats["n_docs"], stats["total_len"]

    vocab = (
        spark.read.parquet(f"{index}/vocab")
        .filter(F.col("w").isin(terms))   # parquet-pruned postings read
        .select(
            "w",
            F.expr(_LOG2_DEC.format(
                x=f"(cast({n_docs} as double) - cast(df_w as double) + 0.5)"
                  f" / (cast(df_w as double) + 0.5) + 1.0")).alias("idf_w"),
        )
    )
    tf = spark.read.parquet(f"{index}/tf").filter(F.col("w").isin(terms))
    dl = spark.read.parquet(f"{index}/doclen")
    scored = (
        tf.join(F.broadcast(vocab), "w")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.col("idf_w").cast("double") * F.col("tf").cast("double")
                * F.lit(_K1 + 1.0)
                / (F.col("tf").cast("double") + F.lit(_K1)
                   * (F.lit(1.0 - _B) + F.lit(_B)
                      * F.col("dl").cast("double") * F.lit(float(n_docs))
                      / F.lit(float(total_len)))),
                6,
            ).cast("decimal(18,6)").alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("term_score").cast("double").alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# vector (IVF) serving
# ---------------------------------------------------------------------------


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left-fold dot product — the same accumulation order as the
    registered F.aggregate fold, so cell selection here picks the
    exact cells the in-flight plan would."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def probe_cells(spark, index: str, q_vec: list[float], nprobe: int) -> list[int]:
    """nprobe nearest centroids for one query vector, driver-side over
    the 16-row centroid table (bounded by construction)."""
    cents = spark.read.parquet(f"{index}/centroids").collect()
    qn = math.sqrt(_fold_dot(q_vec, q_vec))
    scored = []
    for r in cents:
        c = list(r["c_emb"])
        sim = _fold_dot(q_vec, c) / (qn * math.sqrt(_fold_dot(c, c)))
        scored.append((-sim, r["cell"]))
    scored.sort()
    return [cell for _, cell in scored[:nprobe]]


def vector_search(spark, index: str, q_id: int, q_vec: list[float],
                  nprobe: int = 3, k: int = 5):
    """IVF top-k from the cell-partitioned vector index: the probed
    cells' directories are the ONLY data read (partition pruning), and
    scoring inside them is ann_ivf_probed's rounded-domain rank."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from arango_clickhouse_replica_spark.queries.llm_ops import _dot

    cells = probe_cells(spark, index, q_vec, nprobe)
    # Path-level pruning, not just partition-filter pruning: list ONLY
    # the probed cells' directories (basePath keeps the `cell` column).
    # The scan provably cannot touch the other C-nprobe cells —
    # tools/search_probe.py asserts it via inputFiles().
    vecs = (
        spark.read.option("basePath", f"{index}/vectors")
        .parquet(*[f"{index}/vectors/cell={c}" for c in cells])
        .filter(F.col("vec_id") != q_id)
    )
    q_arr = F.array(*[F.lit(float(x)) for x in q_vec])
    q_nrm = math.sqrt(_fold_dot(q_vec, q_vec))
    sim = _dot(q_arr, F.col("embedding")) / (F.lit(q_nrm) * F.col("nrm"))
    return (
        vecs.select(
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        .limit(k)
        # rank over the already-bounded k rows (never the full cell scan)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
            ).cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# hybrid (RRF) serving
# ---------------------------------------------------------------------------


def rrf_fuse(text_rows: list, vec_rows: list, k: int = 10) -> list[dict]:
    """Reciprocal-rank fusion over the two (already bounded) top-k
    lists — text_rrf_fusion's 1/(60+rank) rule, driver-side because
    both inputs are k rows by construction."""
    scores: dict[int, dict] = {}
    for rank, r in enumerate(text_rows, start=1):
        e = scores.setdefault(int(r["doc_id"]),
                              {"doc_id": int(r["doc_id"]), "rrf": 0.0,
                               "text_rank": None, "vector_rank": None})
        e["rrf"] += 1.0 / (_RRF_K + rank)
        e["text_rank"] = rank
    for rank, r in enumerate(vec_rows, start=1):
        e = scores.setdefault(int(r["neighbor_id"]),
                              {"doc_id": int(r["neighbor_id"]), "rrf": 0.0,
                               "text_rank": None, "vector_rank": None})
        e["rrf"] += 1.0 / (_RRF_K + rank)
        e["vector_rank"] = rank
    out = sorted(scores.values(), key=lambda e: (-e["rrf"], e["doc_id"]))[:k]
    for e in out:
        e["rrf"] = round(e["rrf"], 6)
    return out


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _load_query_vec(spark, index: str, q_id: int) -> list[float]:
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{index}/vectors")
        .filter(F.col("vec_id") == q_id).select("embedding").collect()
    )
    if not rows:
        raise SystemExit(f"vec_id {q_id} not in index")
    return list(rows[0]["embedding"])


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index")
    pi.add_argument("--sf-dir", required=True)
    pi.add_argument("--out", required=True)

    pt = sub.add_parser("text")
    pt.add_argument("--index", required=True)
    pt.add_argument("--terms", default=None,
                    help="comma-separated; default: the deterministic "
                         "rank-11..13 corpus set")
    pt.add_argument("-k", type=int, default=20)

    pv = sub.add_parser("vector")
    pv.add_argument("--index", required=True)
    pv.add_argument("--query-id", type=int, required=True)
    pv.add_argument("--nprobe", type=int, default=3)
    pv.add_argument("-k", type=int, default=5)

    ph = sub.add_parser("hybrid")
    ph.add_argument("--index", required=True)
    ph.add_argument("--query-id", type=int, required=True)
    ph.add_argument("--terms", default=None)
    ph.add_argument("--nprobe", type=int, default=3)
    ph.add_argument("-k", type=int, default=10)

    args = p.parse_args(argv)
    spark = _spark()

    if args.cmd == "index":
        summary = build_index(spark, args.sf_dir, args.out)
        print(json.dumps({"indexed": summary, "out": args.out}))
        return

    if args.cmd == "text":
        terms = (args.terms.split(",") if args.terms
                 else _auto_terms(spark, args.index))
        rows = [r.asDict() for r in
                bm25_search(spark, args.index, terms, k=args.k).collect()]
        print(json.dumps({"terms": terms, "hits": rows}, default=str))
        return

    q_vec = _load_query_vec(spark, args.index, args.query_id)
    if args.cmd == "vector":
        rows = [r.asDict() for r in
                vector_search(spark, args.index, args.query_id, q_vec,
                              nprobe=args.nprobe, k=args.k).collect()]
        print(json.dumps({"query_id": args.query_id, "hits": rows}))
        return

    terms = (args.terms.split(",") if args.terms
             else _auto_terms(spark, args.index))
    text_rows = bm25_search(spark, args.index, terms, k=args.k).collect()
    vec_rows = vector_search(spark, args.index, args.query_id, q_vec,
                             nprobe=args.nprobe, k=args.k).collect()
    print(json.dumps({
        "query_id": args.query_id, "terms": terms,
        "hits": rrf_fuse(text_rows, vec_rows, k=args.k),
    }))


if __name__ == "__main__":
    main()
