"""Embedding-matrix operators over the ``embeddings`` table: one Lloyd
(k-means) refinement round and per-dimension feature statistics. These
extend the ANN family (llm_ops.py): ann_ivf_probed seeds cells with
first-of-class vectors and notes "k-means would refine them" — this
module IS that refinement, expressed as DataFrame ops, plus the
mean/std-per-dimension pass a whitening or quantization stage needs.

Cross-engine determinism (driver hash-compares vs DuckDB):

- Vector x centroid similarity folds SEQUENTIALLY over the array
  (F.aggregate / list_reduce) — bit-identical doubles, as established
  for the ANN oracles in llm_ops.py.
- Cross-ROW float sums (centroid means, dimension stats) are sums of
  6-dp DECIMALs (exact, order-independent): partition order can never
  change a result bit.
- Refined centroids are rebuilt as arrays ordered by dimension index on
  both engines (sort_array(collect_list(struct)) / list(... ORDER BY)),
  so the second assignment pass folds the same sequence again.

Scale (100 TB):

- Assignment is a narrow broadcast pass: K centroids (K*dim doubles)
  broadcast to every executor; per-vector argmax is map-side only.
- The centroid update is ONE posexplode -> hash-aggregate on (cell,
  dim): dim*N rows, map-side combinable, shuffle keyed by (cell, dim)
  — K*dim result rows, collapsed back to K arrays driver-free.
- Dimension stats are the same explode-aggregate keyed by dim alone.
- No driver-side collect anywhere; the refined-centroid relation (K
  rows) re-broadcasts for the second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query
from .llm_ops import _DOT_SQL, _NORM_SQL, _dot, _norm

_N_CELLS = 16

# Exact decimal lane for a cross-row float sum: round the (deterministic)
# double to 6 dp, sum as DECIMAL. See text_lm.py module docstring.
_DEC = "cast(round({x}, 6) as decimal(18,6))"
_DEC_SQL = "CAST(round({x}, 6) AS DECIMAL(18,6))"


def _seed_centroids(emb: DataFrame) -> DataFrame:
    """Deterministic seeds: first vector of each (vec_id % K) class —
    identical to ann_ivf_probed's seeding (llm_ops.py)."""
    w_seed = Window.partitionBy(F.col("vec_id") % _N_CELLS).orderBy("vec_id")
    return (
        emb.withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("vec_id") % _N_CELLS).cast("int").alias("cell"),
            F.col("embedding").alias("c_emb"),
        )
    )


def _assign(emb: DataFrame, centroids: DataFrame, sim_expr) -> DataFrame:
    """Nearest-centroid assignment via broadcast argmax (cell tiebreak)."""
    d = emb.crossJoin(F.broadcast(centroids)).withColumn("c_sim", sim_expr)
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    return (
        d.withColumn("c_rank", F.row_number().over(w))
        .filter(F.col("c_rank") == 1)
        .select("vec_id", "embedding", "cell", "c_sim")
    )


_KMEANS_ORACLE = f"""
    WITH base AS (
      SELECT vec_id, embedding, {_NORM_SQL.format(a='embedding')} AS nrm
      FROM embeddings
    ),
    seeds AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    assign0 AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT b.vec_id, b.embedding, s.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY ({_DOT_SQL.format(a='b.embedding', b='s.c_emb')}
                           / (b.nrm * {_NORM_SQL.format(a='s.c_emb')})) DESC,
                          s.cell) AS c_rank
        FROM base b CROSS JOIN seeds s
      ) WHERE c_rank = 1
    ),
    comps AS (
      SELECT a.cell, t.i AS pos,
             CAST(SUM({_DEC_SQL.format(x='CAST(a.embedding[t.i] AS DOUBLE)')})
                  AS DOUBLE) / COUNT(*) AS cval
      FROM assign0 a, unnest(range(1, len(a.embedding) + 1)) AS t(i)
      GROUP BY a.cell, t.i
    ),
    refined AS (
      SELECT cell, list(cval ORDER BY pos) AS c_emb
      FROM comps GROUP BY cell
    ),
    assign1 AS (
      SELECT vec_id, cell, c_sim FROM (
        SELECT b.vec_id, r.cell,
               ({_DOT_SQL.format(a='b.embedding', b='r.c_emb')}
                / (b.nrm * {_NORM_SQL.format(a='r.c_emb')})) AS c_sim,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY ({_DOT_SQL.format(a='b.embedding', b='r.c_emb')}
                           / (b.nrm * {_NORM_SQL.format(a='r.c_emb')})) DESC,
                          r.cell) AS c_rank
        FROM base b CROSS JOIN refined r
      ) WHERE c_rank = 1
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM({_DEC_SQL.format(x='c_sim')}) AS DOUBLE) / COUNT(*)
             AS mean_cohesion
    FROM assign1
    GROUP BY cell
    ORDER BY cell
    """


@query(
    "embed_kmeans_lloyd",
    oracle=_KMEANS_ORACLE,
    tags=("embedding", "kmeans", "clustering"),
    doc="One Lloyd refinement round over the IVF seed centroids (16 "
        "cells): broadcast cosine argmax assignment, centroid update as "
        "a single posexplode hash-aggregate on (cell, dim) with exact "
        "decimal sums, array rebuild ordered by dim, second broadcast "
        "assignment, per-cell size + mean cohesion. The full Lloyd loop "
        "is this round iterated — each round is one narrow broadcast "
        "pass + one map-side-combinable shuffle of K*dim cells, no "
        "driver collect.",
)
def embed_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    seeds = _seed_centroids(emb)

    seed_sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    assign0 = _assign(emb.select("vec_id", "embedding", "nrm"), seeds, seed_sim)

    # Centroid update: dim*N rows keyed (cell, pos); mean = exact decimal
    # sum / count, cast to double once. posexplode is 0-based; the oracle
    # uses 1-based list indexing — only the per-cell ORDERING matters.
    comps = (
        assign0.select("cell", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum(F.expr(_DEC.format(x="cast(v as double)"))).cast("double")
                / F.count("*")
            ).alias("cval")
        )
    )
    refined = comps.groupBy("cell").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("c_emb")
    )

    ref_sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    assign1 = _assign(emb.select("vec_id", "embedding", "nrm"), refined, ref_sim)

    return (
        assign1.groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            (
                F.sum(F.expr(_DEC.format(x="c_sim"))).cast("double") / F.count("*")
            ).alias("mean_cohesion"),
        )
        .orderBy("cell")
    )


@query(
    "embed_dim_stats",
    oracle=f"""
    SELECT t.i - 1 AS dim, CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM({_DEC_SQL.format(
               x='CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
             / COUNT(*), 6) AS mean,
           round(sqrt(
             CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)'
                   ' * CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
               / COUNT(*)
             - (CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
                / COUNT(*))
               * (CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
                  / COUNT(*))), 6) AS std
    FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
    GROUP BY t.i
    ORDER BY dim
    """,
    tags=("embedding", "stats"),
    doc="Per-dimension mean/std over the embedding matrix — the feature-"
        "statistics pass feeding whitening, PCA preprocessing, or "
        "quantizer calibration. One posexplode -> hash aggregate keyed "
        "by dimension (dim*N rows, map-side combinable, dim result "
        "rows); moments accumulate as exact 6-dp decimals so partition "
        "order never shifts a bit. sqrt is IEEE-correctly-rounded — "
        "safe on deterministic inputs, unlike log (see text_lm.py).",
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    v = F.col("v").cast("double")
    agg = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(_DEC.format(x="cast(v as double)")))
            .cast("double").alias("s1"),
            F.sum(
                F.round(v * v, 6).cast("decimal(18,6)")
            ).cast("double").alias("s2"),
        )
    )
    mean = F.col("s1") / F.col("n")
    return agg.select(
        "dim",
        "n",
        F.round(mean, 6).alias("mean"),
        # mean*mean, not pow(mean, 2): libm pow is not guaranteed
        # correctly rounded; multiplication is.
        F.round(F.sqrt(F.col("s2") / F.col("n") - mean * mean), 6)
        .alias("std"),
    ).orderBy("dim")
