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
from .llm_ops import Q_MAX as _Q_MAX

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
    """Nearest-centroid assignment via broadcast argmax (cell tiebreak).

    ``emb`` must carry ``(vec_id, embedding, nrm)``. One map-side-
    combinable max-struct aggregate instead of a row_number window over
    the N x K crossed relation (round-5 verdict item #3): the window
    shape shuffle-SORTS all N*K rows keyed by vec_id, while the
    aggregate partial-combines to one row per vec_id before the
    exchange — the shuffle carries N rows, not N*K. Ordering
    (c_sim DESC, cell ASC) == MAX of struct(c_sim, -cell); the payload
    fields ride behind and are never compared because cell is unique
    within a vec_id group. Ties on c_sim resolve identically to the
    window (lowest cell), and c_sim doubles are bit-identical (same
    expression), so the oracles' row_number SQL stays exact."""
    d = emb.crossJoin(F.broadcast(centroids)).withColumn("c_sim", sim_expr)
    best = d.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("c_sim").alias("s"),
                (-F.col("cell")).alias("neg_cell"),
                F.col("embedding").alias("e"),
                F.col("nrm").alias("n"),
            )
        ).alias("mx")
    )
    return best.select(
        "vec_id",
        F.col("mx.e").alias("embedding"),
        (-F.col("mx.neg_cell")).cast("int").alias("cell"),
        F.col("mx.s").alias("c_sim"),
        F.col("mx.n").alias("nrm"),
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
    # emb feeds the seeding window and BOTH assignment passes (Lloyd
    # re-assignment must rescan the vectors) — materialize the scan +
    # norm once (guide §2.4/§5). The spread parallelizes the broadcast
    # argmax (a 64-dim fold x K per row) that otherwise runs on the
    # single-split scan partitioning (guide §2.6); the checkpoint
    # materializes it once for both passes.
    from ..sources.tables import spread_small_scan

    emb = spread_small_scan(
        load_table(spark, "embeddings", sf_dir), "vec_id"
    ).withColumn("nrm", _norm(F.col("embedding"))).localCheckpoint(eager=True)
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
           round(sqrt(GREATEST(0,
             CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)'
                   ' * CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
               / COUNT(*)
             - (CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
                / COUNT(*))
               * (CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE)
                  / COUNT(*)))), 6) AS std
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
        # correctly rounded; multiplication is. Variance is clamped at 0:
        # the 6-dp-rounded moment terms can make E[x^2]-mean^2 a tiny
        # negative for a near-constant dimension, which would be NaN here
        # but an Out-of-Range ERROR in DuckDB's sqrt — clamping both sides
        # keeps the engines in lockstep on any fixture.
        F.round(
            F.sqrt(F.greatest(F.lit(0.0), F.col("s2") / F.col("n") - mean * mean)),
            6,
        ).alias("std"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# Product quantization (PQ): 8 subspaces x 8 dims, 16 codes per subspace.
# Seeds follow the IVF convention (first vector of each vec_id % 16 class);
# embed_kmeans_lloyd is the refinement those codebooks would get.
# ---------------------------------------------------------------------------

_PQ_M = 8       # subspaces
_PQ_DIM = 8     # dims per subspace
_PQ_K = 16      # codes per subspace

# Sequential-fold squared L2 distance between two equal-length arrays —
# bit-identical on both engines (same accumulation sequence, see _dot).
_L2SQ_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
    " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), (p, q) -> p + q)"
)


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# (vec_id, m, sv): every vector split into its M subvectors.
_PQ_SUBVECS_SQL = f"""
  SELECT vec_id, CAST(u.m AS INT) AS m,
         embedding[CAST({_PQ_DIM} * u.m + 1 AS INT)
                   :CAST({_PQ_DIM} * u.m + {_PQ_DIM} AS INT)] AS sv
  FROM embeddings, unnest(range(0, {_PQ_M})) AS u(m)
"""

# (m, k, cv): per-subspace codebooks from the 16 deterministic seed vectors.
_PQ_CODEBOOK_SQL = f"""
  SELECT CAST(u.m AS INT) AS m, s.k,
         s.embedding[CAST({_PQ_DIM} * u.m + 1 AS INT)
                     :CAST({_PQ_DIM} * u.m + {_PQ_DIM} AS INT)] AS cv
  FROM (
    SELECT CAST(vec_id % {_PQ_K} AS INT) AS k, embedding
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_PQ_K}
                                       ORDER BY vec_id) AS rn
          FROM embeddings)
    WHERE rn = 1
  ) s, unnest(range(0, {_PQ_M})) AS u(m)
"""

# (vec_id, m, code, qerr): nearest codebook entry per subvector.
_PQ_CODES_SQL = f"""
  SELECT vec_id, m, k AS code, d2 AS qerr FROM (
    SELECT sv.vec_id, sv.m, cb.k,
           {_L2SQ_SQL.format(a='sv.sv', b='cb.cv')} AS d2,
           ROW_NUMBER() OVER (
             PARTITION BY sv.vec_id, sv.m
             ORDER BY {_L2SQ_SQL.format(a='sv.sv', b='cb.cv')} ASC, cb.k
           ) AS rn
    FROM ({_PQ_SUBVECS_SQL}) sv JOIN ({_PQ_CODEBOOK_SQL}) cb USING (m)
  ) WHERE rn = 1
"""


def _pq_subvecs(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}),"
                f" m -> slice(embedding, {_PQ_DIM} * m + 1, {_PQ_DIM}))"
            )
        ).alias("m", "sv"),
    )


def _pq_codebook(emb: DataFrame) -> DataFrame:
    seeds = _seed_centroids(emb).withColumnRenamed("cell", "k")
    return seeds.select(
        "k",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}),"
                f" m -> slice(c_emb, {_PQ_DIM} * m + 1, {_PQ_DIM}))"
            )
        ).alias("m", "cv"),
    )


def _pq_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, m, code, qerr): PQ encoding via broadcast codebook argmin.

    The argmin is a hash aggregate (min of a (d2, k) struct — lexicographic,
    so ties break on the smaller code, identical to ROW_NUMBER ... ORDER BY
    d2 ASC, k ASC) with map-side partial combine: the N*M*K scored relation
    collapses to N*M rows before any exchange, where a row_number window
    would sort the full scored relation."""
    sv = _pq_subvecs(emb)
    cb = _pq_codebook(emb)
    d = sv.join(F.broadcast(cb), "m").withColumn(
        "d2", _l2sq(F.col("sv"), F.col("cv"))
    )
    return (
        d.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("d2"), F.col("k"))).alias("mn"))
        .select("vec_id", "m", F.col("mn.k").alias("code"),
                F.col("mn.d2").alias("qerr"))
    )


@query(
    "embed_pq_codebooks",
    oracle=f"""
    SELECT m, code, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM({_DEC_SQL.format(x='qerr')}) AS DOUBLE) / COUNT(*)
             AS mean_qerr
    FROM ({_PQ_CODES_SQL})
    GROUP BY m, code
    ORDER BY m, code
    """,
    tags=("embedding", "pq", "quantization"),
    doc="Product-quantization encoder diagnostics (FAISS-PQ shape): 64-dim "
        "vectors split into 8x8-dim subspaces, each encoded against a "
        "16-entry codebook (seeded like ann_ivf_probed's centroids) by "
        "squared-L2 argmin; outputs the code-usage histogram + mean "
        "quantization error per (subspace, code) — the codebook-balance "
        "check run before committing a PQ index. Encoding is a narrow "
        "broadcast pass (codebooks are 128 tiny rows); the histogram is "
        "one map-side-combinable aggregate. 8x32 bits -> 8x4 bits = 16x "
        "compression for a 100 TB embedding store.",
)
def embed_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    codes = _pq_codes(emb)
    return (
        codes.groupBy("m", "code")
        .agg(
            F.count("*").alias("n_vectors"),
            (
                F.sum(F.expr(_DEC.format(x="qerr"))).cast("double") / F.count("*")
            ).alias("mean_qerr"),
        )
        .orderBy("m", "code")
    )


def _adc_serve(
    codes_wide: DataFrame,
    queries: DataFrame,
    cb: DataFrame,
    vectors: DataFrame,
) -> DataFrame:
    """The PQ asymmetric-distance serving read, shared by the full-corpus
    query and the incremental-index read: per bounded query a 128-entry
    exact-int LUT broadcasts as one numpy tensor, the ADC scan is a
    narrow mapInPandas pass over ``codes_wide`` (vec_id, 8-code array)
    emitting only per-partition shortlists, and the shortlist reranks at
    full precision against ``vectors`` — the CURRENT vector state."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    # The bounded query set feeds the LUT collect AND the final rerank
    # join — materialize once so the query-selection subtree (scan +
    # orderBy/limit) doesn't re-execute per reference (guide §2.4).
    # LAZY (r15): the LUT collect below is the first action and
    # materializes it — one job instead of a checkpoint job + collect
    # job (the components.py per-round action-economy pattern).
    queries = queries.localCheckpoint(eager=False)

    # Per-(query, m, k) partial distances in the EXACT decimal lane,
    # scaled to int64 (scale-6 decimal * 1e6 is exact) so the 8-term ADC
    # sums below are exact integers — the same total order as the
    # oracle's decimal SUM, immune to float accumulation order.
    lut_rows = (
        queries.crossJoin(F.broadcast(cb))
        .select(
            "query_id", "m", "k",
            (F.expr(_DEC.format(
                x=f"aggregate(zip_with(slice(q_emb, {_PQ_DIM} * m + 1, {_PQ_DIM}),"
                  " cv, (x, y) -> (cast(x as double) - cast(y as double))"
                  " * (cast(x as double) - cast(y as double))),"
                  " cast(0.0 as double), (acc, x) -> acc + x)"
            )) * 1000000).cast("long").alias("pdist_u"),
        )
        .collect()  # bounded: Q_MAX * 8 * 16 = 65,536 tiny rows
    )
    qi = sorted({r.query_id for r in lut_rows})
    q_ids = np.array(qi, dtype=np.int64)
    q_pos = {q: i for i, q in enumerate(qi)}
    lut = np.zeros((len(qi), _PQ_M, 16), dtype=np.int64)
    for r in lut_rows:
        lut[q_pos[r.query_id], r.m, r.k] = r.pdist_u
    bc = codes_wide.sparkSession.sparkContext.broadcast((q_ids, lut))
    n_short = 10

    def adc_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, table = bc.value
        topn = n_short + 1  # survive self-match removal downstream
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.stack(pdf["codes"].map(np.asarray)).astype(np.int64)
            cid = pdf["vec_id"].to_numpy()
            # adc[q, b] = sum_m LUT[q, m, code[b, m]] — 8 gathers, exact.
            adc = np.zeros((len(ids), cm.shape[0]), dtype=np.int64)
            for m in range(_PQ_M):
                adc += table[:, m, cm[:, m]]
            n = min(topn, adc.shape[1])
            # Oracle order: adc ASC, neighbor_id ASC — exact ints, so the
            # partition stage and the global window agree at boundaries.
            order = np.lexsort((np.broadcast_to(cid, adc.shape), adc),
                               axis=1)[:, :n]
            yield pd.DataFrame({
                "query_id": np.repeat(ids, n),
                "neighbor_id": cid[order.ravel()],
                "adc_u": np.take_along_axis(adc, order, axis=1).ravel(),
            })

    # Materialize the code table BEFORE the partition-count probe (r15):
    # ``.rdd.getNumPartitions()`` on a plan that still contains
    # Exchanges makes AQE materialize every upstream query stage just to
    # answer the partitioning question, and the mapInPandas pass below
    # then re-executed the whole encode/merge a second time (a fresh
    # physical plan cannot reuse the probe's stages). Checkpointed, the
    # probe reads the RDD's known partition count and the ADC scan reads
    # the persisted blocks — the encode runs ONCE (guide §2.4; both
    # callers' code tables are 16x smaller than the float store).
    shards = codes_wide.localCheckpoint(eager=True)
    parallelism = codes_wide.sparkSession.sparkContext.defaultParallelism
    if shards.rdd.getNumPartitions() < parallelism:
        shards = shards.repartition(parallelism)
    partial = shards.mapInPandas(
        adc_topk, "query_id long, neighbor_id long, adc_u long")
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc_u"), F.asc("neighbor_id")
    )
    shortlist = (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= n_short)
        .select("query_id", "neighbor_id")
    )
    cand = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("e_emb"),
        _norm(F.col("embedding")).alias("e_nrm"),
    )
    sim = F.round(
        _dot(F.col("q_emb"), F.col("e_emb")) / (F.col("q_nrm") * F.col("e_nrm")), 4
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(shortlist).join(queries, "query_id")
        .join(cand, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim",
                F.col("rn").cast("int").alias("rank"))
    )


@query(
    "ann_pq_adc_rerank",
    oracle=f"""
    WITH codes AS ({_PQ_CODES_SQL}),
    queries AS (
      SELECT vec_id AS query_id, embedding AS q_emb,
             {_NORM_SQL.format(a='embedding')} AS q_nrm
      FROM embeddings WHERE vec_id % 100 = 0
      ORDER BY vec_id LIMIT 512
    ),
    lut AS (
      SELECT q.query_id, cb.m, cb.k,
             {_DEC_SQL.format(x=_L2SQ_SQL.format(
                 a="q.q_emb[CAST(" + str(_PQ_DIM) + " * cb.m + 1 AS INT)"
                   ":CAST(" + str(_PQ_DIM) + " * cb.m + "
                   + str(_PQ_DIM) + " AS INT)]",
                 b='cb.cv'))} AS pdist
      FROM queries q CROSS JOIN ({_PQ_CODEBOOK_SQL}) cb
    ),
    approx AS (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(l.pdist) AS DOUBLE) AS adc_d2
      FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.k
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_d2 ASC, neighbor_id) AS rn
        FROM approx WHERE neighbor_id <> query_id
      ) WHERE rn <= 10
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM (
      SELECT s.query_id, s.neighbor_id,
             round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
                   / (q.q_nrm * {_NORM_SQL.format(a='e.embedding')}), 4)
               AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
                              / (q.q_nrm * {_NORM_SQL.format(a='e.embedding')}),
                              4) DESC, s.neighbor_id) AS rn
      FROM shortlist s
      JOIN queries q ON q.query_id = s.query_id
      JOIN embeddings e ON e.vec_id = s.neighbor_id
    ) WHERE rn <= 5
    """,
    tags=("similarity", "ann", "pq"),
    doc="PQ asymmetric-distance ANN (FAISS IndexPQ shape): candidates "
        "live as 8x4-bit codes; each query precomputes a 128-entry "
        "distance lookup table (query subvector x codebook entry), the "
        "approximate distance is 8 LUT adds per candidate (exact decimal "
        "sums), the 10-candidate shortlist is reranked at full precision "
        "for the top-5. At scale the LUT (Q*8*16 exact scaled-int "
        "distances — decimal(18,6)*1e6, so int64 sums replay the "
        "oracle's decimal sums bit-for-bit) broadcasts as one numpy "
        "tensor; the ADC scan is a narrow mapInPandas pass over the "
        "8-codes-per-vector table (16x smaller than the float store — "
        "bandwidth, not compute, bound) that emits only each "
        "partition's shortlist, so the exchange carries "
        "partitions*Q*(shortlist+1) rows, never N*Q (the join+groupBy "
        "variant measured 6.5x at 10x data; this shape re-measured "
        "1.2x); only Q*shortlist rows touch full-precision vectors.",
)
def ann_pq_adc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import spread_small_scan

    # Spread the single-split scan before the per-row PQ encode (8
    # subvector slices x 16 L2 argmins per vector — guide §2.6);
    # measured 5.7 -> 3.9 s isolated at sf0.1, no-op at real scale.
    emb = spread_small_scan(load_table(spark, "embeddings", sf_dir), "vec_id")
    codes = _pq_codes(emb)
    # One row per vector: the 8 subspace codes as an m-ordered array —
    # a single hash aggregate over the N*M code relation.
    codes_wide = (
        codes.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )
    # BOUNDED query set (orderBy+limit, constant ceiling — Q stays fixed
    # as the candidate table grows).
    queries = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(512)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    return _adc_serve(codes_wide, queries, _pq_codebook(emb),
                      emb.select("vec_id", "embedding"))


# ---------------------------------------------------------------------------
# ANN quality: recall of the LSH scale path vs the exact baseline, as a
# first-class oracle-checked query (not just a test assertion).
# ---------------------------------------------------------------------------

from .registry import QUERIES as _REG  # populated by earlier imports


# The three approximate scale paths the report grades, by name.
_BH_K = 5
_BH_QMAX = 512

# sign-bit packing: two 32-bit words per 64-dim vector (bit 63 in one
# BIGINT word would wrap negative and DuckDB's << overflow-checks it)
_BH_WORD_SQL = (
    "list_reduce(list_transform(range(0, 32), i -> CASE WHEN "
    "embedding[i + 1 + {off}] > 0 THEN (1::BIGINT << CAST(i AS INT)) "
    "ELSE 0::BIGINT END), (a, b) -> a + b)"
)


def _bh_word(off: int):
    # SQL-expr form: shiftleft's Python wrapper requires a literal bit
    # count, but the SQL function accepts the fold variable
    return F.expr(
        "aggregate(sequence(0, 31), 0L, (a, i) -> a + IF("
        f"embedding[i + {off}] > 0, shiftleft(1L, i), 0L))"
    )


@query(
    "embed_binary_hamming_topk",
    oracle=f"""
    WITH codes AS (
      SELECT vec_id,
             {_BH_WORD_SQL.format(off=0)} AS w0,
             {_BH_WORD_SQL.format(off=32)} AS w1
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1
      FROM codes WHERE vec_id % 100 = 0
      ORDER BY vec_id LIMIT {_BH_QMAX}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             bit_count(xor(c.w0, q.qw0))
               + bit_count(xor(c.w1, q.qw1)) AS hamming,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY bit_count(xor(c.w0, q.qw0))
                        + bit_count(xor(c.w1, q.qw1)), c.vec_id) AS rn
      FROM q JOIN codes c ON c.vec_id <> q.query_id
    )
    SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id,
           CAST(hamming AS BIGINT) AS hamming
    FROM scored WHERE rn <= {_BH_K}
    ORDER BY query_id, rank
    """,
    tags=("similarity", "ann", "binary", "hashing"),
    doc="Binary-hash ANN — the sign-bit binarization family (FAISS "
        "IndexBinaryFlat / ITQ-style retrieval: 64 dims collapse to 64 "
        "BITS, a 32x bandwidth cut below even int8): each embedding "
        "packs its sign pattern into two 32-bit words ENTIRELY "
        "JVM-side (whole-stage-codegen fold, no Python anywhere), and "
        "the bounded query set (orderBy+limit {qmax}, the Q_MAX "
        "policy) flat-scans candidates by XOR + bit_count popcount — "
        "exact integers, so the top-k selection can never disagree "
        "with the oracle at a tie boundary (hamming, vec_id total "
        "order). Complements the LSH (random hyperplane per band), "
        "int8, and PQ families with the popcount lane. Scale: the "
        "broadcast flat scan is O(N x Q) over 16-BYTE rows — the "
        "documented FAISS-binary-flat shape (BNLJ allowlisted); the "
        "rank window runs per query on the Q-keyed exchange.".format(
            qmax=_BH_QMAX),
)
def embed_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    codes = emb.select(
        "vec_id", _bh_word(0).alias("w0"), _bh_word(32).alias("w1")
    )
    q = (
        codes.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(_BH_QMAX)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("w0").alias("qw0"), F.col("w1").alias("qw1"),
        )
    )
    ham = (
        F.bit_count(F.expr("w0 ^ qw0")) + F.bit_count(F.expr("w1 ^ qw1"))
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            ham.alias("hamming"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BH_K)
        .select("query_id", "rank", "neighbor_id", "hamming")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# graph ANN: bounded beam search over a cell-local kNN graph (HNSW shape)
# ---------------------------------------------------------------------------

_BEAM_R = 4      # graph out-degree per node (before reverse-edge union)
_BEAM_W = 8      # beam width
_BEAM_HOPS = 2   # expansion rounds (unrolled — constant, like PageRank)


def _beam_oracle() -> str:
    norm = _NORM_SQL.format(a="embedding")
    c_sim = (f"({_DOT_SQL.format(a='embedding', b='c_emb')}"
             f" / (nrm * {_NORM_SQL.format(a='c_emb')}))")
    pair = (f"round({_DOT_SQL.format(a='a.embedding', b='b.embedding')}"
            f" / (a.nrm * b.nrm), 4)")

    def qs(m: str) -> str:
        return (f"round({_DOT_SQL.format(a='q.q_emb', b=f'{m}.embedding')}"
                f" / (q.q_nrm * {m}.nrm), 4)")

    hops = []
    prev = "s0"
    for i in range(1, _BEAM_HOPS + 1):
        hops.append(f"""
    c{i} AS (
      SELECT query_id, vec_id FROM {prev}
      UNION
      SELECT {prev}.query_id, e.dst
      FROM {prev} JOIN edges e ON e.src = {prev}.vec_id
    ),
    s{i} AS (
      SELECT query_id, vec_id, s FROM (
        SELECT c.query_id, c.vec_id, {qs('m')} AS s,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                                  ORDER BY {qs('m')} DESC, c.vec_id) AS rn
        FROM c{i} c
        JOIN base m ON m.vec_id = c.vec_id
        JOIN q ON q.query_id = c.query_id
        WHERE c.vec_id <> c.query_id
      ) WHERE rn <= {_BEAM_W}
    )""")
        prev = f"s{i}"
    hop_sql = ",".join(hops)
    return f"""
    WITH base AS (SELECT vec_id, embedding, {norm} AS nrm FROM embeddings),
    seeds AS (
      SELECT vec_id, embedding, nrm,
             CAST(vec_id % {_N_CELLS} AS INT) AS cell
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    centroids AS (SELECT cell, embedding AS c_emb FROM seeds),
    assign AS (
      SELECT vec_id, embedding, nrm, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY {c_sim} DESC, cell) AS c_rank
      FROM base CROSS JOIN centroids
    ),
    members AS (SELECT vec_id, embedding, nrm, cell
                FROM assign WHERE c_rank = 1),
    edir AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {pair} DESC, b.vec_id) AS rn
        FROM members a JOIN members b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
      ) WHERE rn <= {_BEAM_R}
    ),
    edges AS (SELECT src, dst FROM edir UNION SELECT dst, src FROM edir),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, {norm} AS q_nrm
          FROM embeddings WHERE vec_id % 100 = 0
          ORDER BY vec_id LIMIT {_Q_MAX}),
    s0 AS (
      SELECT query_id, vec_id, s FROM (
        SELECT q.query_id, m.vec_id, {qs('m')} AS s,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {qs('m')} DESC, m.vec_id) AS rn
        FROM q JOIN seeds m ON m.vec_id <> q.query_id
      ) WHERE rn <= {_BEAM_W}
    ),{hop_sql}
    SELECT query_id, vec_id AS neighbor_id, s AS cos_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, vec_id) AS rn
          FROM {prev})
    WHERE rn <= 5
    ORDER BY query_id, rank
    """


_GRAPH_CELL_CAP = 500  # sub-block cap for the graph-build pair kernel


def _graph_members(spark: SparkSession, sf_dir: str):
    """The beam-graph node partition: (emb, seeds, members-with-cell).
    Shared by ann_graph_beam_topk and its cap-contract test: the DuckDB
    oracle replays the edge build WITHOUT the sub-block term, which is
    exact only while every cell stays under _GRAPH_CELL_CAP — the test
    asserts that at every oracle-verified scale, so an overflow fails as
    a named contract, not a mystery hash mismatch (ADVICE r12)."""
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    w_seed = Window.partitionBy(F.col("vec_id") % _N_CELLS).orderBy("vec_id")
    seeds = (
        emb.withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "embedding", "nrm",
            (F.col("vec_id") % _N_CELLS).cast("int").alias("cell"),
        )
    )
    centroids = seeds.select("cell", F.col("embedding").alias("c_emb"))
    c_sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    members = _assign(
        emb.select("vec_id", "embedding", "nrm"), centroids, c_sim
    ).select("vec_id", "embedding", "nrm", "cell")
    return emb, seeds, members


@query(
    "ann_graph_beam_topk",
    oracle=_beam_oracle(),
    tags=("similarity", "ann", "graph", "beam-search"),
    doc="Graph ANN (r12, VERDICT r11 item 6) — the HNSW-shape fifth "
        "method beside brute/LSH/IVF/PQ: a bounded-degree proximity "
        "graph (per node, top-{r} cell-local neighbors by rounded-4dp "
        "cosine with id tiebreak, reverse edges unioned for "
        "navigability — the NSW base layer; cells are ann_ivf_probed's "
        "deterministic seeding) searched by {h} unrolled beam-expansion "
        "rounds: start from the 16 entry seeds, each round scores "
        "beam u neighbors(beam) against the query and keeps the "
        "rounded-domain top-{w}. Every rank rides round(sim, 4) + id "
        "tiebreak (the established raw-rank defense), so the oracle's "
        "row_number replays the selection exactly. Scale: the graph "
        "build is the cell-local sub-block-capped pair kernel (the "
        "mutual-kNN shape) shuffling 16-byte edges; search cost per "
        "round is |Q| x beam x (degree+1) rows — Q_MAX-capped and "
        "INDEPENDENT of N, the property that makes graph ANN the "
        "serving-path winner; hop count is a compile-time constant so "
        "the plan is a fixed pipeline, no iteration driver.".format(
            r=_BEAM_R, h=_BEAM_HOPS, w=_BEAM_W),
)
def ann_graph_beam_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.blocking import with_sub_block
    from .llm_ops import Q_MAX

    emb, seeds, members = _graph_members(spark, sf_dir)
    # graph build: the mutual-kNN cell-local pair kernel, kept to top-R
    # per source; sub-block cap bounds occupancy at scale (inactive at
    # fixture scale so the oracle replays exactly). The kernel input is
    # materialized once: the self-join's two sides would otherwise EACH
    # re-execute the whole upstream (scan + seeding window + broadcast
    # argmax) — the operators/ann_index.py cell_adjacency lesson (r14
    # opt round, guide §2.4: one pass, not one per plan reference).
    mb = with_sub_block(
        members, label_col="cell", label_cap=_GRAPH_CELL_CAP
    ).localCheckpoint(eager=True)
    a, b = mb.alias("a"), mb.alias("b")
    pair = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")), 4)
    w_src = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    edir = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            pair.alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= _BEAM_R)
        .select("src", "dst")
    )
    edges = edir.union(
        edir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)  # reused by every hop
    q = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(Q_MAX)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        .localCheckpoint(eager=True)  # bounded: Q_MAX rows
    )
    qsim = F.round(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_nrm") * F.col("nrm")), 4)
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("vec_id"))
    # Each hop references `beam` twice (carry-over union + edge
    # expansion), so without a materialization the beam lineage DOUBLES
    # per hop — 2^hops re-executions of the seed scoring (the r14 opt
    # round found 14 parquet re-scans of the same table in this plan).
    # The beam is Q_MAX x _BEAM_W rows by construction: checkpointing it
    # per hop is a bounded, scale-safe truncation (guide §3.3/§5), and
    # broadcasting it into the edge/node joins replaces per-hop
    # SortMergeJoins (which shuffled the corpus-sized sides every hop)
    # with broadcast hash joins that stream the big side (guide §3.1).
    # (r15 note: a single-reference rewrite — self-loop edges, one lazy
    # hop pipeline, fused final top-5 — was built and measured WORSE
    # isolated (9-48 s vs 5.3 s): the nested per-hop BroadcastExchanges
    # serialize the whole search into one deep AQE plan. Reverted.)
    beam = (
        F.broadcast(q)
        .join(seeds, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", qsim.alias("s"))
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= _BEAM_W)
        .select("query_id", "vec_id", "s")
        .localCheckpoint(eager=True)
    )
    nodes = emb.select("vec_id", "embedding", "nrm")
    for _ in range(_BEAM_HOPS):
        cand = (
            beam.select("query_id", "vec_id")
            .union(
                F.broadcast(beam).join(edges, beam.vec_id == edges.src)
                .select("query_id", F.col("dst").alias("vec_id"))
            )
            .distinct()
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        beam = (
            F.broadcast(cand).join(nodes, "vec_id")
            .join(F.broadcast(q), "query_id")
            .select("query_id", "vec_id", qsim.alias("s"))
            .withColumn("rn", F.row_number().over(w_q))
            .filter(F.col("rn") <= _BEAM_W)
            .select("query_id", "vec_id", "s")
            .localCheckpoint(eager=True)
        )
    return (
        beam.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("s").alias("cos_sim"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


_RECALL_METHODS = ("binary", "graph", "ivf", "lsh", "pq")
_RECALL_SOURCES = {
    "binary": "embed_binary_hamming_topk",  # r10: the popcount lane
    "graph": "ann_graph_beam_topk",         # r12: HNSW-shape beam search
    "lsh": "ann_lsh_bucketed",
    "ivf": "ann_ivf_probed",
    "pq": "ann_pq_adc_rerank",
}
_RECALL_METHODS_SQL = ", ".join(f"'{m}'" for m in _RECALL_METHODS)


def _ann_recall_oracle() -> str:
    brute = _REG["ann_cosine_topk_bruteforce"].oracle
    approx_union = "\n      UNION ALL ".join(
        f"SELECT '{m}' AS method, query_id, neighbor_id"
        f" FROM ({_REG[q].oracle})"
        for m, q in _RECALL_SOURCES.items()
    )
    return f"""
    WITH exact_topk AS ({brute}),
    approx_topk AS (
      {approx_union}
    ),
    hits AS (
      SELECT a.method, e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM exact_topk e
      JOIN approx_topk a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY a.method, e.query_id
    ),
    ex AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM exact_topk GROUP BY query_id
    ),
    ap AS (
      SELECT method, query_id, CAST(COUNT(*) AS BIGINT) AS n_approx
      FROM approx_topk GROUP BY method, query_id
    ),
    m AS (SELECT unnest([{_RECALL_METHODS_SQL}]) AS method)
    SELECT m.method, ex.query_id, ex.n_exact,
           COALESCE(ap.n_approx, 0) AS n_approx,
           COALESCE(hits.n_hit, 0) AS n_hit,
           CAST(COALESCE(hits.n_hit, 0) AS DOUBLE)
             / CAST(ex.n_exact AS DOUBLE) AS recall
    FROM ex CROSS JOIN m
    LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.method = m.method
    LEFT JOIN hits ON hits.query_id = ex.query_id AND hits.method = m.method
    ORDER BY m.method, ex.query_id
    """


@query(
    "ann_recall_report",
    oracle=_ann_recall_oracle(),
    tags=("similarity", "ann", "quality"),
    doc="Recall@5 of all five approximate ANN scale paths (binary "
        "popcount (r10), LSH "
        "buckets, IVF probes, PQ ADC) against the exact brute-force "
        "baseline, per (method, query) — approximation quality as a "
        "first-class oracle-checked relation rather than a test-only "
        "assertion: the report an index-tuning loop reads before "
        "raising hyperplane bits / nprobe / codebook size. Composes "
        "the existing pipelines and joins their top-k sets on (query, "
        "neighbor); the extra cost over running the pipelines is "
        "method-keyed Q-sized aggregates and a Q*k equi-join.",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_ops import ann_cosine_topk_bruteforce

    # Each composed pipeline must execute ONCE (guide §2.4). The
    # five-way approx union stays lazy-overlapped but is referenced
    # ONCE (r15): n_approx and n_hit come from a single left join
    # against the exact set (count(*) vs count(match-marker) in one
    # grouped pass), so no ap subtree duplicates. The exact shortlist
    # IS checkpointed (Q x 5 rows, one small job) because it then
    # BROADCASTS into the hit probe as persisted rows — measured r15:
    # broadcasting the un-materialized brute subtree instead moved the
    # whole brute pipeline into the BroadcastExchange build (16.6-19.7s
    # vs 13.25s with the checkpoint; the r14 note about checkpoints
    # losing applied to checkpointing BOTH sides, which serialized the
    # five approx pipelines too).
    ex = ann_cosine_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)
    parts = []
    for m in _RECALL_METHODS:
        builder = _REG[_RECALL_SOURCES[m]].build
        parts.append(
            builder(spark, sf_dir).select(
                F.lit(m).alias("method"), "query_id", "neighbor_id"
            )
        )
    ap = parts[0]
    for p in parts[1:]:
        ap = ap.unionByName(p)
    per = (
        ap.join(
            F.broadcast(ex.withColumn("__e", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("method", "query_id")
        .agg(
            F.count("*").alias("n_approx"),
            F.count("__e").alias("n_hit"),
        )
    )
    n_ex = ex.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    methods = spark.createDataFrame(
        [(m,) for m in _RECALL_METHODS], "method string"
    )
    return (
        n_ex.crossJoin(F.broadcast(methods))
        .join(per, ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_approx"), F.lit(0)).alias("n_approx"),
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("method", "query_id")
    )


_RECALL_KS = (1, 3, 5)


def _recall_curve_oracle() -> str:
    brute = _REG["ann_cosine_topk_bruteforce"].oracle
    approx_union = "\n      UNION ALL ".join(
        f"SELECT '{m}' AS method, query_id, neighbor_id, rank"
        f" FROM ({_REG[q].oracle})"
        for m, q in _RECALL_SOURCES.items()
    )
    ks = ", ".join(str(k) for k in _RECALL_KS)
    return f"""
    WITH exact_topk AS ({brute}),
    approx_topk AS (
      {approx_union}
    ),
    ks AS (SELECT unnest([{ks}]) AS k),
    hits AS (
      SELECT a.method, ks.k, e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM exact_topk e
      JOIN approx_topk a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      CROSS JOIN ks
      WHERE e.rank <= ks.k AND a.rank <= ks.k
      GROUP BY a.method, ks.k, e.query_id
    ),
    ex AS (
      SELECT ks.k, query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM exact_topk CROSS JOIN ks WHERE rank <= ks.k
      GROUP BY ks.k, query_id
    ),
    m AS (SELECT unnest([{_RECALL_METHODS_SQL}]) AS method),
    per AS (
      SELECT m.method, ex.k, ex.query_id,
             CAST(round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
                        / CAST(ex.n_exact AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS r
      FROM ex CROSS JOIN m
      LEFT JOIN hits h ON h.query_id = ex.query_id AND h.k = ex.k
                      AND h.method = m.method
    )
    SELECT method, CAST(k AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_recall
    FROM per GROUP BY method, k ORDER BY method, k
    """


@query(
    "embed_recall_at_k_curve",
    oracle=_recall_curve_oracle(),
    tags=("similarity", "ann", "quality", "report"),
    doc="Recall@k CURVE (k = 1/3/5) of the five approximate ANN scale "
        "paths against the exact baseline — the depth axis "
        "ann_recall_report (recall@5 only) and ann_ivf_nprobe_sweep "
        "(the nprobe axis) do not measure: rank-1 recall is what a "
        "single-answer retrieval consumer experiences, rank-5 what a "
        "rerank stage sees, and the gap between them tells you whether "
        "an index loses the TOP answer or just the tail (the number "
        "that decides rerank depth). Sets truncate at rank <= k on "
        "BOTH sides; per-(method,k,query) recalls ride the 6-dp "
        "decimal lane before the cross-query mean. Scale: composes the "
        "already-bounded pipelines (constant Q); the added cost is a "
        "Q*k equi-join and method*k*Q aggregates.",
)
def embed_recall_at_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_ops import ann_cosine_topk_bruteforce

    # Same shape as ann_recall_report: ex/ap are Q x k-bounded; unlike
    # the report, ap here is ALREADY single-referenced (the curve has no
    # n_approx lane), so the report's left-join fusion has nothing to
    # dedup — r15 re-measured both an ex checkpoint and a broadcast
    # left-join variant and both lost to this lazy shape (the eager
    # checkpoint put the brute-force job on the critical path; r14's
    # A/B of checkpointing both sides lost the same way).
    ex = ann_cosine_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", "rank"
    )
    parts = []
    for m in _RECALL_METHODS:
        builder = _REG[_RECALL_SOURCES[m]].build
        parts.append(
            builder(spark, sf_dir).select(
                F.lit(m).alias("method"), "query_id", "neighbor_id", "rank"
            )
        )
    ap = parts[0]
    for p in parts[1:]:
        ap = ap.unionByName(p)
    ks = spark.createDataFrame([(k,) for k in _RECALL_KS], "k int")
    hits = (
        ex.withColumnRenamed("rank", "e_rank")
        .join(
            ap.withColumnRenamed("rank", "a_rank"),
            ["query_id", "neighbor_id"],
        )
        .crossJoin(F.broadcast(ks))
        .filter((F.col("e_rank") <= F.col("k"))
                & (F.col("a_rank") <= F.col("k")))
        .groupBy("method", "k", "query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_ex = (
        ex.crossJoin(F.broadcast(ks))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("k", "query_id")
        .agg(F.count("*").alias("n_exact"))
    )
    methods = spark.createDataFrame(
        [(m,) for m in _RECALL_METHODS], "method string"
    )
    per = (
        n_ex.crossJoin(F.broadcast(methods))
        .join(hits, ["method", "k", "query_id"], "left")
        .select(
            "method", "k",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double"), 6)
            .cast("decimal(18,6)").alias("r"),
        )
    )
    return (
        per.groupBy("method", "k")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(F.sum("r").cast("double") / F.count("*"), 6)
            .alias("mean_recall"),
        )
        .select("method", F.col("k").cast("int").alias("k"),
                "n_queries", "mean_recall")
        .orderBy("method", "k")
    )


_OUTLIER_STATS_SQL = f"""
      SELECT cell, COUNT(*) AS n_members,
             CAST(SUM({_DEC_SQL.format(x='c_sim')}) AS DOUBLE) / COUNT(*)
               AS mean_raw,
             sqrt(GREATEST(0,
               CAST(SUM({_DEC_SQL.format(x='c_sim * c_sim')}) AS DOUBLE)
                 / COUNT(*)
               - (CAST(SUM({_DEC_SQL.format(x='c_sim')}) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM({_DEC_SQL.format(x='c_sim')}) AS DOUBLE)
                    / COUNT(*)))) AS sd_raw
      FROM assign0 GROUP BY cell
"""


@query(
    "embed_centroid_outliers",
    oracle=f"""
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
      SELECT vec_id, cell, c_sim FROM (
        SELECT b.vec_id, s.cell,
               ({_DOT_SQL.format(a='b.embedding', b='s.c_emb')}
                / (b.nrm * {_NORM_SQL.format(a='s.c_emb')})) AS c_sim,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY ({_DOT_SQL.format(a='b.embedding', b='s.c_emb')}
                           / (b.nrm * {_NORM_SQL.format(a='s.c_emb')})) DESC,
                          s.cell) AS c_rank
        FROM base b CROSS JOIN seeds s
      ) WHERE c_rank = 1
    ),
    stats AS ({_OUTLIER_STATS_SQL}),
    worst AS (
      SELECT cell, vec_id, c_sim FROM (
        SELECT cell, vec_id, c_sim,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY c_sim, vec_id) AS rn
        FROM assign0
      ) WHERE rn = 1
    )
    SELECT s.cell,
           CAST(s.n_members AS BIGINT) AS n_members,
           round(s.mean_raw, 6) AS mean_sim,
           round(s.sd_raw, 6) AS sd_sim,
           CAST(SUM(CASE WHEN s.sd_raw > 0
                          AND a.c_sim < s.mean_raw - 2 * s.sd_raw
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(MAX(w.vec_id) AS BIGINT) AS worst_vec_id,
           round(MAX(w.c_sim), 6) AS worst_sim
    FROM assign0 a
    JOIN stats s USING (cell)
    JOIN worst w USING (cell)
    GROUP BY s.cell, s.n_members, s.mean_raw, s.sd_raw
    ORDER BY s.cell
    """,
    tags=("embedding", "outlier", "quality", "llm-pipeline"),
    doc="Embedding-space outlier detection for corpus cleaning (the "
        "centroid-distance complement of SemDeDup's near-dup pruning): "
        "every vector is assigned to its nearest seed centroid (the IVF "
        "seeding, broadcast cosine argmax), then each CELL reports its "
        "cohesion distribution (mean/sd of member-to-centroid cosine) "
        "and how many members sit more than 2 sigma BELOW the cell mean "
        "— mislabeled, corrupted, or off-distribution documents whose "
        "embedding lands far from every cluster core. worst_vec_id "
        "pinpoints the most alien member per cell (min c_sim, vec_id "
        "tiebreak). Determinism: c_sim is a sequential fold "
        "(bit-identical to DuckDB list_reduce), cell moments accumulate "
        "as exact 6-dp decimals, and the 2-sigma threshold compares "
        "unrounded doubles derived from those exact sums — identical on "
        "both engines. Scale: K centroids broadcast (K*dim doubles); "
        "assignment is map-side; the only exchange is the 16-key "
        "map-side-combinable cell aggregate plus a broadcast of the "
        "16-row stats back onto the assignment for the outlier count — "
        "the corpus never reshuffles.",
)
def embed_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .withColumn("nrm", _norm(F.col("embedding")))
    )
    seeds = _seed_centroids(emb)
    sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    a = _assign(emb.select("vec_id", "embedding", "nrm"), seeds, sim).select(
        "vec_id", "cell", "c_sim"
    )
    stats = (
        a.groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.expr(_DEC.format(x="c_sim"))).cast("double").alias("s1"),
            F.sum(F.round(F.col("c_sim") * F.col("c_sim"), 6)
                  .cast("decimal(18,6)")).cast("double").alias("s2"),
        )
    )
    mean = F.col("s1") / F.col("n_members")
    stats = stats.select(
        "cell",
        "n_members",
        mean.alias("mean_raw"),
        # mean*mean + clamp-at-0, not pow: see embed_dim_stats
        F.sqrt(
            F.greatest(F.lit(0.0), F.col("s2") / F.col("n_members") - mean * mean)
        ).alias("sd_raw"),
    )
    j = a.join(F.broadcast(stats), "cell")
    is_outlier = (F.col("sd_raw") > 0) & (
        F.col("c_sim") < F.col("mean_raw") - 2 * F.col("sd_raw")
    )
    return (
        j.groupBy("cell")
        .agg(
            F.max("n_members").cast("long").alias("n_members"),
            F.round(F.max("mean_raw"), 6).alias("mean_sim"),
            F.round(F.max("sd_raw"), 6).alias("sd_sim"),
            F.sum(F.when(is_outlier, 1).otherwise(0)).cast("long")
            .alias("n_outliers"),
            F.min(F.struct(F.col("c_sim").alias("s"),
                           F.col("vec_id").alias("v"))).alias("w"),
        )
        .select(
            "cell",
            "n_members",
            "mean_sim",
            "sd_sim",
            "n_outliers",
            F.col("w.v").cast("long").alias("worst_vec_id"),
            F.round(F.col("w.s"), 6).alias("worst_sim"),
        )
        .orderBy("cell")
    )


_PCA_V0 = 0.125  # deterministic start vector: all-ones / sqrt(64)


@query(
    "embed_pca_power_iteration",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, embedding,
             0.125 * list_reduce(list_transform(embedding,
                 c -> CAST(c AS DOUBLE)), (p, q) -> p + q) AS dot1
      FROM embeddings
    ),
    comps AS (
      SELECT x.vec_id, t.i AS dim,
             CAST(x.embedding[t.i] AS DOUBLE) AS comp, x.dot1
      FROM x, unnest(range(1, len(x.embedding) + 1)) AS t(i)
    ),
    y1 AS (
      SELECT dim,
             CAST(SUM({_DEC_SQL.format(x='comp * dot1')}) AS DOUBLE) AS y
      FROM comps GROUP BY dim
    ),
    n1 AS (
      SELECT sqrt(CAST(SUM({_DEC_SQL.format(x='y * y')}) AS DOUBLE)) AS nrm
      FROM y1
    ),
    v1 AS (SELECT dim, y / nrm AS v FROM y1, n1),
    dot2 AS (
      SELECT c.vec_id,
             CAST(SUM({_DEC_SQL.format(x='c.comp * v1.v')}) AS DOUBLE) AS d2
      FROM comps c JOIN v1 ON c.dim = v1.dim
      GROUP BY c.vec_id
    ),
    y2 AS (
      SELECT c.dim,
             CAST(SUM({_DEC_SQL.format(x='c.comp * dot2.d2')}) AS DOUBLE) AS y
      FROM comps c JOIN dot2 ON c.vec_id = dot2.vec_id
      GROUP BY c.dim
    ),
    n2 AS (
      SELECT sqrt(CAST(SUM({_DEC_SQL.format(x='y * y')}) AS DOUBLE)) AS nrm
      FROM y2
    ),
    lam AS (
      SELECT CAST(SUM({_DEC_SQL.format(x='v1.v * y2.y')}) AS DOUBLE) AS lam
      FROM v1 JOIN y2 ON v1.dim = y2.dim
    )
    SELECT CAST(y2.dim - 1 AS INT) AS dim,
           round(y2.y / n2.nrm, 6) AS loading,
           round(lam.lam, 4) AS eigenvalue_est
    FROM y2, n2, lam
    ORDER BY dim
    """,
    tags=("embedding", "pca", "iterative", "llm-pipeline"),
    doc="Top principal direction of the (uncentered) embedding matrix by "
        "TWO unrolled power-iteration rounds — the whitening/PCA "
        "preprocessing pass an embedding pipeline runs before "
        "quantization or decorrelation, expressed declaratively so "
        "Catalyst plans each round (the kmeans/components pattern: "
        "iterative algorithm, DataFrame body). Round k is "
        "matvec-matvec: per-vector dot with the current direction "
        "(round 1's start vector is the literal all-ones/8, so the dot "
        "is a bit-identical sequential fold; round 2's is a 64-term "
        "decimal-lane sum), then the new direction accumulates "
        "SUM(decimal(comp * dot)) per dimension — every cross-row sum "
        "is exact 6-dp decimals, so partition order never moves a bit "
        "and DuckDB replays the doubles identically. eigenvalue_est is "
        "the Rayleigh quotient v1'(X'X)v1 (v1 unit). Scale: each round "
        "is one posexplode -> 64-key map-side-combinable hash "
        "aggregate plus a per-vector aggregate keyed by vec_id; the "
        "direction relations are 64 rows (broadcast); the matrix "
        "streams, never collects.",
)
def embed_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    dot1 = (
        F.lit(_PCA_V0)
        * F.aggregate(
            F.transform("embedding", lambda c: c.cast("double")),
            F.lit(0.0),
            lambda acc, c: acc + c,
        )
    ).alias("dot1")
    x = emb.select("vec_id", "embedding", dot1)
    # comps (the exploded component relation) feeds THREE consumers
    # (y1, dot2, y2) and v1 two (dot2, lam) — materialize so the scan +
    # posexplode runs once per query, not per power-iteration reference
    # (guide §2.4).
    comps = x.select(
        "vec_id",
        "dot1",
        F.posexplode("embedding").alias("dim0", "comp0"),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("comp0").cast("double").alias("comp"),
        "dot1",
    ).localCheckpoint(eager=True)
    y1 = comps.groupBy("dim").agg(
        F.sum(F.expr(_DEC.format(x="comp * dot1"))).cast("double").alias("y")
    )
    n1 = y1.agg(
        F.sqrt(F.sum(F.expr(_DEC.format(x="y * y"))).cast("double")).alias("nrm")
    )
    v1 = y1.crossJoin(F.broadcast(n1)).select(
        "dim", (F.col("y") / F.col("nrm")).alias("v")
    ).localCheckpoint(eager=True)  # dim rows; feeds dot2 + lam
    dot2 = (
        comps.join(F.broadcast(v1), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.expr(_DEC.format(x="comp * v"))).cast("double").alias("d2"))
    )
    y2 = (
        comps.join(dot2, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.expr(_DEC.format(x="comp * d2"))).cast("double").alias("y"))
        .localCheckpoint(eager=True)  # dim rows; feeds n2 + lam + output
    )
    n2 = y2.agg(
        F.sqrt(F.sum(F.expr(_DEC.format(x="y * y"))).cast("double")).alias("nrm")
    )
    lam = (
        v1.join(y2, "dim")
        .agg(F.sum(F.expr(_DEC.format(x="v * y"))).cast("double").alias("lam"))
    )
    return (
        y2.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(lam))
        .select(
            (F.col("dim") - 1).cast("int").alias("dim"),
            F.round(F.col("y") / F.col("nrm"), 6).alias("loading"),
            F.round("lam", 4).alias("eigenvalue_est"),
        )
        .orderBy("dim")
    )


@query(
    "embed_pair_sim_histogram",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding, {_NORM_SQL.format(a='embedding')} AS nrm
      FROM embeddings
    ),
    centroids AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, embedding, nrm, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY ({_DOT_SQL.format(a='embedding', b='c_emb')}
                         / (nrm * {_NORM_SQL.format(a='c_emb')})) DESC,
                        cell) AS c_rank
      FROM base CROSS JOIN centroids
    ),
    members AS (SELECT vec_id, embedding, nrm, cell
                FROM assign WHERE c_rank = 1),
    pair_sims AS (
      SELECT ({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
              / (a.nrm * b.nrm)) AS sim
      FROM members a JOIN members b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT CAST(FLOOR(sim * 10) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(MIN(sim), 6) AS min_sim,
           round(MAX(sim), 6) AS max_sim
    FROM pair_sims
    GROUP BY 1 ORDER BY bucket
    """,
    tags=("embedding", "dedup", "calibration", "report"),
    doc="Cell-local pairwise-cosine histogram (0.1-wide buckets): the "
        "calibration curve read BEFORE choosing SemDeDup's tau — where "
        "the within-cell similarity mass sits tells you whether a "
        "threshold prunes near-dups or decimates the corpus. Reuses "
        "dedup_semdedup_dropped's exact cell blocking (deterministic "
        "16-cell seeding + the shared map-side max-struct assignment), "
        "so the histogram describes precisely the pair population that "
        "query thresholds. Bucket edges are floor(sim*10) on "
        "bit-identical doubles (sequential-fold dot product) — same "
        "bucket on both engines. Pair volume is the cell-bounded "
        "candidate set, never all-pairs; the histogram is one hash "
        "aggregate over it.",
)
def embed_pair_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.blocking import with_sub_block

    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    members = _assign(
        emb.select("vec_id", "embedding", "nrm"),
        _seed_centroids(emb),
        _dot(F.col("embedding"), F.col("c_emb"))
        / (F.col("nrm") * _norm(F.col("c_emb"))),
    ).select("vec_id", "embedding", "nrm", "cell")
    # Same occupancy guard as dedup_semdedup_dropped: fixed 16 cells mean
    # per-cell membership grows with N and the pair join O(n^2/C) — the
    # first 10x sweep measured 13.1x without the guard. Sub-blocks split
    # cells past 500 members (inactive at driver/bench scale, so the
    # oracle stays exact; the histogram becomes within-sub-block at
    # probe scale, the same recall trade SemDeDup accepts).
    # Materialized before the self-join — both kernel sides would
    # otherwise re-execute the scan + broadcast-argmax (guide §2.4).
    members = with_sub_block(
        members, label_col="cell", label_cap=500
    ).localCheckpoint(eager=True)
    a, b = members.alias("a"), members.alias("b")
    sim = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(sim.alias("sim"))
        .groupBy(F.floor(F.col("sim") * 10).cast("int").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.min("sim"), 6).alias("min_sim"),
            F.round(F.max("sim"), 6).alias("max_sim"),
        )
        .orderBy("bucket")
    )


@query(
    "embed_whitening_check",
    oracle=None,  # composed below from the embed_dim_stats oracle
    tags=("embedding", "whitening", "validation"),
    doc="Whitening transform + self-check: standardize every embedding "
        "component with the per-dimension mean/std that embed_dim_stats "
        "calibrates (the 6-dp ROUNDED stats, so both engines whiten "
        "with bit-identical parameters), then re-measure the "
        "post-transform moments — post_mean ~ 0 and post_std ~ 1 up to "
        "the rounding lanes prove the transform applied correctly "
        "corpus-wide. This is the validation pass a feature pipeline "
        "runs after normalizing embeddings for cosine/PQ stages. Two "
        "corpus explode passes keyed by dim (64-row exchanges, map-side "
        "combinable); the 64-row stats relation attaches by broadcast; "
        "zero-variance dimensions are excluded on both engines.",
)
def embed_whitening_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    stats = embed_dim_stats(spark, sf_dir).select("dim", "mean", "std")
    comps = emb.select(F.posexplode("embedding").alias("dim", "v"))
    w = (F.col("v").cast("double") - F.col("mean")) / F.col("std")
    wz = (
        comps.join(F.broadcast(stats), "dim")
        .filter(F.col("std") > 0)
        .select(
            "dim",
            F.round(w, 6).cast("decimal(18,6)").alias("w"),
            F.round(w * w, 6).cast("decimal(18,6)").alias("w2"),
        )
    )
    pm = F.col("s1").cast("double") / F.col("n")
    return (
        wz.groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("w").alias("s1"),
            F.sum("w2").alias("s2"),
        )
        .select(
            "dim", "n",
            # + 0.0 collapses IEEE negative zero: DuckDB's round keeps
            # -0.0 for tiny negative means, Spark's does not, and the
            # canonical value hash distinguishes them (caught at
            # sf0.001; sf0.01 happened to agree).
            (F.round(pm, 6) + F.lit(0.0)).alias("post_mean"),
            F.round(
                F.sqrt(F.greatest(
                    F.lit(0.0),
                    F.col("s2").cast("double") / F.col("n") - pm * pm,
                )), 6,
            ).alias("post_std"),
        )
        .orderBy("dim")
    )


def _install_whitening_oracle() -> None:
    """Compose the whitening oracle from the REGISTERED embed_dim_stats
    oracle verbatim, so the whitening parameters (6-dp rounded mean/std)
    are bit-identical to what the Spark side joins in."""
    from dataclasses import replace

    stats = _REG["embed_dim_stats"].oracle
    z = "(CAST(e.embedding[t.i] AS DOUBLE) - s.mean) / s.std"
    oracle = f"""
    WITH stats AS MATERIALIZED ({stats}),
    wz AS (
      SELECT t.i - 1 AS dim,
             {_DEC_SQL.format(x=z)} AS w,
             {_DEC_SQL.format(x=f'({z}) * ({z})')} AS w2
      FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
      JOIN stats s ON s.dim = t.i - 1
      WHERE s.std > 0
    )
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) + 0.0 AS post_mean,
           round(sqrt(GREATEST(0, CAST(SUM(w2) AS DOUBLE) / COUNT(*)
             - (CAST(SUM(w) AS DOUBLE) / COUNT(*))
             * (CAST(SUM(w) AS DOUBLE) / COUNT(*)))), 6) AS post_std
    FROM wz GROUP BY dim ORDER BY dim
    """
    _REG["embed_whitening_check"] = replace(
        _REG["embed_whitening_check"], oracle=oracle
    )


_install_whitening_oracle()


_NPROBE_SWEEP = (1, 2, 4)


@query(
    "ann_ivf_nprobe_sweep",
    oracle=None,  # composed below from the brute-force + IVF oracles
    tags=("similarity", "ann", "ivf", "calibration", "report"),
    doc="IVF nprobe TUNING CURVE: recall@5 vs the exact brute-force "
        "baseline at nprobe = 1, 2, 4 probed cells (of 16) — the "
        "accuracy knob an ANN deployment turns, measured as data "
        "instead of guessed. Complements ann_recall_report (which "
        "compares METHODS at fixed settings) by sweeping the one "
        "parameter of the winning scale path; reading the curve tells "
        "you the cheapest nprobe that clears your recall target. "
        "Per-query recalls go through the 6-dp decimal lane before the "
        "cross-row mean. Cost: the exact baseline plus three probe "
        "joins, each touching ~nprobe/16 of the index — the sweep IS "
        "the measurement, same adjudication as ann_recall_report.",
)
def ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_ops import _ivf_topk, ann_cosine_topk_bruteforce

    ex = ann_cosine_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    parts = [
        _ivf_topk(spark, sf_dir, n_probe=p).select(
            F.lit(p).cast("int").alias("nprobe"), "query_id", "neighbor_id"
        )
        for p in _NPROBE_SWEEP
    ]
    ap = parts[0]
    for p_ in parts[1:]:
        ap = ap.unionByName(p_)
    hits = (
        ex.join(ap, ["query_id", "neighbor_id"])
        .groupBy("nprobe", "query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_ex = ex.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    probes = spark.createDataFrame(
        [(p,) for p in _NPROBE_SWEEP], "nprobe int"
    )
    per = (
        n_ex.crossJoin(F.broadcast(probes))
        .join(hits, ["nprobe", "query_id"], "left")
        .select(
            "nprobe",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact"), 6)
            .cast("decimal(18,6)").alias("r"),
        )
    )
    return (
        per.groupBy("nprobe")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(F.sum("r").cast("double") / F.count("*"), 6)
            .alias("mean_recall"),
        )
        .orderBy("nprobe")
    )


def _install_nprobe_sweep_oracle() -> None:
    from dataclasses import replace

    from .llm_ops import _ann_ivf_oracle

    ex = _REG["ann_cosine_topk_bruteforce"].oracle
    ivf = {p: _ann_ivf_oracle(n_probe=p) for p in _NPROBE_SWEEP}
    ap_union = "\n      UNION ALL\n      ".join(
        f"SELECT {p} AS nprobe, query_id, neighbor_id FROM i{p}"
        for p in _NPROBE_SWEEP
    )
    oracle = f"""
    WITH ex AS MATERIALIZED ({ex}),
    {", ".join(f"i{p} AS MATERIALIZED ({sql})" for p, sql in ivf.items())},
    ap AS (
      {ap_union}
    ),
    hits AS (
      SELECT a.nprobe, a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM ap a JOIN ex e
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY 1, 2
    ),
    nq AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM ex GROUP BY 1
    ),
    per AS (
      SELECT p.nprobe, q.query_id,
             CAST(round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / q.n_exact, 6)
                  AS DECIMAL(18,6)) AS r
      FROM nq q
      CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _NPROBE_SWEEP)}])
                         AS nprobe) p
      LEFT JOIN hits h ON h.nprobe = p.nprobe AND h.query_id = q.query_id
    )
    SELECT CAST(nprobe AS INT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_recall
    FROM per GROUP BY nprobe ORDER BY nprobe
    """
    _REG["ann_ivf_nprobe_sweep"] = replace(
        _REG["ann_ivf_nprobe_sweep"], oracle=oracle
    )


_install_nprobe_sweep_oracle()


@query(
    "embed_label_purity",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding, label,
             {_NORM_SQL.format(a='embedding')} AS nrm
      FROM embeddings
    ),
    centroids AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, label, cell FROM (
        SELECT b.vec_id, b.label, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY ({_DOT_SQL.format(a='b.embedding', b='c.c_emb')}
                           / (b.nrm * {_NORM_SQL.format(a='c.c_emb')})) DESC,
                          c.cell) AS c_rank
        FROM base b CROSS JOIN centroids c
      ) WHERE c_rank = 1
    ),
    lc AS (
      SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS c
      FROM assign GROUP BY 1, 2
    ),
    best AS (
      SELECT cell, CAST(SUM(c) AS BIGINT) AS n_members,
             CAST(MAX(1000000 * c + (999999 - label)) AS BIGINT) AS packed,
             CAST(COUNT(*) AS BIGINT) AS n_labels
      FROM lc GROUP BY cell
    )
    SELECT CAST(cell AS INT) AS cell, n_members, n_labels,
           CAST(packed // 1000000 AS BIGINT) AS majority_count,
           CAST(999999 - packed % 1000000 AS INT) AS majority_label,
           round(CAST(packed // 1000000 AS DOUBLE) / n_members, 6) AS purity
    FROM best
    ORDER BY cell
    """,
    tags=("embedding", "clustering", "validation", "report"),
    doc="Cluster-label PURITY: assign every vector to its nearest seed "
        "centroid (the shared IVF/SemDeDup assignment), then score each "
        "cell against the ground-truth label column — majority label, "
        "its count, and purity = majority/members. The external "
        "clustering-quality check (a purity near 1/|labels| means the "
        "embedding space ignores the labels; near 1.0 means cells "
        "recover them) run before trusting cell-based dedup or IVF "
        "routing. Majority selection is the argmax-with-tiebreak trick "
        "packed into ONE integer aggregate (max of 1e6*count + (999999 - label): "
        "highest count wins, lowest label on ties — no second window): "
        "map-side combinable end to end, 16-key exchanges only.",
)
def embed_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    seeds = _seed_centroids(emb)
    sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    # _assign carries (vec_id, embedding, nrm); re-attach the label by
    # vec_id after assignment (broadcast-sized at fixture scale, plain
    # hash join at 100 TB — high-cardinality key either way)
    assigned = _assign(emb.select("vec_id", "embedding", "nrm"), seeds, sim)
    lc = (
        assigned.select("vec_id", "cell")
        .join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cell", "label")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # packed argmax: 1e6*count + (999999 - label) — highest count wins,
    # lowest label on ties; decode by divmod (labels are small non-neg ints)
    packed = F.max(F.lit(1000000) * F.col("c") + (F.lit(999999) - F.col("label")))
    best = lc.groupBy("cell").agg(
        F.sum("c").cast("long").alias("n_members"),
        packed.alias("packed"),
        F.count("*").cast("long").alias("n_labels"),
    )
    maj_label = F.lit(999999) - F.col("packed") % 1000000
    maj_count = F.expr("packed div 1000000")
    return best.select(
        F.col("cell").cast("int").alias("cell"),
        "n_members",
        "n_labels",
        maj_count.cast("long").alias("majority_count"),
        maj_label.cast("int").alias("majority_label"),
        F.round(maj_count.cast("double") / F.col("n_members"), 6)
        .alias("purity"),
    ).orderBy("cell")


# Guard band for per-partition shortlist selection (see
# _shortlist_candidates): must exceed the 1e-4 round-4dp quantum plus
# any numpy-BLAS-vs-sequential-fold float drift (~1e-12).
_SHORTLIST_GUARD = 2e-4


def _shortlist_candidates(
    spark: SparkSession,
    base: DataFrame,
    *,
    k: int,
    exclude: str,
) -> DataFrame:
    """Per-partition guarded top-k candidate generator — the
    ``ann_topk_int8_rerank`` shortlist shape (r4) applied to exact
    float scoring (VERDICT r7 item 2). Each Arrow batch is scored
    against the broadcast query matrix with ONE float64 matmul and
    emits only the rows that could still reach the global top-``k``
    under the rounded-4dp + neighbor-id total order: everything with
    score >= (batch k-th best - _SHORTLIST_GUARD).

    Why this is exact, not approximate: if a candidate X falls below
    the guard, its batch holds >= k candidates scoring >= X + 2e-4;
    with numpy-vs-sequential-fold drift <= ~1e-12, their true scores
    exceed X's by > 1e-4, hence their ROUNDED scores strictly exceed
    X's — X cannot be in the global top-k. Conversely any rounded-tie
    contender sits within 1e-4 (< guard) of the batch leader and is
    kept. So the union of per-batch shortlists contains the global
    top-k, and the exact Spark-side rescore (sequential-fold cosine,
    round 4, id tie-break) re-ranks only partitions*Q*(k+tail) rows —
    the Q*N window exchange is gone.

    ``exclude``: "self" masks neighbor_id == query_id (ANN recall),
    "label" masks neighbor_label == query_label (hard negatives).
    ``base`` must carry vec_id + embedding (+ label when needed); the
    query set is the vec_id % 100 == 0 slice CAPPED at Q_MAX (VERDICT
    r8 item 1): the slice alone is 1% of N, so the collect + broadcast
    below would grow linearly with the table — orderBy + limit makes
    the driver matrix a constant no matter how big N gets, matching
    the ann_topk_vectorized / ann_topk_int8_rerank policy. Every
    consumer's Spark q set and DuckDB oracle apply the identical cap.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .llm_ops import Q_MAX

    qrows = (
        base.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(Q_MAX)
        .collect()
    )
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    q_mat = (
        np.array([list(r.embedding) for r in qrows], dtype=np.float64)
        if qrows else np.zeros((0, 1))
    )
    q_lbl = (
        np.array([r.label for r in qrows], dtype=np.int64)
        if exclude == "label" else None
    )
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, q_lbl))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm, qn, ql = bc.value
        if not len(ids):
            return
        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]
            if pdf.empty:
                continue
            cm = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            cn = np.sqrt((cm * cm).sum(axis=1))
            sims = (qm @ cm.T) / (qn[:, None] * cn[None, :])
            cid = pdf["vec_id"].to_numpy()
            if ql is not None:
                mask = ql[:, None] == pdf["label"].to_numpy()[None, :]
            else:
                mask = ids[:, None] == cid[None, :]
            sims = np.where(mask, -np.inf, sims)
            b = sims.shape[1]
            kk = min(k, b)
            thr = (
                np.partition(sims, b - kk, axis=1)[:, b - kk]
                - _SHORTLIST_GUARD
            )
            qi, ci = np.nonzero(
                (sims >= thr[:, None]) & np.isfinite(sims)
            )
            yield pd.DataFrame(
                {"query_id": ids[qi], "neighbor_id": cid[ci]}
            )

    shards = base
    parallelism = spark.sparkContext.defaultParallelism
    if shards.rdd.getNumPartitions() < parallelism:
        shards = shards.repartition(parallelism)
    return shards.mapInPandas(gen, "query_id long, neighbor_id long")


# Matryoshka truncation sweep: leading-dim prefixes evaluated for recall.
_MRL_DIMS = (16, 32)


def _mrl_trunc_sql(d: int) -> str:
    from .llm_ops import _cosine_sql

    cos = _cosine_sql(f"q.embedding[1:{d}]", f"e.embedding[1:{d}]")
    return f"""
      SELECT {d} AS trunc_dim, query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY round({cos}, 4) DESC, e.vec_id) AS rn
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT {_Q_MAX}) q
        JOIN embeddings e ON e.vec_id <> q.vec_id
      ) WHERE rn <= 5"""


def _install_matryoshka_oracle() -> None:
    from dataclasses import replace

    ex = _REG["ann_cosine_topk_bruteforce"].oracle
    tr_union = "\n      UNION ALL\n      ".join(
        _mrl_trunc_sql(d) for d in _MRL_DIMS
    )
    dims_list = ", ".join(str(d) for d in _MRL_DIMS)
    oracle = f"""
    WITH ex AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM ({ex})
    ),
    tr AS MATERIALIZED (
      {tr_union}
    ),
    hits AS (
      SELECT t.trunc_dim, t.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM tr t JOIN ex ON ex.query_id = t.query_id
                       AND ex.neighbor_id = t.neighbor_id
      GROUP BY t.trunc_dim, t.query_id
    ),
    nex AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM ex GROUP BY query_id
    ),
    per AS (
      SELECT d.trunc_dim,
             CAST(round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
                        / CAST(nex.n_exact AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS r
      FROM nex CROSS JOIN (SELECT unnest([{dims_list}]) AS trunc_dim) d
      LEFT JOIN hits h ON h.trunc_dim = d.trunc_dim
                      AND h.query_id = nex.query_id
    )
    SELECT CAST(trunc_dim AS INTEGER) AS trunc_dim,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_recall
    FROM per GROUP BY trunc_dim ORDER BY trunc_dim
    """
    _REG["embed_matryoshka_recall"] = replace(
        _REG["embed_matryoshka_recall"], oracle=oracle
    )


@query(
    "embed_matryoshka_recall",
    oracle=None,  # composed below from the brute-force oracle
    tags=("similarity", "embedding", "calibration", "report"),
    doc="Matryoshka truncation quality curve (Kusupati et al. 2022 "
        "MRL): recall@5 of cosine top-5 computed on the LEADING 16 and "
        "32 of 64 dimensions vs the full-dimension exact baseline, for "
        "the bounded vec_id%100 query set. MRL-trained embedding stacks "
        "serve truncated prefixes to cut index memory/bandwidth 2-4x; "
        "this report measures what that costs in retrieval quality as "
        "data, the same adjudication discipline as ann_recall_report "
        "and ann_ivf_nprobe_sweep. Per-query recalls go through the "
        "6-dp decimal lane before the cross-row mean; ranks tiebreak "
        "on rounded similarity + neighbor id in both engines. Cost "
        "(r8 reshape): each truncation runs the guarded per-partition "
        "shortlist (one matmul per Arrow batch, exchange carries "
        "partitions*Q*(5+tail) rows — the Q*N ranking window is gone) "
        "plus the exact rescore; only the shared exact baseline keeps "
        "the allowlisted brute-force shape.",
)
def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_ops import ann_cosine_topk_bruteforce

    ex = ann_cosine_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )

    emb = load_table(spark, "embeddings", sf_dir)

    def trunc_topk(d: int) -> DataFrame:
        # Stage 1: guarded per-partition shortlist on the truncated
        # prefix (no Q*N window exchange — VERDICT r7 item 2); stage 2:
        # exact sequential-fold rescore of the Q*(5+tail) survivors.
        sl = lambda c: F.slice(c, 1, d)  # noqa: E731
        base = emb.select("vec_id", sl(F.col("embedding")).alias("embedding"))
        cand = _shortlist_candidates(spark, base, k=5, exclude="self")
        e = base.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("e_emb"),
        ).withColumn("e_nrm", _norm(F.col("e_emb")))
        q = (
            base.filter(F.col("vec_id") % 100 == 0)
            .orderBy("vec_id")
            .limit(_Q_MAX)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
            )
            .withColumn("q_nrm", _norm(F.col("q_emb")))
        )
        sim = _dot(F.col("q_emb"), F.col("e_emb")) \
            / (F.col("q_nrm") * F.col("e_nrm"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            F.broadcast(cand)
            .join(F.broadcast(q), "query_id")
            .join(e, "neighbor_id")
            .select("query_id", "neighbor_id",
                    F.round(sim, 4).alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select(F.lit(d).cast("int").alias("trunc_dim"),
                    "query_id", "neighbor_id")
        )

    tr = trunc_topk(_MRL_DIMS[0])
    for d in _MRL_DIMS[1:]:
        tr = tr.unionByName(trunc_topk(d))

    hits = (
        tr.join(ex, ["query_id", "neighbor_id"])
        .groupBy("trunc_dim", "query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_ex = ex.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    dims = spark.createDataFrame([(d,) for d in _MRL_DIMS], "trunc_dim int")
    per = (
        n_ex.crossJoin(F.broadcast(dims))
        .join(hits, ["trunc_dim", "query_id"], "left")
        .select(
            "trunc_dim",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact"), 6)
            .cast("decimal(18,6)").alias("r"),
        )
    )
    return (
        per.groupBy("trunc_dim")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(F.sum("r").cast("double") / F.count("*"), 6)
            .alias("mean_recall"),
        )
        .orderBy("trunc_dim")
    )


_install_matryoshka_oracle()


@query(
    "embed_hard_negatives",
    oracle="",  # installed below (needs _cosine_sql)
    tags=("embedding", "similarity", "training", "llm-pipeline"),
    doc="Hard-negative mining for retrieval/embedding training (the "
        "standard contrastive-training data op — e.g. DPR/Contriever "
        "negative selection): for each query vector (the bounded "
        "vec_id % 100 == 0 set shared with the ANN family) the top-5 "
        "most-cosine-similar vectors whose ground-truth LABEL differs "
        "from the query's — similar-but-wrong examples, exactly what a "
        "contrastive loss needs. Selection and ranking happen in the "
        "rounded-4dp domain with an id tie-break, the established "
        "cross-engine total order. Scale (r8 reshape, VERDICT item 2): "
        "stage 1 scores each Arrow batch against the broadcast query "
        "matrix with one float64 matmul (label mask fused) and keeps "
        "only the guarded per-partition top-5 shortlist — the "
        "ann_topk_int8_rerank shape — so the only exchange carries "
        "partitions*Q*(5+tail) rows, never Q*N; stage 2 re-ranks the "
        "shortlist with the exact sequential-fold cosine. An IVF/LSH "
        "candidate generator still composes in front when N' grows.",
)
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cand = _shortlist_candidates(
        spark, emb.select("vec_id", "embedding", "label"),
        k=5, exclude="label",
    )
    full = emb.withColumn("nrm", _norm(F.col("embedding")))
    q = (
        full.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(_Q_MAX)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    e = full.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("e_emb"),
        F.col("nrm").alias("e_nrm"),
    )
    sim = _dot(F.col("q_emb"), F.col("e_emb")) / (
        F.col("q_nrm") * F.col("e_nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(cand)
        .join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            F.round(sim, 4).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "cos_sim", F.col("rank").cast("int").alias("rank"),
        )
    )


def _install_hard_negatives_oracle() -> None:
    from dataclasses import replace

    from .llm_ops import _cosine_sql
    from .registry import QUERIES as _Q

    sql = f"""
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT {_Q_MAX}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             e.vec_id AS neighbor_id, e.label AS neighbor_label,
             round({_cosine_sql('q.embedding', 'e.embedding')}, 4) AS cos_sim
      FROM q JOIN embeddings e ON e.label <> q.label
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """
    _Q["embed_hard_negatives"] = replace(
        _Q["embed_hard_negatives"], oracle=sql
    )


_install_hard_negatives_oracle()


_SILHOUETTE_ORACLE = f"""
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
    sims AS (
      SELECT b.vec_id, s.cell,
             ({_DOT_SQL.format(a='b.embedding', b='s.c_emb')}
              / (b.nrm * {_NORM_SQL.format(a='s.c_emb')})) AS c_sim,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY ({_DOT_SQL.format(a='b.embedding', b='s.c_emb')}
                         / (b.nrm * {_NORM_SQL.format(a='s.c_emb')})) DESC,
                        s.cell) AS rnk
      FROM base b CROSS JOIN seeds s
    ),
    t AS (
      SELECT vec_id,
             MAX(CASE WHEN rnk = 1 THEN cell END) AS cell,
             MAX(CASE WHEN rnk = 1 THEN c_sim END) AS s1,
             MAX(CASE WHEN rnk = 2 THEN c_sim END) AS s2
      FROM sims WHERE rnk <= 2 GROUP BY vec_id
    ),
    sil AS (
      SELECT cell,
             CASE WHEN GREATEST(1.0 - s1, 1.0 - s2) <= 0 THEN 0.0
                  ELSE ((1.0 - s2) - (1.0 - s1))
                       / GREATEST(1.0 - s1, 1.0 - s2) END AS sil
      FROM t
    )
    SELECT CAST(cell AS INT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           round(CAST(SUM({_DEC_SQL.format(x='sil')}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_silhouette
    FROM sil GROUP BY cell ORDER BY cell
    """


@query(
    "embed_silhouette_approx",
    oracle=_SILHOUETTE_ORACLE,
    tags=("embedding", "clustering", "evaluation"),
    doc="Simplified (centroid-based) silhouette over the shared IVF seed "
        "centroids — the INTERNAL clustering-quality check pairing "
        "embed_label_purity's external one: per vector, a = cosine "
        "distance to its assigned (nearest) centroid, b = distance to "
        "the runner-up, s = (b - a) / max(a, b); reported as per-cell "
        "means. Low mean silhouette marks cells whose members sit on "
        "cluster boundaries — exactly where IVF probing loses recall "
        "and cell-local semantic dedup over-merges, so this relation "
        "decides nprobe and cell-count tuning from data. The top-2 "
        "similarities come from ONE bounded sort per vector (16 structs "
        "collected map-side, never a window over the N x K cross), and "
        "the arithmetic mirrors the oracle expression tree literally so "
        "IEEE division bits agree. Scale: one broadcast of K centroids, "
        "one map-side-combinable aggregate keyed by vec_id, one K-row "
        "final aggregate — the same two-exchange shape as "
        "embed_kmeans_lloyd's assignment pass.",
)
def embed_silhouette_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    seeds = _seed_centroids(emb).withColumn("c_nrm", _norm(F.col("c_emb")))
    d = (
        emb.select("vec_id", "embedding", "nrm")
        .crossJoin(F.broadcast(seeds))
        .withColumn(
            "c_sim",
            _dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("nrm") * F.col("c_nrm")),
        )
    )
    top2 = d.groupBy("vec_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("c_sim").alias("s"),
                        (-F.col("cell")).alias("neg_cell"),
                    )
                ),
                asc=False,
            ),
            1, 2,
        ).alias("t2")
    )
    s1 = F.col("t2")[0]["s"]
    s2 = F.col("t2")[1]["s"]
    a = F.lit(1.0) - s1
    b = F.lit(1.0) - s2
    sil = F.when(F.greatest(a, b) <= 0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    per = top2.select(
        (-F.col("t2")[0]["neg_cell"]).cast("int").alias("cell"),
        sil.alias("sil"),
    )
    return (
        per.groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(
                F.sum(F.expr(_DEC.format(x="sil"))).cast("double")
                / F.count("*"), 6
            ).alias("mean_silhouette"),
        )
        .orderBy("cell")
    )


def _install_knn_consistency_oracle() -> None:
    from dataclasses import replace

    from .llm_ops import _cosine_sql
    from .registry import QUERIES as _Q

    sql = f"""
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT {_Q_MAX}),
    topk AS (
      SELECT query_id, query_label, neighbor_label FROM (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               e.label AS neighbor_label,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({_cosine_sql('q.embedding', 'e.embedding')},
                                4) DESC, e.vec_id) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
      ) WHERE rn <= 5
    )
    SELECT query_id, CAST(query_label AS INT) AS query_label,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(SUM(CASE WHEN neighbor_label = query_label
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
           round(CAST(SUM(CASE WHEN neighbor_label = query_label
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS consistency
    FROM topk GROUP BY query_id, query_label ORDER BY query_id
    """
    _Q["embed_knn_label_consistency"] = replace(
        _Q["embed_knn_label_consistency"], oracle=sql
    )


@query(
    "embed_knn_label_consistency",
    oracle="",  # installed below (needs _cosine_sql)
    tags=("embedding", "similarity", "quality", "report"),
    doc="kNN label-consistency audit — the embedding-space label-noise "
        "estimate run before trusting labels for hard-negative mining "
        "or cell-purity routing (the k-NN agreement check behind "
        "confident-learning-style noise detection): for each bounded "
        "query vector (the shared vec_id % 100 == 0 set), the fraction "
        "of its cosine top-5 neighbors sharing the query's ground-truth "
        "label. Low consistency rows are mislabeled-or-boundary points; "
        "the per-query relation (not a scalar) is what a relabeling "
        "pass consumes. Ranking is the established rounded-4dp + id "
        "total order. Scale (r8 shape): the guarded per-partition "
        "shortlist (one matmul per Arrow batch, exchange carries "
        "partitions*Q*(5+tail) rows) feeds the exact sequential-fold "
        "rescore — same plan as embed_hard_negatives, no Q*N window.",
)
def embed_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cand = _shortlist_candidates(
        spark, emb.select("vec_id", "embedding"), k=5, exclude="self",
    )
    full = emb.withColumn("nrm", _norm(F.col("embedding")))
    q = (
        full.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(_Q_MAX)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    e = full.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("e_emb"),
        F.col("nrm").alias("e_nrm"),
    )
    sim = _dot(F.col("q_emb"), F.col("e_emb")) / (
        F.col("q_nrm") * F.col("e_nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    topk = (
        F.broadcast(cand)
        .join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .select(
            "query_id", "query_label", "neighbor_label",
            F.round(sim, 4).alias("cos_sim"), "neighbor_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    same = F.when(
        F.col("neighbor_label") == F.col("query_label"), 1
    ).otherwise(0)
    return (
        topk.groupBy("query_id", "query_label")
        .agg(
            F.count("*").cast("long").alias("n_neighbors"),
            F.sum(same).cast("long").alias("n_same_label"),
        )
        .select(
            "query_id",
            F.col("query_label").cast("int").alias("query_label"),
            "n_neighbors", "n_same_label",
            F.round(
                F.col("n_same_label").cast("double") / F.col("n_neighbors"),
                6,
            ).alias("consistency"),
        )
        .orderBy("query_id")
    )


_install_knn_consistency_oracle()


_QUANT_LEVELS = ((8, 127), (6, 31), (4, 7))


def _quant_mse_sql(level: int) -> str:
    dq = (f"GREATEST(CAST(-{level} AS DOUBLE), LEAST(CAST({level} AS DOUBLE),"
          f" floor(CAST(x AS DOUBLE) * {level} / vabs))) * vabs / {level}")
    return f"""
      SELECT {level} AS lvl, vec_id,
             CASE WHEN vabs IS NULL OR vabs = 0 THEN CAST(0 AS DECIMAL(18,6))
                  ELSE CAST(round(list_reduce(list_transform(
                         list_transform(embedding,
                           x -> CAST(x AS DOUBLE) - ({dq})),
                         e -> e * e), (p, q) -> p + q)
                       / len(embedding), 6) AS DECIMAL(18,6))
             END AS mse
      FROM (SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) AS vabs
            FROM embeddings)"""


def _install_quant_error_oracle() -> None:
    from dataclasses import replace

    from .registry import QUERIES as _Q

    per_level = "\n      UNION ALL\n      ".join(
        _quant_mse_sql(lv) for _, lv in _QUANT_LEVELS
    )
    bits_case = " ".join(
        f"WHEN lvl = {lv} THEN {b}" for b, lv in _QUANT_LEVELS
    )
    sql = f"""
    WITH mses AS (
      {per_level}
    )
    SELECT CAST(CASE {bits_case} END AS INT) AS bits,
           CAST(lvl AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           -- exact integer micro-units, round-half-up (the ttr lesson):
           CAST((2 * CAST(SUM(mse) * 1000000 AS BIGINT) + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 AS mean_mse,
           CAST(MAX(mse) AS DOUBLE) AS max_mse
    FROM mses GROUP BY lvl ORDER BY bits DESC
    """
    _Q["embed_quantization_error_report"] = replace(
        _Q["embed_quantization_error_report"], oracle=sql
    )


@query(
    "embed_quantization_error_report",
    oracle="",  # installed below
    tags=("embedding", "quantization", "calibration", "report"),
    doc="Quantization bits-vs-error decision table — the calibration "
        "report run before choosing a code width for the int-code ANN "
        "path (the FAISS-SQ tradeoff made data, same adjudication "
        "discipline as ann_recall_report/embed_matryoshka_recall): for "
        "symmetric linear quantizers at 8/6/4 bits (levels 127/31/7, "
        "the ann_topk_int8_rerank floor formula), the per-vector "
        "reconstruction MSE, reported as mean and max per width. "
        "Exactness: floor/clamp/divisions in ONE fixed IEEE expression "
        "shape mirrored across engines, the per-vector squared-error "
        "fold is sequential (bit-identical), each MSE passes the 6-dp "
        "decimal lane before cross-row aggregation; zero/null-norm "
        "vectors quantize to exact zero. Scale: one narrow pass over "
        "the vectors per width (3 widths), 3-row output — no joins, no "
        "windows, map-side-combinable aggregate.",
)
def embed_quantization_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding",
        F.expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
        .alias("vabs"),
    )
    per = []
    for bits, lv in _QUANT_LEVELS:
        dq = (f"greatest(cast(-{lv} as double), least(cast({lv} as double),"
              f" floor(cast(x as double) * {lv} / vabs))) * vabs / {lv}")
        mse = F.when(
            F.col("vabs").isNull() | (F.col("vabs") == 0),
            F.lit(0).cast("decimal(18,6)"),
        ).otherwise(
            F.expr(
                "cast(round(aggregate(transform(transform(embedding,"
                f" x -> cast(x as double) - ({dq})),"
                " e -> e * e), cast(0.0 as double), (p, q) -> p + q)"
                " / size(embedding), 6) as decimal(18,6))"
            )
        )
        per.append(
            emb.select(
                F.lit(lv).alias("lvl"),
                F.lit(bits).alias("bits"),
                mse.alias("mse"),
            )
        )
    mses = per[0]
    for p in per[1:]:
        mses = mses.unionByName(p)
    return (
        mses.groupBy("lvl", "bits")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum("mse").alias("__sum_mse"),
            F.max("mse").cast("double").alias("max_mse"),
        )
        .withColumn(
            "mean_mse",
            # exact integer micro-units, round-half-up (the ttr lesson)
            F.expr(
                "cast((2 * cast(__sum_mse * 1000000 as bigint) + n_vectors)"
                " div (2 * n_vectors) as double) / 1000000.0"
            ),
        )
        .select(
            F.col("bits").cast("int").alias("bits"),
            F.col("lvl").cast("int").alias("level"),
            "n_vectors", "mean_mse", "max_mse",
        )
        .orderBy(F.desc("bits"))
    )


_install_quant_error_oracle()


# ---------------------------------------------------------------------------
# Label-conditioned OOD scoring + greedy coreset selection (round 8).
# ---------------------------------------------------------------------------

_OOD_THRESH = 96.0  # 1.5 x dim(64): flag vectors well past E[m2]=dim


@query(
    "embed_ood_mahalanobis",
    oracle=f"""
    WITH stats AS (
      SELECT label, t.i AS dim, COUNT(*) AS n,
             CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE) AS s1,
             CAST(SUM({_DEC_SQL.format(
                 x='CAST(e.embedding[t.i] AS DOUBLE)'
                   ' * CAST(e.embedding[t.i] AS DOUBLE)')}) AS DOUBLE) AS s2
      FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
      GROUP BY label, t.i
    ),
    prof AS (
      SELECT label,
             list(s1 / n ORDER BY dim) AS mu_arr,
             list(GREATEST(1e-6, s2 / n - (s1 / n) * (s1 / n))
                  ORDER BY dim) AS var_arr
      FROM stats GROUP BY label
    ),
    m AS (
      SELECT e.vec_id, e.label,
             list_reduce(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - p.mu_arr[i])
                    * (CAST(e.embedding[i] AS DOUBLE) - p.mu_arr[i])
                    / p.var_arr[i]),
               (a, b) -> a + b) AS m2
      FROM embeddings e JOIN prof p USING (label)
    ),
    worst AS (
      SELECT label, vec_id, m2 FROM (
        SELECT label, vec_id, m2,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY m2 DESC, vec_id DESC) AS rn
        FROM m
      ) WHERE rn = 1
    )
    SELECT m.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM({_DEC_SQL.format(x='m.m2')}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_m2,
           round(MAX(m.m2), 6) AS max_m2,
           CAST(SUM(CASE WHEN m.m2 > {_OOD_THRESH} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(MAX(w.vec_id) AS BIGINT) AS worst_vec_id
    FROM m JOIN worst w USING (label)
    GROUP BY m.label
    ORDER BY m.label
    """,
    tags=("embedding", "ood", "quality", "llm-pipeline"),
    doc="Label-conditioned out-of-distribution census — the diagonal-"
        "Mahalanobis complement of embed_centroid_outliers' cosine "
        "cohesion: per label a diagonal Gaussian (per-dim mean/variance "
        "from exact 6-dp decimal moments, variance floored at 1e-6), "
        "then every member's squared Mahalanobis distance to ITS OWN "
        "label profile folds sequentially over dims (F.aggregate / "
        "list_reduce — bit-identical doubles). Vectors past 1.5x dim "
        "are flagged: mislabeled or corrupted points a curation pass "
        "should re-route before contrastive training. Scale: one "
        "posexplode hash-aggregate keyed (label, dim) builds the "
        "profiles (|labels|*dim rows), the profile relation broadcasts "
        "back (bounded by label cardinality), scoring is map-side, and "
        "the only other exchange is the |labels|-key final aggregate — "
        "the embedding matrix itself never reshuffles.",
)
def embed_ood_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    v = F.col("v").cast("double")
    stats = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(_DEC.format(x="cast(v as double)")))
            .cast("double").alias("s1"),
            F.sum(F.round(v * v, 6).cast("decimal(18,6)"))
            .cast("double").alias("s2"),
        )
    )
    mu = F.col("s1") / F.col("n")
    prof = (
        stats.select(
            "label", "dim", mu.alias("mu"),
            F.greatest(F.lit(1e-6),
                       F.col("s2") / F.col("n") - mu * mu).alias("var"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "mu"))),
                lambda s: s.mu,
            ).alias("mu_arr"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "var"))),
                lambda s: s["var"],
            ).alias("var_arr"),
        )
    )
    scored = emb.join(F.broadcast(prof), "label").withColumn(
        "m2",
        F.aggregate(
            F.zip_with(
                F.zip_with(
                    F.col("embedding"), F.col("mu_arr"),
                    lambda x, m: (x.cast("double") - m)
                    * (x.cast("double") - m),
                ),
                F.col("var_arr"),
                lambda t, vr: t / vr,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(
                F.sum(F.expr(_DEC.format(x="m2"))).cast("double")
                / F.count("*"), 6
            ).alias("mean_m2"),
            F.round(F.max("m2"), 6).alias("max_m2"),
            F.sum(F.when(F.col("m2") > _OOD_THRESH, 1).otherwise(0))
            .cast("long").alias("n_flagged"),
            F.max(F.struct(F.col("m2").alias("s"),
                           F.col("vec_id").alias("v"))).alias("w"),
        )
        .select(
            "label", "n_vecs", "mean_m2", "max_m2", "n_flagged",
            F.col("w.v").cast("long").alias("worst_vec_id"),
        )
        .orderBy("label")
    )


_KCENTER_K = 8


def _kcenter_oracle() -> str:
    """Unrolled greedy farthest-point chain (the recursive CTE would be
    the same 8 steps; unrolling keeps both engines on plain joins)."""
    l2 = _L2SQ_SQL
    parts = [
        "WITH e AS (SELECT vec_id, embedding FROM embeddings)",
        "c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1)",
        ("d1 AS (SELECT e.vec_id, e.embedding, "
         + l2.format(a="e.embedding", b="c1.embedding")
         + " AS dmin FROM e, c1)"),
    ]
    for r in range(2, _KCENTER_K + 1):
        parts.append(
            f"c{r} AS (SELECT vec_id, embedding, dmin FROM d{r-1} "
            f"ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        if r < _KCENTER_K:
            parts.append(
                f"d{r} AS (SELECT d.vec_id, d.embedding, LEAST(d.dmin, "
                + l2.format(a="d.embedding", b=f"c{r}.embedding")
                + f") AS dmin FROM d{r-1} d, c{r})"
            )
    selects = ["SELECT 1 AS round, CAST(vec_id AS BIGINT) AS vec_id, "
               "0.0 AS radius2 FROM c1"]
    for r in range(2, _KCENTER_K + 1):
        selects.append(
            f"SELECT {r}, CAST(vec_id AS BIGINT), round(dmin, 6) FROM c{r}"
        )
    return (",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)
            + "\nORDER BY round")


@query(
    "curation_coreset_kcenter",
    oracle=_kcenter_oracle(),
    tags=("curation", "embedding", "coreset", "llm-pipeline"),
    doc="Greedy k-center (farthest-point) coreset selection — the "
        "diversity-sampling pass a data-pruning pipeline runs to pick a "
        "small cover of embedding space (Sener & Savarese core-set "
        "active learning): seed = lowest vec_id, then 7 rounds each "
        "select the vector FARTHEST (squared L2, vec_id tiebreak) from "
        "the chosen set; radius2 of round r is the covering radius of "
        "the first r-1 centers — the monotone curve that tells you when "
        "the coreset stops paying. Determinism: per-center distances "
        "fold sequentially (zip_with/aggregate == list_transform/"
        "list_reduce), min-over-centers is an exact IEEE selection, and "
        "the argmax orders (dmin DESC, vec_id). Scale: each round is "
        "one NARROW pass — the <= 8 selected centers travel as literal "
        "arrays (the broadcast degenerate), per-row min is map-side, "
        "and TakeOrdered(1) reduces without a shuffle; k rounds = k "
        "scans, no quadratic term anywhere. The k collected rows are "
        "the bounded driver-side state the plan-quality rules allow.",
)
def curation_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-center is inherently round-sequential (each pick needs a global
    # argmax), but the K rounds need not re-read parquet: materialize
    # the vector relation once and let every round's TakeOrdered scan
    # the in-memory blocks (guide §5 localCheckpoint).
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    centers = [(1, int(seed.vec_id), 0.0, list(seed.embedding))]
    for r in range(2, _KCENTER_K + 1):
        dmin = None
        for _, _, _, c_emb in centers:
            lit = F.array(*[F.lit(float(x)) for x in c_emb])
            d = _l2sq(F.col("embedding"), lit)
            dmin = d if dmin is None else F.least(dmin, d)
        nxt = (
            emb.withColumn("dmin", dmin)
            .orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        centers.append(
            (r, int(nxt.vec_id), float(nxt.dmin), list(nxt.embedding))
        )
    # Driver-side rounding of a value that feeds the hash must ride the
    # HALF_UP decimal lane (streaming/stateful.py _micro6): Python's
    # built-in round() is HALF_EVEN while DuckDB round() is half away
    # from zero. A squared-L2 of dyadic fixture embeddings can't hit an
    # exact .5 micro-tie, but policy is one rounding lane everywhere
    # (ADVICE r8).
    from ..streaming.stateful import _micro6

    return spark.createDataFrame(
        [(r, v, _micro6(d) / 10**6) for r, v, d, _ in centers],
        "round int, vec_id bigint, radius2 double",
    )


@query(
    "embed_ivf_balance_report",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding,
             {_NORM_SQL.format(a='embedding')} AS nrm
      FROM embeddings
    ),
    centroids AS (
      SELECT CAST(vec_id % 16 AS INT) AS cell, embedding AS c_emb
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % 16
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY ({_DOT_SQL.format(a='embedding', b='c_emb')}
                         / (nrm * {_NORM_SQL.format(a='c_emb')})) DESC,
                        cell) AS c_rank
      FROM base CROSS JOIN centroids
    ),
    occ AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM assign WHERE c_rank = 1 GROUP BY cell
    )
    SELECT cell, n_vectors,
           CAST(n_vectors * 16000 // SUM(n_vectors) OVER () AS BIGINT)
             AS load_per_mille,
           n_vectors * 16000 // SUM(n_vectors) OVER () > 2000 AS hot,
           CAST(MAX(n_vectors) OVER () * 16000 // SUM(n_vectors) OVER ()
                AS BIGINT) AS max_load_per_mille
    FROM occ ORDER BY cell
    """,
    tags=("embedding", "ann", "ivf", "balance"),
    doc="IVF cell-occupancy balance report — the ANN-index pre-flight "
        "that decides whether the cell seeding needs re-training before "
        "routing queries (a hot cell makes every probe that touches it "
        "pay its full occupancy; the ANN twin of the shard-balance "
        "straggler check): per cell, the vector count and its load "
        "factor in per-mille of the uniform share (1000 = perfectly "
        "balanced, >2000 flagged hot), plus the worst cell's load "
        "attached to every row. Uses exactly ann_ivf_probed's "
        "deterministic assignment (same centroids, same argmin), so "
        "the report audits the index the recall queries actually "
        "probe. All-integer division lanes. Scale: one allowlisted "
        "O(N x 16) broadcast assignment pass (shared shape) into a "
        "16-row aggregate; the balance windows run over 16 rows.",
)
def embed_ivf_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    d = emb.crossJoin(F.broadcast(centroids))
    sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    occ = (
        d.withColumn("c_sim", sim)
        .withColumn("c_rank", F.row_number().over(w))
        .filter(F.col("c_rank") == 1)
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_vectors"))
    )
    w_all = Window.partitionBy()
    load = F.expr(
        f"(n_vectors * {n_cells}000) div total"
    )
    return (
        occ.withColumn("total", F.sum("n_vectors").over(w_all))
        .withColumn("mx", F.max("n_vectors").over(w_all))
        .withColumn("load_per_mille", load)
        .withColumn("hot", F.col("load_per_mille") > 2000)
        .withColumn(
            "max_load_per_mille",
            F.expr(f"(mx * {n_cells}000) div total").cast("long"),
        )
        .select(
            "cell", "n_vectors", "load_per_mille", "hot",
            "max_load_per_mille",
        )
        .orderBy("cell")
    )


_ROUTE_PREFIX_DIMS = 16


@query(
    "embed_matryoshka_route_drift",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding,
             embedding[1:{_ROUTE_PREFIX_DIMS}] AS pref,
             {_NORM_SQL.format(a='embedding')} AS nrm,
             {_NORM_SQL.format(a=f'embedding[1:{_ROUTE_PREFIX_DIMS}]')}
               AS pnrm
      FROM embeddings
    ),
    centroids AS (
      SELECT CAST(vec_id % 16 AS INT) AS cell,
             embedding AS c_emb,
             embedding[1:{_ROUTE_PREFIX_DIMS}] AS c_pref
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % 16
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    afull AS (
      SELECT vec_id, cell FROM (
        SELECT b.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY ({_DOT_SQL.format(a='b.embedding', b='c.c_emb')}
                           / (b.nrm * {_NORM_SQL.format(a='c.c_emb')}))
                          DESC, c.cell) AS r
        FROM base b CROSS JOIN centroids c
      ) WHERE r = 1
    ),
    apref AS (
      SELECT vec_id, cell AS pcell FROM (
        SELECT b.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY ({_DOT_SQL.format(a='b.pref', b='c.c_pref')}
                           / (b.pnrm * {_NORM_SQL.format(a='c.c_pref')}))
                          DESC, c.cell) AS r
        FROM base b CROSS JOIN centroids c
      ) WHERE r = 1
    )
    SELECT f.cell,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN f.cell = p.pcell THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_route,
           CAST(SUM(CASE WHEN f.cell = p.pcell THEN 1 ELSE 0 END) * 1000
                // COUNT(*) AS BIGINT) AS agreement_per_mille
    FROM afull f JOIN apref p USING (vec_id)
    GROUP BY f.cell ORDER BY f.cell
    """,
    tags=("embedding", "ann", "matryoshka", "routing"),
    doc="Matryoshka routing-drift audit — before serving ANN on "
        f"truncated {_ROUTE_PREFIX_DIMS}-dim prefixes "
        "(embed_matryoshka_recall measures SCORING loss; this measures "
        "ROUTING loss, the part a cell-probing index actually feels): "
        "every vector is assigned to its nearest centroid twice, once "
        "on full vectors and once on the shared prefix slice of the "
        "SAME centroids, and each full-assignment cell reports how "
        "often the cheap route lands in the same cell. Low agreement "
        "in a cell means prefix-routed queries need a higher nprobe "
        "there, read straight off this table. Same deterministic "
        "seeds/argmin as ann_ivf_probed (sequential-fold dot products, "
        "bit-identical ordering). Scale: two allowlisted O(N x 16) "
        "broadcast assignment passes over one base scan, a vec_id "
        "equi-join, and a 16-row aggregate.",
)
def embed_matryoshka_route_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    k = _ROUTE_PREFIX_DIMS
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .withColumn("pref", F.slice("embedding", 1, k))
        .withColumn("nrm", _norm(F.col("embedding")))
        .withColumn("pnrm", _norm(F.col("pref")))
    )
    n_cells = 16
    w_seed = Window.partitionBy(F.col("vec_id") % n_cells).orderBy("vec_id")
    centroids = (
        emb.withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("vec_id") % n_cells).cast("int").alias("cell"),
            F.col("embedding").alias("c_emb"),
            F.col("pref").alias("c_pref"),
        )
    )

    def assign(vec_col: str, nrm_col: str, c_col: str) -> DataFrame:
        d = emb.crossJoin(F.broadcast(centroids))
        sim = _dot(F.col(vec_col), F.col(c_col)) / (
            F.col(nrm_col) * _norm(F.col(c_col))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("c_sim"), F.asc("cell")
        )
        return (
            d.withColumn("c_sim", sim)
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("vec_id", "cell")
        )

    afull = assign("embedding", "nrm", "c_emb")
    apref = assign("pref", "pnrm", "c_pref").withColumnRenamed(
        "cell", "pcell"
    )
    same = F.when(F.col("cell") == F.col("pcell"), 1).otherwise(0)
    return (
        afull.join(apref, "vec_id")
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum(same).cast("long").alias("n_same_route"),
        )
        .withColumn(
            "agreement_per_mille",
            F.expr("(n_same_route * 1000) div n_vectors"),
        )
        .orderBy("cell")
    )


def _anisotropy_oracle() -> str:
    norm = _NORM_SQL.format(a="embedding")
    c_sim = (f"({_DOT_SQL.format(a='embedding', b='c_emb')}"
             f" / (nrm * {_NORM_SQL.format(a='c_emb')}))")
    u6 = ("CAST(round(CAST(embedding[t.i] AS DOUBLE) / nrm, 6)"
          " AS DECIMAL(18,6))")
    return f"""
    WITH base AS (SELECT vec_id, embedding, {norm} AS nrm FROM embeddings),
    centroids AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn FROM base)
      WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, embedding, nrm, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY {c_sim} DESC, cell) AS c_rank
      FROM base CROSS JOIN centroids
    ),
    members AS (SELECT vec_id, embedding, nrm, cell
                FROM assign WHERE c_rank = 1),
    scoped AS (
      SELECT CAST(cell AS VARCHAR) AS scope, embedding, nrm FROM members
      UNION ALL
      SELECT '__global__', embedding, nrm FROM members
    ),
    per_dim AS (
      SELECT scope, t.i AS dim,
             SUM({u6}) AS su,
             SUM({u6} * {u6}) AS qd,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM scoped, unnest(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY scope, t.i
    ),
    per_scope AS (
      SELECT scope,
             CAST(SUM(CAST(round(CAST(su AS DOUBLE)
                                 * CAST(su AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS s2,
             CAST(SUM(qd) AS DOUBLE) AS q,
             MAX(n_rows) AS n
      FROM per_dim GROUP BY scope
    )
    SELECT scope, CAST(n AS BIGINT) AS n_vecs,
           round((s2 - q) / (CAST(n AS DOUBLE) * (n - 1)), 6)
               AS mean_pairwise_cos
    FROM per_scope WHERE n > 1 ORDER BY scope
    """


@query(
    "embed_anisotropy_report",
    oracle=_anisotropy_oracle(),
    tags=("embedding", "quality", "anisotropy", "report"),
    doc="Embedding-space anisotropy (r12) — the Ethayarajh-style mean "
        "pairwise cosine that decides whether a whitening pass "
        "(embed_whitening_check) is needed: a healthy isotropic space "
        "sits near 0, a collapsed one near 1. Computed WITHOUT any pair "
        "join via the sum-of-unit-vectors identity mean = (||SUM u||^2 "
        "- SUM ||u||^2) / (n(n-1)) over 6-dp-rounded unit components — "
        "one posexplode into a (scope, dim)-keyed exact-decimal "
        "aggregate, so the all-pairs statistic costs O(N x dim) and "
        "ZERO pairwise work at any corpus size; per-IVF-cell rows "
        "beside the global row localize WHERE the collapse lives. All "
        "cross-row sums are exact decimals (order-independent); the "
        "final division + round is IEEE-identical on both engines.",
)
def embed_anisotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    centroids = _seed_centroids(emb)
    c_sim = _dot(F.col("embedding"), F.col("c_emb")) / (
        F.col("nrm") * _norm(F.col("c_emb"))
    )
    members = _assign(
        emb.select("vec_id", "embedding", "nrm"), centroids, c_sim
    ).select("embedding", "nrm", "cell")
    scoped = members.select(
        F.col("cell").cast("string").alias("scope"), "embedding", "nrm"
    ).unionByName(
        members.select(
            F.lit("__global__").alias("scope"), "embedding", "nrm"
        )
    )
    rows = scoped.select(
        "scope",
        F.posexplode("embedding").alias("dim", "v"),
        F.col("nrm"),
    ).select(
        "scope", "dim",
        F.round(F.col("v").cast("double") / F.col("nrm"), 6)
        .cast("decimal(18,6)").alias("u6"),
    )
    per_dim = rows.groupBy("scope", "dim").agg(
        F.sum("u6").alias("su"),
        F.sum(F.col("u6") * F.col("u6")).alias("qd"),
        F.count("*").cast("long").alias("n_rows"),
    )
    su_d = F.col("su").cast("double")
    per_scope = per_dim.groupBy("scope").agg(
        F.sum(
            F.round(su_d * su_d, 6).cast("decimal(18,6)")
        ).cast("double").alias("s2"),
        F.sum("qd").cast("double").alias("q"),
        F.max("n_rows").alias("n"),
    )
    return (
        per_scope.filter(F.col("n") > 1)
        .select(
            "scope",
            F.col("n").cast("long").alias("n_vecs"),
            F.round(
                (F.col("s2") - F.col("q"))
                / (F.col("n").cast("double") * (F.col("n") - 1)), 6)
            .alias("mean_pairwise_cos"),
        )
        .orderBy("scope")
    )


# ---------------------------------------------------------------------------
# Incremental ANN-index maintenance under CDC (r13, VERDICT r12 item 2)
# ---------------------------------------------------------------------------

def _incremental_index_oracle(bits: int = 6, dim: int = 64) -> str:
    """DuckDB FULL-REBUILD of the IVF+LSH index over the post-CDC latest
    state, assigned against the frozen (base-snapshot) centroids — the
    adversarial half of the parity proof: the Spark side maintains the
    index INCREMENTALLY (per-delta entries + version-replacing merge),
    so a hash match certifies incremental == rebuild."""
    from ..operators.blocking import hyperplane

    def plane_lit(p: int) -> str:
        return "[" + ", ".join(repr(c) for c in hyperplane(p, dim)) + "]"

    def bit_sql(p: int) -> str:
        return (
            "(CASE WHEN list_reduce(list_transform(list_zip(embedding, "
            f"{plane_lit(p)}), x -> CAST(x[1] AS DOUBLE) * x[2]),"
            " (p, q) -> p + q) >= 0 THEN 1 ELSE 0 END)"
        )

    sig = " || ".join(f"CAST({bit_sql(p)} AS VARCHAR)" for p in range(bits))
    c_nrm = _NORM_SQL.format(a="c_emb")
    nrm = _NORM_SQL.format(a="embedding")
    dot = _DOT_SQL.format(a="f.embedding", b="c.c_emb")
    return f"""
    WITH cents AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb,
             {c_nrm} AS c_nrm
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn
            FROM embeddings)
      WHERE rn = 1
    ),
    final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 0
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 20 <> 7
    ),
    sigged AS (
      SELECT vec_id, embedding, {nrm} AS nrm, {sig} AS sig FROM final
    ),
    assigned AS (
      SELECT vec_id, cell, sig FROM (
        SELECT f.vec_id, c.cell, f.sig,
               ROW_NUMBER() OVER (
                 PARTITION BY f.vec_id
                 ORDER BY {dot} / (f.nrm * c.c_nrm) DESC, c.cell) AS rn
        FROM sigged f CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(vec_id) AS BIGINT) AS vec_checksum,
           CAST(COUNT(DISTINCT sig) AS BIGINT) AS n_sig_buckets
    FROM assigned GROUP BY cell ORDER BY cell
    """


@query(
    "ann_incremental_index_parity",
    oracle=_incremental_index_oracle(),
    tags=("similarity", "ann", "cdc", "incremental-index"),
    doc="Incremental ANN-index maintenance under CDC (r13, VERDICT r12 "
        "item 2) — composes the engine's two halves: embeddings flow "
        "through the FIXTURES CDC recipe (base upserts _ver=2k, negated "
        "re-embeds on k%10=0 at _ver=2k+1, deletes on k%20=7), and the "
        "IVF cell + LSH signature index is maintained INCREMENTALLY: "
        "each batch contributes only its delta as version-replacing "
        "index entries (operators/ann_index.py) assigned against frozen "
        "base-snapshot centroids, merged by the same latest_alive "
        "machinery as the document tables (ReplacingMergeTree applied "
        "to the index itself, readme.md:89-91). The DuckDB oracle "
        "REBUILDS the index from the final latest state, so the hash "
        "match IS the incremental==rebuild parity proof. Scale: "
        "per-batch work is |delta| x K broadcast argmax + |delta| "
        "30-byte appended entries; the corpus is never rescanned and "
        "the index never rebuilt.",
)
def ann_incremental_index_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_index import (
        assign_entries,
        frozen_centroids,
        live_index,
        tombstone_entries,
    )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    cents = frozen_centroids(emb).localCheckpoint(eager=True)  # K rows, frozen

    # batch 1: the base snapshot arrives as upserts
    base = emb.withColumn("_ver", F.col("vec_id") * 2)
    idx0 = assign_entries(base, cents)

    # batch 2: re-embeds (negated vectors — they migrate cells and flip
    # signatures) and deletes, each touching ONLY the delta rows
    upd = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        (F.col("vec_id") * 2 + 1).alias("_ver"),
    )
    dels = emb.filter(F.col("vec_id") % 20 == 7).select(
        "vec_id", (F.col("vec_id") * 2 + 1).alias("_ver")
    )
    delta = assign_entries(upd, cents).unionByName(tombstone_entries(dels))

    final = live_index(idx0.unionByName(delta))
    return (
        final.groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("vec_id").cast("long").alias("vec_checksum"),
            F.countDistinct("sig").cast("long").alias("n_sig_buckets"),
        )
        .orderBy("cell")
    )


def _incremental_search_oracle(dim: int = 64) -> str:
    """DuckDB rebuild of the SERVING READ over the post-CDC index: final
    latest state, frozen base-snapshot centroids, full re-assignment,
    then each query probes its nearest cell and ranks that cell's
    members by round(cos, 4) + id. The Spark side serves the same read
    from the INCREMENTALLY-maintained entry log, so the hash match
    proves the composed CDC -> index -> search story end-to-end."""
    nrm = _NORM_SQL.format(a="embedding")
    c_nrm = _NORM_SQL.format(a="c_emb")
    f_dot = _DOT_SQL.format(a="f.embedding", b="c.c_emb")
    q_dot = _DOT_SQL.format(a="q.q_emb", b="c.c_emb")
    s_dot = _DOT_SQL.format(a="q.q_emb", b="m.embedding")
    return f"""
    WITH cents AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb,
             {c_nrm} AS c_nrm
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn
            FROM embeddings)
      WHERE rn = 1
    ),
    final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 0
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 20 <> 7
    ),
    f AS (SELECT vec_id, embedding, {nrm} AS nrm FROM final),
    assigned AS (
      SELECT vec_id, embedding, nrm, cell FROM (
        SELECT f.vec_id, f.embedding, f.nrm, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY f.vec_id
                 ORDER BY {f_dot} / (f.nrm * c.c_nrm) DESC, c.cell) AS rn
        FROM f CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
      FROM f WHERE vec_id % 100 = 0
    ),
    probed AS (
      SELECT query_id, q_emb, q_nrm, cell FROM (
        SELECT q.query_id, q.q_emb, q.q_nrm, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {q_dot} / (q.q_nrm * c.c_nrm) DESC, c.cell) AS rn
        FROM q CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT q.query_id, m.vec_id AS neighbor_id,
             round({s_dot} / (q.q_nrm * m.nrm), 4) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY round({s_dot} / (q.q_nrm * m.nrm), 4) DESC,
                        m.vec_id) AS rn
      FROM probed q JOIN assigned m USING (cell)
      WHERE m.vec_id <> q.query_id
    ) WHERE rn <= 5
    ORDER BY query_id, rank
    """


@query(
    "ann_incremental_search_read",
    oracle=_incremental_search_oracle(),
    tags=("similarity", "ann", "cdc", "incremental-index", "serving"),
    doc="Serving read over the INCREMENTALLY-maintained ANN index (r13 "
        "— completes the VERDICT r12 item-2 composition): embeddings "
        "flow through the FIXTURES CDC recipe, the entry log is "
        "maintained per-delta (operators/ann_index.py — base batch, "
        "then negated re-embeds + tombstones), and queries are served "
        "FROM the live index: probe the frozen centroid nearest to the "
        "query, take that cell's live entries, join back to the "
        "current vector state, rank by round(cos,4) + id. Deleted "
        "vectors can never be returned (tombstones win the merge) and "
        "re-embedded vectors rank under their NEW cell/values. The "
        "oracle serves the identical read from a full rebuild, so the "
        "hash match proves incremental-index serving == rebuild "
        "serving end-to-end. Scale: probe is Q x K broadcast argmax; "
        "candidates are one cell's occupancy per query (N/K rows), "
        "never the corpus; the index merge shuffles 30-byte entries "
        "keyed by vec_id.",
)
def ann_incremental_search_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_index import (
        assign_entries,
        frozen_centroids,
        live_index,
        tombstone_entries,
    )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    cents = frozen_centroids(emb).localCheckpoint(eager=True)

    base = emb.withColumn("_ver", F.col("vec_id") * 2)
    upd = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        (F.col("vec_id") * 2 + 1).alias("_ver"),
    )
    dels = emb.filter(F.col("vec_id") % 20 == 7).select(
        "vec_id", (F.col("vec_id") * 2 + 1).alias("_ver")
    )
    entries = (
        assign_entries(base, cents)
        .unionByName(assign_entries(upd, cents))
        .unionByName(tombstone_entries(dels))
    )
    live = live_index(entries).select("vec_id", "cell")

    # the CURRENT vector state (what the CDC target's latest_alive view
    # serves) — candidates join back to it for scoring. Materialized
    # once: it feeds both the query selection and the candidate join
    # (guide §2.4).
    vectors = (
        emb.filter(F.col("vec_id") % 20 != 7)
        .select(
            "vec_id",
            F.when(
                F.col("vec_id") % 10 == 0,
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")).alias("embedding"),
        )
        .withColumn("nrm", _norm(F.col("embedding")))
        .localCheckpoint(eager=True)
    )
    q = vectors.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "__s",
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * _norm(F.col("c_emb"))),
    )
    probed = (
        qc.groupBy("query_id")
        .agg(
            F.max(
                F.struct(
                    F.col("__s").alias("s"),
                    (-F.col("cell")).alias("neg_cell"),
                    F.col("q_emb").alias("e"),
                    F.col("q_nrm").alias("n"),
                )
            ).alias("mx")
        )
        .select(
            "query_id",
            (-F.col("mx.neg_cell")).cast("int").alias("cell"),
            F.col("mx.e").alias("q_emb"),
            F.col("mx.n").alias("q_nrm"),
        )
    )
    cand = (
        F.broadcast(probed)
        .join(live, "cell")
        .join(vectors, "vec_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.withColumn(
        "cos_sim",
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("nrm")),
            4,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos_sim",
            F.col("rank").cast("int"),
        )
        .orderBy("query_id", "rank")
    )


def _incremental_pq_oracle() -> str:
    """DuckDB FULL-REBUILD of the PQ code table over the post-CDC latest
    state, encoded against the frozen (base-snapshot) codebooks — the
    Spark side maintains codes INCREMENTALLY (per-delta encode +
    version-replacing merge), so a hash match certifies incremental ==
    rebuild for the PQ lane too (r14, VERDICT r13 item 1a)."""
    return f"""
    WITH final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 0
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 20 <> 7
    ),
    sv AS (
      SELECT vec_id, CAST(u.m AS INT) AS m,
             embedding[CAST({_PQ_DIM} * u.m + 1 AS INT)
                       :CAST({_PQ_DIM} * u.m + {_PQ_DIM} AS INT)] AS sv
      FROM final, unnest(range(0, {_PQ_M})) AS u(m)
    ),
    codes AS (
      SELECT vec_id, m, k AS code FROM (
        SELECT sv.vec_id, sv.m, cb.k,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.m
                 ORDER BY {_L2SQ_SQL.format(a='sv.sv', b='cb.cv')} ASC, cb.k
               ) AS rn
        FROM sv JOIN ({_PQ_CODEBOOK_SQL}) cb USING (m)
      ) WHERE rn = 1
    )
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes_csv
    FROM codes GROUP BY vec_id ORDER BY vec_id
    """


@query(
    "ann_incremental_pq_parity",
    oracle=_incremental_pq_oracle(),
    tags=("similarity", "ann", "pq", "cdc", "incremental-index"),
    doc="CDC-incremental PQ codes (r14, VERDICT r13 item 1a — extends "
        "the r13 entry-log pattern from IVF+LSH to the PQ lane): "
        "embeddings flow through the FIXTURES CDC recipe (base upserts "
        "_ver=2k, negated re-embeds on k%10=0 at _ver=2k+1, deletes on "
        "k%20=7), and each vector's 8 product-quantization codes are "
        "maintained INCREMENTALLY as version-replacing entry-log rows "
        "(operators/ann_index.py pq_encode_entries): per-delta broadcast "
        "squared-L2 argmin against FROZEN base-snapshot codebooks (the "
        "FAISS IndexPQ add-without-retrain contract), tombstones for "
        "deletes, latest_alive merge — the ReplacingMergeTree promise "
        "(readme.md:89-91) applied to the code table. The DuckDB oracle "
        "re-encodes the FINAL latest state from scratch, so the per-row "
        "hash match (full 8-code string per vec_id) IS the incremental "
        "== rebuild proof. Scale: per-batch work is |delta| x M x K "
        "broadcast argmin and |delta| packed rows; the corpus is never "
        "re-encoded, so ann_pq_adc_rerank-style ADC serving reads the "
        "live code table directly under churn.",
)
def ann_incremental_pq_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_index import (
        frozen_pq_codebooks,
        live_pq_codes,
        pq_encode_entries,
        pq_tombstones,
    )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    cb = frozen_pq_codebooks(emb).localCheckpoint(eager=True)  # 128 tiny rows

    base = emb.withColumn("_ver", F.col("vec_id") * 2)
    upd = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        (F.col("vec_id") * 2 + 1).alias("_ver"),
    )
    dels = emb.filter(F.col("vec_id") % 20 == 7).select(
        "vec_id", (F.col("vec_id") * 2 + 1).alias("_ver")
    )
    entries = (
        pq_encode_entries(base, cb)
        .unionByName(pq_encode_entries(upd, cb))
        .unionByName(pq_tombstones(dels))
    )
    return (
        live_pq_codes(entries)
        .select(
            "vec_id",
            F.array_join(F.transform("codes", lambda c: c.cast("string")),
                         ",").alias("codes_csv"),
        )
        .orderBy("vec_id")
    )


def _incremental_graph_oracle() -> str:
    """DuckDB FULL-REBUILD of the packed kNN-graph adjacency over the
    post-CDC latest state (frozen base-snapshot centroids, per-src
    top-R cell-local neighbors by round(cos,4) DESC + id) — the Spark
    side maintains adjacency INCREMENTALLY (touched-cell patches +
    version-replacing merge), so the per-src hash match (full ordered
    neighbor list) certifies incremental == rebuild (r14, item 1b)."""
    c_nrm = _NORM_SQL.format(a="c_emb")
    nrm = _NORM_SQL.format(a="embedding")
    f_dot = _DOT_SQL.format(a="f.embedding", b="c.c_emb")
    pair = (f"round({_DOT_SQL.format(a='a.embedding', b='b.embedding')}"
            f" / (a.nrm * b.nrm), 4)")
    return f"""
    WITH cents AS (
      SELECT CAST(vec_id % {_N_CELLS} AS INT) AS cell, embedding AS c_emb,
             {c_nrm} AS c_nrm
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn
            FROM embeddings)
      WHERE rn = 1
    ),
    final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 0
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 20 <> 7
    ),
    f AS (SELECT vec_id, embedding, {nrm} AS nrm FROM final),
    assigned AS (
      SELECT vec_id, embedding, nrm, cell FROM (
        SELECT f.vec_id, f.embedding, f.nrm, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY f.vec_id
                 ORDER BY {f_dot} / (f.nrm * c.c_nrm) DESC, c.cell) AS rn
        FROM f CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    edir AS (
      SELECT src, dst, rn FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {pair} DESC, b.vec_id) AS rn
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
      ) WHERE rn <= {_BEAM_R}
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS INT) AS degree,
             string_agg(CAST(dst AS VARCHAR), ',' ORDER BY rn) AS dst_csv,
             CAST(SUM(dst) AS BIGINT) AS dst_sum
      FROM edir GROUP BY src
    )
    SELECT m.vec_id AS src, m.cell,
           CAST(COALESCE(d.degree, 0) AS INT) AS degree,
           COALESCE(d.dst_csv, '') AS dst_csv,
           CAST(COALESCE(d.dst_sum, 0) AS BIGINT) AS dst_sum
    FROM assigned m LEFT JOIN deg d ON d.src = m.vec_id
    ORDER BY src
    """


@query(
    "ann_incremental_graph_parity",
    oracle=_incremental_graph_oracle(),
    tags=("similarity", "ann", "graph", "cdc", "incremental-index"),
    doc="CDC-incremental kNN-graph adjacency (r14, VERDICT r13 item 1b "
        "— the last ANN lane to survive corpus churn without a "
        "rebuild): the maintained state is each node's packed "
        "top-{r} cell-local out-adjacency (ann_graph_beam_topk's edge "
        "kernel — round(cos,4) DESC, id tiebreak). A CDC batch "
        "invalidates exactly the cells it touches (new cells of its "
        "upserts + PRIOR cells of changed/deleted keys — a re-embed "
        "patches both sides of its migration), members of touched "
        "cells get fresh version-replacing adjacency rows stamped with "
        "the monotone batch seq, deletes tombstone the node's own row "
        "AND shrink its former cell's survivors' lists; untouched "
        "cells' rows stay valid by construction. The DuckDB oracle "
        "rebuilds the adjacency from the final state, so the per-src "
        "hash match (full ordered neighbor CSV) IS the incremental == "
        "rebuild proof. Scale: per-batch cost |touched cells| x "
        "occupancy^2 under the sub-block cap, never corpus-sized; the "
        "packed row makes a node's neighbor fetch one row read for the "
        "beam-search serving path.".format(r=_BEAM_R),
)
def ann_incremental_graph_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_index import (
        frozen_centroids,
        graph_adjacency_patch,
        graph_node_rows,
        live_adjacency,
    )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    cents = frozen_centroids(emb).localCheckpoint(eager=True)

    # batch 1: the base snapshot — every cell is touched, the patch IS
    # the initial build (prior state empty)
    base = emb.select(
        "vec_id", "embedding",
        (F.col("vec_id") * 2).alias("_ver"), F.lit(0).alias("_deleted"),
    )
    # batch 2: negated re-embeds + deletes — only their old/new cells
    # recompute; everything else rides batch 1's rows
    delta_changes = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
            (F.col("vec_id") * 2 + 1).alias("_ver"),
            F.lit(0).alias("_deleted"),
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 20 == 7).select(
                "vec_id", "embedding",
                (F.col("vec_id") * 2 + 1).alias("_ver"),
                F.lit(1).alias("_deleted"),
            )
        )
    )
    # Both batches' node rows materialized once each (the patches
    # reference them several times — merge union, touched cells,
    # tombstone keys; each lazy reference re-ran the broadcast-argmax
    # assignment over the parquet scan, guide §2.4) and their argmax
    # jobs overlapped — they are independent given the centroid
    # checkpoint (r15, guide §2.6).
    nodes1 = graph_node_rows(base, cents).localCheckpoint(eager=True)
    nodes2 = graph_node_rows(delta_changes, cents).localCheckpoint(eager=True)
    empty_prior = nodes1.filter(F.lit(False))
    # batch 1's merged state IS nodes1 (one row per key by construction)
    # and batch 2's prior state is likewise nodes1 itself — both
    # latest_state windows over already-unique keys skipped outright;
    # batch 2's true merge (the one window this story needs) is
    # materialized once and shared across the patch's lanes (r15,
    # guide §2.4).
    from ..operators.cdc import latest_state as _latest_state

    adj1 = graph_adjacency_patch(empty_prior, nodes1, seq=1, merged=nodes1)
    merged = _latest_state(
        nodes1.unionByName(nodes2), ["vec_id"]
    ).localCheckpoint(eager=True)
    adj2 = graph_adjacency_patch(nodes1, nodes2, seq=2, merged=merged)

    return (
        live_adjacency(adj1.unionByName(adj2))
        .select("src", "cell", "degree", "dst_csv", "dst_sum")
        .orderBy("src")
    )


def _incremental_pq_search_oracle() -> str:
    """DuckDB rebuild of the PQ-ADC SERVING READ over the post-CDC
    state: codes re-encoded from the final latest state against the
    frozen base-snapshot codebooks, then the identical ADC read
    (per-query 128-entry exact-decimal LUT, 8-term sums, 10-candidate
    shortlist, full-precision rerank to top-5). The Spark side serves
    the same read from the INCREMENTALLY-maintained code table, so the
    hash match proves the composed CDC -> PQ codes -> ADC search story
    end-to-end."""
    nrm = _NORM_SQL.format(a="embedding")
    return f"""
    WITH final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 0
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 20 <> 7
    ),
    sv AS (
      SELECT vec_id, CAST(u.m AS INT) AS m,
             embedding[CAST({_PQ_DIM} * u.m + 1 AS INT)
                       :CAST({_PQ_DIM} * u.m + {_PQ_DIM} AS INT)] AS sv
      FROM final, unnest(range(0, {_PQ_M})) AS u(m)
    ),
    codes AS (
      SELECT vec_id, m, k AS code FROM (
        SELECT sv.vec_id, sv.m, cb.k,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.m
                 ORDER BY {_L2SQ_SQL.format(a='sv.sv', b='cb.cv')} ASC, cb.k
               ) AS rn
        FROM sv JOIN ({_PQ_CODEBOOK_SQL}) cb USING (m)
      ) WHERE rn = 1
    ),
    queries AS (
      SELECT vec_id AS query_id, embedding AS q_emb, {nrm} AS q_nrm
      FROM final WHERE vec_id % 100 = 0
      ORDER BY vec_id LIMIT 512
    ),
    lut AS (
      SELECT q.query_id, cb.m, cb.k,
             {_DEC_SQL.format(x=_L2SQ_SQL.format(
                 a="q.q_emb[CAST(" + str(_PQ_DIM) + " * cb.m + 1 AS INT)"
                   ":CAST(" + str(_PQ_DIM) + " * cb.m + "
                   + str(_PQ_DIM) + " AS INT)]",
                 b='cb.cv'))} AS pdist
      FROM queries q CROSS JOIN ({_PQ_CODEBOOK_SQL}) cb
    ),
    approx AS (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(l.pdist) AS DOUBLE) AS adc_d2
      FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.k
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_d2 ASC, neighbor_id) AS rn
        FROM approx WHERE neighbor_id <> query_id
      ) WHERE rn <= 10
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM (
      SELECT s.query_id, s.neighbor_id,
             round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
                   / (q.q_nrm * {_NORM_SQL.format(a='e.embedding')}), 4)
               AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
                              / (q.q_nrm * {_NORM_SQL.format(a='e.embedding')}),
                              4) DESC, s.neighbor_id) AS rn
      FROM shortlist s
      JOIN queries q ON q.query_id = s.query_id
      JOIN final e ON e.vec_id = s.neighbor_id
    ) WHERE rn <= 5
    """


@query(
    "ann_incremental_pq_search_read",
    oracle=_incremental_pq_search_oracle(),
    tags=("similarity", "ann", "pq", "cdc", "incremental-index", "serving"),
    doc="PQ-ADC serving read over the INCREMENTALLY-maintained code "
        "table (r14 — completes the item-1a composition the way r13's "
        "ann_incremental_search_read completed IVF): embeddings flow "
        "through the FIXTURES CDC recipe, the 8-codes-per-vector table "
        "is maintained per-delta against frozen codebooks "
        "(operators/ann_index.py), and queries are served FROM the live "
        "codes via the shared _adc_serve kernel — per-query exact-int "
        "LUT broadcast as one numpy tensor, narrow mapInPandas ADC scan "
        "emitting per-partition shortlists, full-precision rerank "
        "against the CURRENT vector state. Deleted vectors can never be "
        "returned (tombstones win the code-table merge) and re-embedded "
        "vectors rank under their NEW codes. The oracle serves the "
        "identical read from a full re-encode, so the hash match proves "
        "incremental-code serving == rebuild serving end-to-end. "
        "Scale: the code table is 16x smaller than the float store and "
        "is never rebuilt; the exchange carries partitions x Q x "
        "(shortlist+1) rows, never N x Q.",
)
def ann_incremental_pq_search_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ann_index import (
        frozen_pq_codebooks,
        live_pq_codes,
        pq_encode_entries,
        pq_tombstones,
    )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    cb = frozen_pq_codebooks(emb).localCheckpoint(eager=True)  # 128 rows

    base = emb.withColumn("_ver", F.col("vec_id") * 2)
    upd = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        (F.col("vec_id") * 2 + 1).alias("_ver"),
    )
    dels = emb.filter(F.col("vec_id") % 20 == 7).select(
        "vec_id", (F.col("vec_id") * 2 + 1).alias("_ver")
    )
    entries = (
        pq_encode_entries(base, cb)
        .unionByName(pq_encode_entries(upd, cb))
        .unionByName(pq_tombstones(dels))
    )
    live_codes = live_pq_codes(entries).select("vec_id", "codes")

    # The post-CDC vector state feeds the query selection AND the rerank
    # candidates — materialize once (guide §2.4).
    vectors = (
        emb.filter(F.col("vec_id") % 20 != 7)
        .select(
            "vec_id",
            F.when(
                F.col("vec_id") % 10 == 0,
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    queries = (
        vectors.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(512)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    return _adc_serve(live_codes, queries, cb, vectors)


def _incremental_graph_search_oracle() -> str:
    """DuckDB rebuild of the BEAM-SEARCH serving read over the post-CDC
    graph: final latest state, frozen base-snapshot centroids, full
    adjacency rebuild, then the ann_graph_beam_topk beam (entry seeds =
    the base seeding's vec_ids that are still alive, scored with their
    CURRENT embeddings; reverse edges unioned; {h} unrolled hops of
    width {w}; every rank on round(sim,4) + id). The Spark side serves
    the same beam FROM the incrementally-maintained adjacency, so the
    hash match proves CDC -> graph patch -> beam search end-to-end.""" \
        .format(h=_BEAM_HOPS, w=_BEAM_W)
    c_nrm = _NORM_SQL.format(a="c_emb")
    nrm = _NORM_SQL.format(a="embedding")
    f_dot = _DOT_SQL.format(a="f.embedding", b="c.c_emb")
    pair = (f"round({_DOT_SQL.format(a='a.embedding', b='b.embedding')}"
            f" / (a.nrm * b.nrm), 4)")

    def qs(m: str) -> str:
        return (f"round({_DOT_SQL.format(a='q.q_emb', b=f'{m}.embedding')}"
                f" / (q.q_nrm * {m}.nrm), 4)")

    hops = []
    prev = "s0"
    for i in range(1, _BEAM_HOPS + 1):
        hops.append(f"""
    c{i} AS (
      SELECT query_id, vec_id FROM {prev}
      UNION
      SELECT {prev}.query_id, e.dst
      FROM {prev} JOIN edges e ON e.src = {prev}.vec_id
    ),
    s{i} AS (
      SELECT query_id, vec_id, s FROM (
        SELECT c.query_id, c.vec_id, {qs('m')} AS s,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                                  ORDER BY {qs('m')} DESC, c.vec_id) AS rn
        FROM c{i} c
        JOIN f m ON m.vec_id = c.vec_id
        JOIN q ON q.query_id = c.query_id
        WHERE c.vec_id <> c.query_id
      ) WHERE rn <= {_BEAM_W}
    )""")
        prev = f"s{i}"
    hop_sql = ",".join(hops)
    return f"""
    WITH cents AS (
      SELECT vec_id AS seed_id, CAST(vec_id % {_N_CELLS} AS INT) AS cell,
             embedding AS c_emb, {c_nrm} AS c_nrm
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id % {_N_CELLS}
                                         ORDER BY vec_id) AS rn
            FROM embeddings)
      WHERE rn = 1
    ),
    final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 0
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 20 <> 7
    ),
    f AS (SELECT vec_id, embedding, {nrm} AS nrm FROM final),
    assigned AS (
      SELECT vec_id, embedding, nrm, cell FROM (
        SELECT f.vec_id, f.embedding, f.nrm, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY f.vec_id
                 ORDER BY {f_dot} / (f.nrm * c.c_nrm) DESC, c.cell) AS rn
        FROM f CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    edir AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {pair} DESC, b.vec_id) AS rn
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
      ) WHERE rn <= {_BEAM_R}
    ),
    edges AS (SELECT src, dst FROM edir UNION SELECT dst, src FROM edir),
    seeds AS (
      SELECT f.vec_id, f.embedding, f.nrm
      FROM f JOIN cents c ON c.seed_id = f.vec_id
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
          FROM f WHERE vec_id % 100 = 0
          ORDER BY vec_id LIMIT {_Q_MAX}),
    s0 AS (
      SELECT query_id, vec_id, s FROM (
        SELECT q.query_id, m.vec_id, {qs('m')} AS s,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {qs('m')} DESC, m.vec_id) AS rn
        FROM q JOIN seeds m ON m.vec_id <> q.query_id
      ) WHERE rn <= {_BEAM_W}
    ),{hop_sql}
    SELECT query_id, vec_id AS neighbor_id, s AS cos_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, vec_id) AS rn
          FROM {prev})
    WHERE rn <= 5
    ORDER BY query_id, rank
    """


@query(
    "ann_incremental_graph_search_read",
    oracle=_incremental_graph_search_oracle(),
    tags=("similarity", "ann", "graph", "cdc", "incremental-index",
          "serving"),
    doc="Beam-search serving read over the INCREMENTALLY-maintained "
        "kNN-graph (r14 — completes item 1b the way the IVF and PQ "
        "serving reads complete theirs, so ALL maintained ANN state is "
        "now also SERVED from its incremental form): embeddings flow "
        "through the FIXTURES CDC recipe, the packed adjacency is "
        "maintained by touched-cell patches (operators/ann_index.py), "
        "and queries run the ann_graph_beam_topk beam FROM the live "
        "adjacency — edges = exploded neighbor CSVs + reverse union, "
        "entry points = the frozen seeding's vec_ids still alive "
        "(scored with their CURRENT embeddings — a deleted entry point "
        "degrades navigability instead of resurrecting), {h} unrolled "
        "hops of width {w}, every rank on round(sim,4) + id. The "
        "oracle rebuilds adjacency from the final state and runs the "
        "identical beam, so the hash match proves CDC -> patch -> "
        "serve end-to-end; tombstoned nodes can appear in neither the "
        "edge set nor the beam. Scale: edges shuffle 16-byte pairs "
        "once (localCheckpoint, reused per hop); per-round cost is "
        "|Q| x beam x (degree+1), independent of N.".format(
            h=_BEAM_HOPS, w=_BEAM_W),
)
def ann_incremental_graph_search_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ann_index import (
        frozen_centroids,
        graph_adjacency_patch,
        graph_node_rows,
        live_adjacency,
    )
    from ..operators.cdc import latest_state as _latest_state

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    cents = frozen_centroids(emb).localCheckpoint(eager=True)
    seed_ids = (
        emb.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.col("vec_id") % _N_CELLS)
                .orderBy("vec_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id")
    )

    base = emb.select(
        "vec_id", "embedding",
        (F.col("vec_id") * 2).alias("_ver"), F.lit(0).alias("_deleted"),
    )
    delta_changes = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
            (F.col("vec_id") * 2 + 1).alias("_ver"),
            F.lit(0).alias("_deleted"),
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 20 == 7).select(
                "vec_id", "embedding",
                (F.col("vec_id") * 2 + 1).alias("_ver"),
                F.lit(1).alias("_deleted"),
            )
        )
    )
    # (r15 note: submitting independent materialization jobs from a
    # thread pool — guide §2.6 — was A/B'd on a quiet box in three
    # combinations; every overlapped variant was noisier and none
    # reliably beat sequential submission: concurrent AQE planning
    # contends on the driver at this fixed-overhead-bound scale.
    # Kept sequential.)
    nodes1 = graph_node_rows(base, cents).localCheckpoint(eager=True)
    nodes2 = graph_node_rows(delta_changes, cents).localCheckpoint(eager=True)
    # THE post-CDC node state — the relation a production index persists
    # as its serving table — materialized ONCE and shared by: both
    # adjacency patches (as the precomputed ``merged``), the beam's
    # node-scoring side, the entry-point scoring, and the query set
    # (r15, guide §2.4/§5: the old shape ran this corpus-sized version
    # window once inside the patch and then re-derived the same state
    # from parquet a second time for the serving vectors).
    merged = _latest_state(
        nodes1.unionByName(nodes2), ["vec_id"]
    ).localCheckpoint(eager=True)
    # batch 1's merge IS nodes1 (one row per key by construction), so
    # the patch skips its corpus-sized window outright; batch 2's prior
    # state is likewise nodes1 itself — the latest_state(nodes1) wrapper
    # was a per-key window over already-unique keys (r15, guide §2.4).
    adj1 = graph_adjacency_patch(
        nodes1.filter(F.lit(False)), nodes1, seq=1, merged=nodes1
    )
    adj2 = graph_adjacency_patch(nodes1, nodes2, seq=2, merged=merged)
    live = live_adjacency(adj1.unionByName(adj2))

    edir = (
        live.filter(F.col("dst_csv") != "")
        .select(
            "src",
            F.explode(F.split("dst_csv", ",")).alias("dst"),
        )
        .select("src", F.col("dst").cast("long").alias("dst"))
    )
    # The post-CDC vector state: a pure filter+project over the merged
    # checkpoint — free, no separate corpus scan or norm recompute.
    nodes = merged.filter(F.col("_deleted") == 0).select(
        "vec_id", "embedding", "nrm"
    )
    seeds = nodes.join(F.broadcast(seed_ids), "vec_id")
    edges = edir.union(
        edir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)  # reused by every hop
    q = (
        nodes.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(_Q_MAX)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        .localCheckpoint(eager=True)  # bounded: Q_MAX rows
    )
    qsim = F.round(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_nrm") * F.col("nrm")), 4)
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("vec_id"))
    # Per-hop beam materialization + broadcast of the bounded sides —
    # same rationale as in ann_graph_beam_topk: each hop references the
    # beam twice (lineage doubles per hop) and the Q_MAX x _BEAM_W beam
    # is the side that must broadcast, never the edge/node tables
    # (guide §3.1, §3.3/§5).
    beam = (
        F.broadcast(q)
        .join(seeds, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", qsim.alias("s"))
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= _BEAM_W)
        .select("query_id", "vec_id", "s")
        .localCheckpoint(eager=True)
    )
    for _ in range(_BEAM_HOPS):
        cand = (
            beam.select("query_id", "vec_id")
            .union(
                F.broadcast(beam).join(edges, beam.vec_id == edges.src)
                .select("query_id", F.col("dst").alias("vec_id"))
            )
            .distinct()
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        beam = (
            F.broadcast(cand).join(nodes, "vec_id")
            .join(F.broadcast(q), "query_id")
            .select("query_id", "vec_id", qsim.alias("s"))
            .withColumn("rn", F.row_number().over(w_q))
            .filter(F.col("rn") <= _BEAM_W)
            .select("query_id", "vec_id", "s")
            .localCheckpoint(eager=True)
        )
    return (
        beam.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("s").alias("cos_sim"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
