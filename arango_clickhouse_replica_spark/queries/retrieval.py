"""Sparse-retrieval and corpus-statistics operators over ``documents``:
BM25 top-k ranking, TF-IDF weighted cosine near-dup, a Zipf-law slope
fit, tokenizer OOV coverage, a cross-source leakage matrix, and a
prefix-filtering set-similarity join. These extend SURVEY §2.12c (text
analysis) with the classic inverted-index scoring a training-data
pipeline uses for targeted corpus slicing (BM25), weighted near-dup
detection (TF-IDF cosine — catches documents that share *rare* phrasing
where raw Jaccard over-weights stopwords), corpus-health monitoring
(Zipf slope: a healthy natural corpus sits near -1; template/spam
floods flatten it), tokenizer-coverage auditing (OOV), mixture-weight
contamination auditing (leakage matrix), and the AllPairs/PPJoin
blocking family (prefix filter).

Cross-engine determinism (driver hash-compares vs DuckDB):

- Logarithms go through the verified decimal lane (see text_lm.py):
  ``CAST(round(log2(x), 6) AS DECIMAL(18,6))`` — raw log doubles differ
  between the JVM and libm in ~28% of cells.
- Every cross-row sum of non-integer terms is a sum of DECIMALs (exact,
  order-independent); doubles appear only in single per-row expressions
  (products/divisions of deterministic inputs) and final casts.
- Rankings always carry a unique-id tiebreak.

Scale (100 TB):

- All three queries are explode -> hash-aggregate -> equi-join shapes
  with map-side combine; no windows over unbounded partitions.
- BM25's query-term relation is tiny (broadcast); the per-(doc, term)
  tf table is the only wide shuffle and is the same relation an
  inverted index materializes.
- TF-IDF pair generation is shingle-blocked with the SAME dynamic
  hot-shingle document-frequency cap as the Jaccard/MinHash blockers
  (llm_ops._hot_shingle_cap): a shingle in >cap docs carries no
  near-dup signal but costs O(df^2) pairs, so it is dropped before the
  join — the candidate join is never all-pairs.
- The Zipf fit reduces the corpus to its top-100 word frequencies
  (distributed TakeOrderedAndProject), then fits least-squares over
  100 rows of exact decimals — a driver-sized final stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .llm_ops import _DOC_SHINGLES_SQL
from .registry import query
from .text_lm import _DOC_WORDS_SQL, _LOG2_DEC, _LOG2_DEC_SQL, _doc_words

# BM25 free parameters (Robertson-Sparck Jones defaults).
_K1 = 1.2
_B = 0.75

# The query-term set is data-derived but DETERMINISTIC: corpus frequency
# ranks 11-13 (count desc, word asc tiebreak). Mid-rank words are frequent
# enough to hit many documents yet rare enough to have non-trivial idf —
# and the choice replays exactly in both engines for any fixture vintage.
_QTERM_LO, _QTERM_HI = 11, 13


def _corpus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, df_w, c_w): document frequency + corpus frequency per word."""
    words = _doc_words(spark, sf_dir)
    return (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .groupBy("w")
        .agg(F.count("*").alias("df_w"), F.sum("tf").alias("c_w"))
    )


_CORPUS_COUNTS_SQL = f"""
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df_w, CAST(SUM(tf) AS BIGINT) AS c_w
  FROM (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM ({_DOC_WORDS_SQL}) GROUP BY doc_id, w)
  GROUP BY w
"""


# The BM25 scoring CTE chain, shared by text_bm25_topk and the RRF
# fusion oracle (same query-term set, same decimal lanes).
_BM25_PRELUDE_SQL = f"""dw AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM ({_DOC_WORDS_SQL}) GROUP BY doc_id, w
    ),
    cw AS ({_CORPUS_COUNTS_SQL}),
    qterms AS (
      SELECT w, df_w, c_w FROM (
        SELECT w, df_w, c_w, ROW_NUMBER() OVER (ORDER BY c_w DESC, w) AS rnk
        FROM cw
      ) WHERE rnk BETWEEN {_QTERM_LO} AND {_QTERM_HI}
    ),
    dl AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dw GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    idf AS (
      SELECT w, {_LOG2_DEC_SQL.format(
          x="(CAST(n_docs AS DOUBLE) - CAST(df_w AS DOUBLE) + 0.5)"
            " / (CAST(df_w AS DOUBLE) + 0.5) + 1.0")} AS idf_w
      FROM qterms, stats
    ),
    scores AS (
      SELECT dw.doc_id,
             CAST(round(
               CAST(idf.idf_w AS DOUBLE) * CAST(dw.tf AS DOUBLE) * ({_K1} + 1.0)
               / (CAST(dw.tf AS DOUBLE) + {_K1} * (1.0 - {_B}
                  + {_B} * CAST(dl.dl AS DOUBLE) * CAST(stats.n_docs AS DOUBLE)
                        / CAST(stats.total_len AS DOUBLE))),
               6) AS DECIMAL(18,6)) AS term_score
      FROM dw JOIN idf ON dw.w = idf.w
      JOIN dl ON dw.doc_id = dl.doc_id
      CROSS JOIN stats
    ),
    bm25_scores AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
             CAST(SUM(term_score) AS DOUBLE) AS bm25
      FROM scores
      GROUP BY doc_id
    )"""


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH {_BM25_PRELUDE_SQL}
    SELECT doc_id, n_terms_hit, bm25
    FROM bm25_scores
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    tags=("text", "retrieval", "bm25"),
    doc="BM25 top-20 retrieval for a deterministic mid-frequency query-term "
        "set (corpus ranks 11-13): the inverted-index scoring loop as two "
        "hash aggregates plus a broadcast join of the (tiny) query-term "
        "relation against the (doc, term) tf table. Per-term scores round "
        "through the decimal lane so the cross-term sum is exact and "
        "order-independent; idf uses the verified round+DECIMAL log2 lane.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def _query_term_parts(spark: SparkSession, sf_dir: str):
    """(dw, qterms, dl, stats): the per-doc tf table, the deterministic
    rank-11..13 query-term set, doc lengths, and corpus stats — shared
    by BM25 scoring and the query-likelihood ranker in the RRF fusion."""
    words = _doc_words(spark, sf_dir)
    dw = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    cw = dw.groupBy("w").agg(
        F.count("*").alias("df_w"), F.sum("tf").alias("c_w")
    )
    # Top-|hi| head via distributed TakeOrderedAndProject, THEN a window
    # over those few rows — never a global single-partition sort of the
    # whole vocabulary.
    qterms = (
        cw.orderBy(F.desc("c_w"), F.asc("w"))
        .limit(_QTERM_HI)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("c_w"), F.asc("w")))
        )
        .filter(F.col("rnk").between(_QTERM_LO, _QTERM_HI))
        .select("w", "df_w", "c_w")
    )
    dl = dw.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    return dw, qterms, dl, stats


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungated BM25 score relation ``(doc_id, n_terms_hit, bm25)`` over
    the deterministic rank-11..13 query-term set — shared by the top-k
    query above and the RRF fusion below."""
    dw, qterms, dl, stats = _query_term_parts(spark, sf_dir)
    idf = qterms.crossJoin(F.broadcast(stats)).select(
        "w",
        F.expr(_LOG2_DEC.format(
            x="(cast(n_docs as double) - cast(df_w as double) + 0.5)"
              " / (cast(df_w as double) + 0.5) + 1.0")).alias("idf_w"),
    )
    # idf is <= |qterms| rows (tiny) and dl re-broadcasts per doc via an
    # equi-join on doc_id — that join IS the wide shuffle, same key as the
    # tf aggregate, so AQE coalesces them into one exchange.
    scored = (
        dw.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.col("idf_w").cast("double") * F.col("tf").cast("double")
                * F.lit(_K1 + 1.0)
                / (F.col("tf").cast("double") + F.lit(_K1)
                   * (F.lit(1.0 - _B) + F.lit(_B)
                      * F.col("dl").cast("double") * F.col("n_docs").cast("double")
                      / F.col("total_len").cast("double"))),
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
    )


# TF-IDF near-dup: the feature space is word-TRIGRAM shingles WITH
# multiplicity (no array_distinct — tf matters here), restricted to the
# DISCRIMINATIVE shingles (document frequency <= the same dynamic
# GREATEST(5, LEAST(64, n_docs/100)) cap the MinHash/Jaccard blockers
# use) — hot shingles are dropped before weighting, norming, AND
# pairing, so the Spark plan and the oracle agree on the vector space
# itself, and the pair join cost is bounded per shingle. Word-level
# features are a trap on vocabulary-starved corpora: this fixture has
# 31 distinct words with min df = 5% of the corpus, so a word-space
# tf-idf is either vacuous (capped) or quadratic (uncapped).

# Raw (multiplicity-preserving) shingle stream, shared shape with
# _SHINGLES in llm_ops minus the distinct.
_RAW_SHINGLES_SQL = """
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))
           AS s
  FROM documents WHERE len(string_split(text, ' ')) >= 3
"""

_TFIDF_CAP_SQL = ("GREATEST(5, LEAST(64, "
                  "(SELECT COUNT(*) FROM documents) // 100))")

_TFIDF_WEIGHTS_SQL = f"""
  SELECT doc_id, s,
         CAST(round(CAST(tf AS DOUBLE) * CAST({_LOG2_DEC_SQL.format(
             x="CAST(n_docs AS DOUBLE) / CAST(df_s AS DOUBLE)")} AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS wt
  FROM (
    SELECT doc_id, s, tf,
           COUNT(*) OVER (PARTITION BY s) AS df_s,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
    FROM (SELECT doc_id, s, CAST(COUNT(*) AS BIGINT) AS tf
          FROM ({_RAW_SHINGLES_SQL}) GROUP BY doc_id, s)
  )
  WHERE df_s <= {_TFIDF_CAP_SQL}
"""


def _tfidf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-capped tf-idf vector space ``(doc_id, s, wt)`` shared by the
    cosine near-dup join and keyphrase extraction — weights are 6-dp
    decimals (exact cross-engine), shingles past the df cap carry no
    weight (stopword-like AND pair-cost-quadratic, see llm_ops).

    df comes from a window over ``s``, not a separate aggregate joined
    back: the r7 50x profile (docs/SCALING.md) caught the idf JOIN — a
    corpus-sized relation joined onto the corpus-sized tf relation — at
    ~85% of the whole query's wall time; the window needs ONE shuffle of
    the tf relation where the join needed two plus an aggregate.
    ``n_docs`` is the count already collected for the cap — a literal,
    not a crossJoin."""
    from pyspark.sql.window import Window

    from .llm_ops import _hot_shingle_cap

    docs = load_table(spark, "documents", sf_dir)
    raw = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("s"),
        )
    )
    n_docs = docs.count()
    cap = _hot_shingle_cap(n_docs)
    dw = raw.groupBy("doc_id", "s").agg(F.count("*").alias("tf"))
    idf = F.expr(_LOG2_DEC.format(
        x=f"cast({n_docs} as double) / cast(df_s as double)"))
    return (
        dw.withColumn("df_s", F.count("*").over(Window.partitionBy("s")))
        .filter(F.col("df_s") <= cap)
        .withColumn("idf_s", idf)
        .select(
            "doc_id",
            "s",
            F.round(F.col("tf").cast("double") * F.col("idf_s").cast("double"), 6)
            .cast("decimal(18,6)").alias("wt"),
        )
    )


@query(
    "dedup_tfidf_cosine_topk",
    oracle=f"""
    WITH wt AS ({_TFIDF_WEIGHTS_SQL}),
    nrm AS (
      SELECT doc_id,
             sqrt(CAST(SUM(CAST(round(CAST(wt AS DOUBLE) * CAST(wt AS DOUBLE), 6)
                                AS DECIMAL(18,6))) AS DOUBLE)) AS nrm
      FROM wt GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(CAST(round(CAST(a.wt AS DOUBLE) * CAST(b.wt AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS dot,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM wt a JOIN wt b USING (s)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
           round(dot / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM dots
    JOIN nrm na ON na.doc_id = doc_a
    JOIN nrm nb ON nb.doc_id = doc_b
    ORDER BY cos_sim DESC, doc_a, doc_b
    LIMIT 20
    """,
    tags=("dedup", "tfidf", "near-dup"),
    doc="TF-IDF weighted cosine near-dup top-20 over multiplicity-"
        "preserving trigram shingles: complements unweighted shingle "
        "Jaccard by up-weighting rare shared phrasing. Defined entirely "
        "over the discriminative shingles (the same dynamic df cap as "
        "the MinHash blockers), so the shared-shingle pair join is "
        "bounded at O(cap^2) per shingle, never all-pairs. Dot products "
        "and norms sum 6-dp decimals (exact, order-free); cosine is one "
        "double division per pair.",
)
def dedup_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wt (the tf-idf weight relation) feeds THREE consumers (norms + the
    # two pair-join sides) — materialize the tokenize + df/idf pipeline
    # once (guide §2.4).
    wt = _tfidf_weights(spark, sf_dir).localCheckpoint(eager=True)
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("wt").cast("double") * F.col("wt").cast("double"), 6)
                .cast("decimal(18,6)")
            ).cast("double")
        ).alias("nrm")
    )
    a = wt.select(F.col("doc_id").alias("doc_a"), "s", F.col("wt").alias("wa"))
    b = wt.select(F.col("doc_id").alias("doc_b"), "s", F.col("wt").alias("wb"))
    dots = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.round(F.col("wa").cast("double") * F.col("wb").cast("double"), 6)
                .cast("decimal(18,6)")
            ).cast("double").alias("dot"),
            F.count("*").alias("n_shared"),
        )
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_shared",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_a", "doc_b")
        .limit(20)
    )


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH cw AS ({_CORPUS_COUNTS_SQL}),
    ranked AS (
      SELECT c_w, ROW_NUMBER() OVER (ORDER BY c_w DESC, w) AS rnk
      FROM cw
    ),
    pts AS (
      SELECT {_LOG2_DEC_SQL.format(x="CAST(rnk AS DOUBLE)")} AS x,
             {_LOG2_DEC_SQL.format(x="CAST(c_w AS DOUBLE)")} AS y
      FROM ranked WHERE rnk <= 100
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n AS n_points,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope
    FROM sums
    """,
    tags=("text", "stats", "zipf"),
    doc="Zipf-law slope over the top-100 word frequencies: least-squares "
        "fit of log2(freq) on log2(rank). A natural corpus fits near -1; "
        "template floods and boilerplate flatten the head — a standard "
        "corpus-health monitor. The corpus reduces to 100 (rank, freq) "
        "points via distributed top-k; the fit itself sums exact decimals "
        "(manual least squares — built-in regr_slope accumulates raw "
        "doubles in partition order and is not replayable cross-engine).",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    cw = _corpus_counts(spark, sf_dir)
    # Distributed top-100 first; the rank window then runs over 100 rows.
    ranked = (
        cw.orderBy(F.desc("c_w"), F.asc("w"))
        .limit(100)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("c_w"), F.asc("w")))
        )
    )
    pts = ranked.select(
        F.expr(_LOG2_DEC.format(x="cast(rnk as double)")).alias("x"),
        F.expr(_LOG2_DEC.format(x="cast(c_w as double)")).alias("y"),
    )
    sums = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("y").cast("double"), 6)
            .cast("decimal(18,6)")
        ).cast("double").alias("sxy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("x").cast("double"), 6)
            .cast("decimal(18,6)")
        ).cast("double").alias("sxx"),
    )
    return sums.select(
        F.col("n").alias("n_points"),
        F.round(
            (F.col("n").cast("double") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


# Deterministic vocabulary head for OOV measurement: the most frequent
# CEIL(2/3 * |vocab|) words by (count desc, word asc) — a RELATIVE head,
# not an absolute top-N, so the check is non-vacuous on any corpus (a
# fixed top-1000 head swallows this fixture's entire 31-word vocabulary
# and reports 0% OOV everywhere; a production run would pin the real
# tokenizer's vocab here instead).
_OOV_VOCAB_FRAC_NUM, _OOV_VOCAB_FRAC_DEN = 2, 3


@query(
    "text_oov_rate",
    oracle=f"""
    WITH cw AS ({_CORPUS_COUNTS_SQL}),
    vocab AS (
      SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c_w DESC, w) AS rnk FROM cw
      ) WHERE rnk <= CAST(ceil((SELECT COUNT(*) FROM cw)
                               * {_OOV_VOCAB_FRAC_NUM}.0
                               / {_OOV_VOCAB_FRAC_DEN}) AS BIGINT)
    ),
    dw AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM ({_DOC_WORDS_SQL}) GROUP BY doc_id, w
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN dw.c ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.w IS NULL THEN dw.c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(dw.c) AS DOUBLE) AS oov_rate
    FROM dw LEFT JOIN vocab v ON dw.w = v.w
    GROUP BY dw.doc_id
    """,
    tags=("text", "tokenizer", "quality"),
    doc="Tokenizer-coverage check: per-document out-of-vocabulary token "
        "rate against the deterministic top-2/3 vocabulary head "
        "(count desc, word tiebreak; relative so the check is "
        "non-vacuous on any corpus — production pins the tokenizer's "
        "actual vocab) — the pre-training sanity pass that catches "
        "corpora a fixed tokenizer cannot represent. The vocab head is "
        "distributed top-k, then joined (left) against per-doc word "
        "counts with NO broadcast hint: the head is a RELATIVE vocab "
        "fraction, so it grows with the corpus (Heaps' law) — AQE "
        "broadcasts it while node-resident (the corpus then never "
        "reshuffles for the lookup) and falls back to a partitioned "
        "join beyond; a production run pinning a fixed tokenizer vocab "
        "re-guarantees the broadcast at any scale. The rate is "
        "exact-integer counts with one final division.",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    words = _doc_words(spark, sf_dir)
    dw = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    cw = dw.groupBy("w").agg(F.sum("c").alias("c_w"))
    # |vocab| is the aggregated vocabulary cardinality (tiny vs corpus);
    # the scalar head size keeps the top-k a distributed
    # TakeOrderedAndProject.
    head = math.ceil(
        cw.count() * _OOV_VOCAB_FRAC_NUM / _OOV_VOCAB_FRAC_DEN
    )
    vocab = (
        cw.orderBy(F.desc("c_w"), F.asc("w"))
        .limit(head)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    oov_c = F.when(F.col("in_vocab").isNull(), F.col("c")).otherwise(F.lit(0))
    return (
        dw.join(vocab, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(oov_c).alias("n_oov"),
        )
        .select(
            "doc_id", "n_tokens", "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"))
            .alias("oov_rate"),
        )
    )


@query(
    "text_cross_source_dup_matrix",
    oracle="""
    WITH fp AS (
      SELECT DISTINCT md5(text) AS fp, source FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fingerprints
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("curation", "dedup", "contamination"),
    doc="Cross-source duplication matrix: for every source pair, how many "
        "exact content fingerprints they share — the leakage/overlap "
        "diagnostic run before assigning mixture weights (a duplicate "
        "inside one source is benign; the same document in two sources "
        "double-counts its domain). Distinct (fingerprint, source) "
        "first (one hash aggregate), then a self-equi-join on the "
        "fingerprint key — each fingerprint contributes at most "
        "C(n_sources, 2) pairs, so the join output is bounded by the "
        "source count, never quadratic in documents.",
)
def text_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # Materialized before the self-join — both sides would otherwise
    # re-execute the md5 + distinct (guide §2.4).
    fp = (
        docs.select(F.md5("text").alias("fp"), "source").distinct()
        .localCheckpoint(eager=True)
    )
    a = fp.select("fp", F.col("source").alias("source_a"))
    b = fp.select("fp", F.col("source").alias("source_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_fingerprints"))
        .orderBy("source_a", "source_b")
    )


# Prefix-filtering set-similarity join (AllPairs/PPJoin family): the
# OTHER canonical blocking strategy besides the hot-term df cap. Set
# elements are globally ordered rarest-first; the exact AllPairs bound
# says two sets with Jaccard >= t MUST share an element inside each
# other's first |s| - ceil(t*|s|) + 1 elements, so the THRESHOLD-derived
# prefix used here is a COMPLETE blocker: every pair with Jaccard >= t
# is generated as a candidate (r4 verdict item #4 — the earlier fixed
# 3-element prefix was only a heuristic). Why: J(a,b) >= t implies
# n_common >= t/(1+t) * (|a|+|b|) >= ceil(t*|a|) elements in common
# (for |b| >= |a|), and a set disjoint from the other's prefix can
# overlap it in at most |a| - prefix_len = ceil(t*|a|) - 1 elements —
# contradiction (the AllPairs lemma, Bayardo et al., WWW'07).
#
# Arithmetic is EXACT-integer end to end so the bound cannot be lost to
# float rounding and both engines agree bit-for-bit: with t = NUM/DEN,
# ceil(t*n) = (NUM*n + DEN - 1) // DEN, and the final J >= t filter is
# n_common * DEN >= (na + nb - n_common) * NUM. (Naively ceil(0.8*n)
# in doubles yields 33 for n=40 — 0.8*40 rounds above 32 — silently
# SHORTENING the prefix below the completeness bound.)
#
# Hot elements still never generate candidates: a rare element's doc
# list is short BY DEFINITION — the selectivity the df cap enforces
# externally, prefix filtering gets from the rarest-first ordering.
#
# The element space is word-TRIGRAM shingles, not words: prefix
# filtering is only as selective as its rarest features, and a
# vocabulary-starved corpus (this fixture: 31 distinct words, min word
# df = 5% of the corpus) makes every word hot — measured 105 s at sf0.1
# on words vs ~2 s on shingles, whose feature space grows with the
# corpus (27k shingles at sf0.1, max df 25).
_PREFIX_T_NUM, _PREFIX_T_DEN = 4, 5  # stated Jaccard threshold t = 0.8


def _prefix_candidates(tok: DataFrame) -> DataFrame:
    """Distinct candidate pairs from the threshold-derived rarest-first
    prefixes of ``tok`` (a distinct ``(doc_id, s)`` relation). Document
    frequencies and prefix lengths are computed over ``tok`` itself, so
    the same complete AllPairs bound holds for any survivor subset."""
    df_s = tok.groupBy("s").agg(F.count("*").alias("df_s"))
    w_rare = Window.partitionBy("doc_id").orderBy(F.asc("df_s"), F.asc("s"))
    w_doc = Window.partitionBy("doc_id")
    # prefix_len = n_tok - ceil(t*n_tok) + 1, exact integers; the size
    # count rides the same doc_id exchange as the rank window
    plen = (
        F.col("n_tok")
        - F.expr(f"({_PREFIX_T_NUM} * n_tok + {_PREFIX_T_DEN} - 1) "
                 f"div {_PREFIX_T_DEN}")
        + F.lit(1)
    )
    prefix = (
        tok.join(df_s, "s")
        .withColumn("rn", F.row_number().over(w_rare))
        .withColumn("n_tok", F.count("*").over(w_doc))
        .filter(F.col("rn") <= plen)
        .select("doc_id", "s")
    )
    return (
        prefix.alias("a")
        .join(prefix.alias("b"), "s")
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def _prefix_verified_pairs(tok: DataFrame, cand: DataFrame | None = None) -> DataFrame:
    """Complete threshold-prefix set-similarity join over ``tok``:
    candidates from :func:`_prefix_candidates` (or a precomputed
    ``cand``), exact shingle-set Jaccard verification via one in-row
    ``array_intersect`` per pair, cross-multiplied integer J >= t
    filter. Returns every qualifying pair
    ``(doc_a, doc_b, n_common, jaccard)``, unordered."""
    if cand is None:
        cand = _prefix_candidates(tok)
    # Verification via per-document shingle SETS (sorted arrays) and one
    # array_intersect per candidate pair: the explode-join variant
    # re-expanded every pair by |doc shingles| and shuffled that blown-up
    # relation into a count aggregate (measured 5.2x at 10x data, where
    # verbatim-duplicate replicas multiply the candidate count); here a
    # pair costs two hash-join lookups and one in-row intersection —
    # cardinality never exceeds |cand|.
    arrs = tok.groupBy("doc_id").agg(F.sort_array(F.collect_list("s")).alias("toks"))
    aa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    ab = arrs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    n_common = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    return (
        cand.join(aa, "doc_a").join(ab, "doc_b")
        .select(
            "doc_a", "doc_b", n_common.alias("n_common"),
            F.size("toks_a").cast("long").alias("na"),
            F.size("toks_b").cast("long").alias("nb"),
        )
        .filter(
            F.col("n_common") * _PREFIX_T_DEN
            >= (F.col("na") + F.col("nb") - F.col("n_common")) * _PREFIX_T_NUM
        )
        .select(
            "doc_a", "doc_b", "n_common",
            (F.col("n_common").cast("double")
             / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"))
            .alias("jaccard"),
        )
    )


def _survivor_shingles(
    spark: SparkSession, sf_dir: str, dropped: DataFrame | None = None
) -> DataFrame:
    """Distinct ``(doc_id, s)`` shingles restricted to LSH-cluster
    SURVIVORS — every document except non-canonical near-dup cluster
    members (the keep-list rule, quality_filters.py). The anti-join side
    is the (small) cluster relation, recomputed per build (r14: the
    session memo is gone). Callers that already hold the dropped-doc
    relation pass it in so ONE LSH + connected-components execution
    serves the whole build (each ``clusters_relation`` call re-runs the
    pipeline now that the memo is removed)."""
    from .llm_ops import _doc_shingles, clusters_relation

    if dropped is None:
        dropped = (
            clusters_relation(spark, sf_dir)
            .filter(F.col("is_canonical") == 0)
            .select("doc_id")
        )
    return (
        _doc_shingles(spark, sf_dir).distinct()
        .join(dropped, "doc_id", "left_anti")
    )


def prefix_filter_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking stage of ``dedup_prefix_filter_pairs`` — exposed for
    the scale probes' candidate counting."""
    from .llm_ops import _doc_shingles

    return _prefix_candidates(_doc_shingles(spark, sf_dir).distinct())


def prefix_filter_clustered_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking stage of ``dedup_prefix_filter_clustered`` — exposed
    for the scale probes' candidate counting."""
    return _prefix_candidates(_survivor_shingles(spark, sf_dir))


@query(
    "dedup_prefix_filter_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, s FROM ({_DOC_SHINGLES_SQL})
    ),
    df AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS df_s FROM tok GROUP BY s
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id
    ),
    prefix AS (
      SELECT doc_id, s FROM (
        SELECT t.doc_id, t.s,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                  ORDER BY d.df_s ASC, t.s ASC) AS rn,
               COUNT(*) OVER (PARTITION BY t.doc_id) AS n_tok
        FROM tok t JOIN df d USING (s)
      ) WHERE rn <= n_tok - ({_PREFIX_T_NUM} * n_tok + {_PREFIX_T_DEN} - 1)
                            // {_PREFIX_T_DEN} + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b USING (s)
      WHERE a.doc_id < b.doc_id
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b AND tb.s = ta.s
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE)
             / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * {_PREFIX_T_DEN}
            >= (sa.n_tok + sb.n_tok - n_common) * {_PREFIX_T_NUM}
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 20
    """,
    tags=("dedup", "prefix-filter", "near-dup"),
    doc="Set-similarity join via threshold-derived prefix filtering (the "
        "exact AllPairs/PPJoin bound) over word-trigram shingle sets: "
        "global rarest-first shingle order, candidates from each "
        "document's first |s| - ceil(t*|s|) + 1 rarest shingles with "
        "t = 0.8, exact shingle-set Jaccard verification, J >= t filter, "
        "top-20. The prefix length makes the blocker COMPLETE — every "
        "pair with Jaccard >= t shares a prefix shingle (property-tested "
        "against brute force) — and all arithmetic is exact-integer "
        "(ceil via (4n+4)//5, the threshold filter cross-multiplied) so "
        "the bound survives float rounding identically in both engines. "
        "A rare shingle's doc list is short by definition, so the "
        "candidate join stays bounded; jaccard is one final division.",
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_ops import _doc_shingles

    tok = _doc_shingles(spark, sf_dir).distinct()
    return (
        _prefix_verified_pairs(tok)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


# SQL body of the complete prefix-filter join, parameterized by the name
# of a distinct (doc_id, s) CTE — shared verbatim between the full-corpus
# oracle above and the clustered composition below so both engines agree
# on the AllPairs arithmetic by construction.
def _prefix_pairs_sql(tok_cte: str) -> str:
    return f"""
    df AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS df_s FROM {tok_cte} GROUP BY s
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM {tok_cte} GROUP BY doc_id
    ),
    prefix AS (
      SELECT doc_id, s FROM (
        SELECT t.doc_id, t.s,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                  ORDER BY d.df_s ASC, t.s ASC) AS rn,
               COUNT(*) OVER (PARTITION BY t.doc_id) AS n_tok
        FROM {tok_cte} t JOIN df d USING (s)
      ) WHERE rn <= n_tok - ({_PREFIX_T_NUM} * n_tok + {_PREFIX_T_DEN} - 1)
                            // {_PREFIX_T_DEN} + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b USING (s)
      WHERE a.doc_id < b.doc_id
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN {tok_cte} ta ON ta.doc_id = c.doc_a
      JOIN {tok_cte} tb ON tb.doc_id = c.doc_b AND tb.s = ta.s
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE)
               / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common * {_PREFIX_T_DEN}
              >= (sa.n_tok + sb.n_tok - n_common) * {_PREFIX_T_NUM}
    )
    """


@query(
    "dedup_prefix_filter_clustered",
    oracle=None,  # composed below from the clusters oracle at import time
    tags=("dedup", "prefix-filter", "near-dup", "composition"),
    doc="The dup-dense-safe COMPLETE dedup composition (round-5 verdict "
        "item #2): collapse near-dup mass with the cheap LSH cluster "
        "family first (dedup_near_dup_clusters — keep only canonical "
        "members, the keep-list rule), THEN run the complete "
        "threshold-prefix AllPairs verify (t = 0.8, exact-integer "
        "arithmetic, same bound as dedup_prefix_filter_pairs) within "
        "the survivors. Output is the composition's stage funnel: "
        "docs_total -> docs_dropped_by_lsh -> survivors -> "
        "prefix_candidates (blocking-stage volume among survivors) -> "
        "residual_pairs (J >= 0.8 pairs the probabilistic LSH bands "
        "MISSED — the complete pass doubles as a banding-false-negative "
        "audit; 0 on this fixture = measured recall 1.0, consistent "
        "with dedup_lsh_precision_report). The O(true pairs) cost of "
        "the full prefix join is paid only on the post-collapse corpus: "
        "on a dup-dense input the survivor set is the distinct-content "
        "corpus, so candidate volume is bounded by distinct content, "
        "not by replica count (the 50x salted probe measures this). "
        "Cost beyond the shared cached cluster relation: one anti-join "
        "plus the prefix pipeline on the (smaller) survivor shingle "
        "relation; each funnel row is a 1-row count aggregate.",
)
def dedup_prefix_filter_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    from .llm_ops import clusters_relation

    # ONE clusters_relation execution per build: the dropped list feeds
    # both the funnel stages and the survivor shingles (r14: with the
    # session memo removed, a second call re-ran the whole LSH +
    # connected-components pipeline — measured 15.9s vs 9.6s isolated).
    dropped = (
        clusters_relation(spark, sf_dir)
        .filter(F.col("is_canonical") == 0)
        .select("doc_id")
    )
    tok = _survivor_shingles(spark, sf_dir, dropped=dropped).localCheckpoint(
        eager=True
    )
    cand = _prefix_candidates(tok)
    residual = _prefix_verified_pairs(tok, cand)

    def stage(ord_: int, name: str, rel: DataFrame) -> DataFrame:
        return rel.agg(F.count("*").cast("long").alias("n")).select(
            F.lit(ord_).cast("int").alias("stage_ord"),
            F.lit(name).alias("stage"),
            "n",
        )

    n_docs = stage(1, "docs_total", docs)
    n_drop = stage(2, "docs_dropped_by_lsh", dropped)
    n_surv = stage(3, "survivors", docs.join(dropped, "doc_id", "left_anti"))
    n_cand = stage(4, "prefix_candidates", cand)
    n_resid = stage(5, "residual_pairs", residual)
    return (
        n_docs.unionAll(n_drop).unionAll(n_surv).unionAll(n_cand)
        .unionAll(n_resid)
        .orderBy("stage_ord")
    )


def _install_clustered_prefix_oracle() -> None:
    from dataclasses import replace

    from .registry import QUERIES as _Q

    clusters = _Q["dedup_near_dup_clusters"].oracle
    # AS MATERIALIZED: tok is referenced 4x inside the prefix SQL and
    # dropped 3x; without the hint DuckDB inlines the whole recursive
    # cluster chain at every reference (measured 13.7s -> 0.7s at sf0.01).
    oracle = f"""
    WITH clusters AS MATERIALIZED ({clusters}),
    tok0 AS (
      SELECT DISTINCT doc_id, s FROM ({_DOC_SHINGLES_SQL})
    ),
    dropped AS MATERIALIZED (SELECT doc_id FROM clusters WHERE is_canonical = 0),
    tok AS MATERIALIZED (
      SELECT t.doc_id, t.s FROM tok0 t
      LEFT JOIN dropped x USING (doc_id)
      WHERE x.doc_id IS NULL
    ),
    {_prefix_pairs_sql("tok")}
    SELECT CAST(stage_ord AS INT) AS stage_ord, stage, CAST(n AS BIGINT) AS n
    FROM (
      SELECT 1 AS stage_ord, 'docs_total' AS stage,
             (SELECT COUNT(*) FROM documents) AS n
      UNION ALL
      SELECT 2, 'docs_dropped_by_lsh', (SELECT COUNT(*) FROM dropped)
      UNION ALL
      SELECT 3, 'survivors',
             (SELECT COUNT(*) FROM documents d
              LEFT JOIN dropped x ON x.doc_id = d.doc_id
              WHERE x.doc_id IS NULL)
      UNION ALL
      SELECT 4, 'prefix_candidates', (SELECT COUNT(*) FROM cand)
      UNION ALL
      SELECT 5, 'residual_pairs', (SELECT COUNT(*) FROM verified)
    )
    ORDER BY stage_ord
    """
    _Q["dedup_prefix_filter_clustered"] = replace(
        _Q["dedup_prefix_filter_clustered"], oracle=oracle
    )


_install_clustered_prefix_oracle()


# Vocabulary head sizes measured by the coverage curve, as fractions of
# the aggregated vocabulary (relative, like the OOV head — see above).
_COVERAGE_FRACS = (25, 50, 75)


@query(
    "text_vocab_coverage_curve",
    oracle=f"""
    WITH cw AS ({_CORPUS_COUNTS_SQL}),
    tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_total,
                   CAST(COUNT(*) AS BIGINT) AS v FROM cw),
    ranked AS (
      SELECT c_w, ROW_NUMBER() OVER (ORDER BY c_w DESC, w) AS rnk FROM cw
    ),
    pts AS (
      SELECT f.pct,
             CAST(ceil(tot.v * f.pct / 100.0) AS BIGINT) AS head_size,
             tot.n_total
      FROM (SELECT unnest([{", ".join(str(p) for p in _COVERAGE_FRACS)}])
                   AS pct) f, tot
    )
    SELECT CAST(pts.pct AS INT) AS vocab_pct, pts.head_size,
           CAST(SUM(r.c_w) AS BIGINT) AS covered_tokens,
           pts.n_total AS total_tokens,
           CAST(SUM(r.c_w) AS DOUBLE) / CAST(pts.n_total AS DOUBLE)
             AS coverage
    FROM pts JOIN ranked r ON r.rnk <= pts.head_size
    GROUP BY pts.pct, pts.head_size, pts.n_total
    ORDER BY vocab_pct
    """,
    tags=("text", "tokenizer", "vocab"),
    doc="Vocabulary coverage curve: what fraction of all corpus tokens "
        "the top-25/50/75% vocabulary heads cover — the token-coverage "
        "vs vocab-size trade a tokenizer-sizing decision reads (a steep "
        "curve = small vocab suffices; flat = long tail matters). The "
        "corpus reduces to the aggregated vocabulary once; each curve "
        "point is a bounded-rank aggregate over that (small) relation, "
        "attached to the 1-row total by broadcast.",
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    cw = _corpus_counts(spark, sf_dir)
    v, n_total = cw.agg(
        F.count("*").alias("v"), F.sum("c_w").alias("t")
    ).collect()[0]
    # Never rank the full vocabulary through one unpartitioned window:
    # the largest requested head bounds every curve point, so take the
    # top-(max head) first — orderBy().limit() is a DISTRIBUTED top-k
    # (per-partition heads, bounded merge) — and only then row_number
    # over that bounded relation (same discipline as text_bm25_topk).
    max_head = max(math.ceil(v * pct / 100.0) for pct in _COVERAGE_FRACS)
    top = cw.orderBy(F.desc("c_w"), F.asc("w")).limit(max_head)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("c_w"), F.asc("w")))
    )
    parts = []
    for pct in _COVERAGE_FRACS:
        head = math.ceil(v * pct / 100.0)
        parts.append(
            ranked.filter(F.col("rnk") <= head).agg(
                F.lit(pct).cast("int").alias("vocab_pct"),
                F.lit(head).cast("long").alias("head_size"),
                F.sum("c_w").alias("covered_tokens"),
                F.lit(n_total).cast("long").alias("total_tokens"),
                (F.sum("c_w").cast("double") / F.lit(float(n_total)))
                .alias("coverage"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("vocab_pct")


@query(
    "text_keyphrase_tfidf_topk",
    oracle=f"""
    WITH wt AS ({_TFIDF_WEIGHTS_SQL}),
    r AS (
      SELECT doc_id, s, wt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY wt DESC, s) AS rn
      FROM wt
    )
    SELECT doc_id, CAST(rn AS INT) AS rank, s AS phrase,
           CAST(wt AS DOUBLE) AS tfidf
    FROM r WHERE rn <= 3
    """,
    tags=("text", "retrieval", "keywords", "llm-pipeline"),
    doc="Keyphrase extraction: each document's top-3 trigram phrases by "
        "tf-idf weight in the SAME df-capped decimal vector space the "
        "cosine near-dup join uses (_tfidf_weights — compute the space "
        "once, serve retrieval AND dedup AND labeling from it). This is "
        "the cheap auto-labeling pass a curation pipeline runs to build "
        "topic facets or weak supervision tags. Determinism: weights "
        "are exact 6-dp decimals, rank ties break on the phrase string. "
        "Scale: tf/df are map-side-combinable hash aggregates; the "
        "top-3 window partitions BY DOCUMENT, so partition size is "
        "bounded by a single document's distinct shingles — never an "
        "unbounded key.",
)
def text_keyphrase_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    wt = _tfidf_weights(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("wt"), F.asc("s"))
    return (
        wt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            F.col("rn").cast("int").alias("rank"),
            F.col("s").alias("phrase"),
            F.col("wt").cast("double").alias("tfidf"),
        )
    )


# Reciprocal-rank-fusion constant (Cormack et al. 2009's k=60).
_RRF_K = 60
# Jelinek-Mercer interpolation for the query-likelihood ranker.
_QL_LAMBDA = 0.5
# Per-ranker candidate-list depth fused by RRF.
_RRF_DEPTH = 50


@query(
    "text_rrf_fusion",
    oracle=f"""
    WITH {_BM25_PRELUDE_SQL},
    ql AS (
      SELECT dl.doc_id,
             CAST(SUM({_LOG2_DEC_SQL.format(
                 x="0.5 * CAST(COALESCE(dw.tf, 0) AS DOUBLE)"
                   " / CAST(dl.dl AS DOUBLE)"
                   " + 0.5 * CAST(q.c_w AS DOUBLE)"
                   " / CAST(stats.total_len AS DOUBLE)")}) AS DOUBLE) AS ql
      FROM dl CROSS JOIN qterms q CROSS JOIN stats
      LEFT JOIN dw ON dw.doc_id = dl.doc_id AND dw.w = q.w
      GROUP BY dl.doc_id
    ),
    rb AS (
      SELECT doc_id, rnk FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM bm25_scores
      ) WHERE rnk <= {_RRF_DEPTH}
    ),
    rq AS (
      SELECT doc_id, rnk FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ql DESC, doc_id) AS rnk
        FROM ql
      ) WHERE rnk <= {_RRF_DEPTH}
    )
    SELECT COALESCE(rb.doc_id, rq.doc_id) AS doc_id,
           CAST(rb.rnk AS INTEGER) AS bm25_rank,
           CAST(rq.rnk AS INTEGER) AS ql_rank,
           round(COALESCE(1.0 / ({_RRF_K} + rb.rnk), 0.0)
                 + COALESCE(1.0 / ({_RRF_K} + rq.rnk), 0.0), 6) AS rrf
    FROM rb FULL OUTER JOIN rq ON rb.doc_id = rq.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 20
    """,
    tags=("text", "retrieval", "fusion"),
    doc="Hybrid-retrieval reciprocal-rank fusion (Cormack et al. 2009, "
        "the standard BM25+semantic combiner in production search): two "
        "independent rankers over the same deterministic query-term set "
        "— BM25 (shared _bm25_scores relation) and a Jelinek-Mercer "
        "query-likelihood LM (lambda=0.5, per-term log2 through the "
        "decimal lane, absent terms carried by the corpus background) — "
        "each cut to a depth-50 list via distributed "
        "TakeOrderedAndProject + a window over those 50 rows, then "
        "fused with 1/(60+rank) and re-ranked. Rank fusion needs no "
        "score calibration, which is why it survives mixing lexical "
        "and LM scores; 1/(60+rank) over small-integer ranks is "
        "IEEE-exact in both engines. Scale: per-ranker candidate "
        "lists are O(depth) rows regardless of corpus size, so the "
        "fusion join is trivially bounded; the QL scan is one "
        "O(N x |qterms|) narrow pass.",
)
def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    dw, qterms, dl, stats = _query_term_parts(spark, sf_dir)

    # Query-likelihood: every (doc, qterm) cell, absent terms tf=0.
    cells = (
        dl.crossJoin(F.broadcast(qterms.select("w", "c_w")))
        .crossJoin(F.broadcast(stats))
        .join(dw, ["doc_id", "w"], "left")
    )
    ql = (
        cells.select(
            "doc_id",
            F.expr(_LOG2_DEC.format(
                x=f"{_QL_LAMBDA} * cast(coalesce(tf, 0) as double)"
                  " / cast(dl as double)"
                  f" + {1 - _QL_LAMBDA} * cast(c_w as double)"
                  " / cast(total_len as double)")).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(F.sum("lp").cast("double").alias("ql"))
    )

    def ranked(rel: DataFrame, score: str, out: str) -> DataFrame:
        top = rel.orderBy(F.desc(score), F.asc("doc_id")).limit(_RRF_DEPTH)
        w = Window.orderBy(F.desc(score), F.asc("doc_id"))
        return top.withColumn(out, F.row_number().over(w).cast("int")) \
            .select("doc_id", out)

    rb = ranked(_bm25_scores(spark, sf_dir), "bm25", "bm25_rank")
    rq = ranked(ql, "ql", "ql_rank")
    contrib = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(c)), F.lit(0.0))
    return (
        rb.join(rq, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "ql_rank",
            F.round(contrib("bm25_rank") + contrib("ql_rank"), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(20)
    )


# Self-retrieval query set: one query per sampled document (bounded by
# a CONSTANT, the ANN Q_MAX discipline), 3 rarest terms per query doc.
_MRR_Q_MOD = 40
_MRR_Q_MAX = 128
_MRR_N_TERMS = 3
_MRR_K = 10


@query(
    "text_self_retrieval_mrr",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM ({_DOC_WORDS_SQL}) GROUP BY doc_id, w
    ),
    cw AS ({_CORPUS_COUNTS_SQL}),
    dl AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dw GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    qdocs AS (
      SELECT doc_id AS q FROM documents WHERE doc_id % {_MRR_Q_MOD} = 0
      ORDER BY doc_id LIMIT {_MRR_Q_MAX}
    ),
    qterms AS (
      SELECT q, w FROM (
        SELECT qd.q, dw.w,
               ROW_NUMBER() OVER (PARTITION BY qd.q
                                  ORDER BY cw.df_w ASC, dw.w) AS rn
        FROM qdocs qd
        JOIN dw ON dw.doc_id = qd.q
        JOIN cw ON cw.w = dw.w
      ) WHERE rn <= {_MRR_N_TERMS}
    ),
    idf AS (
      SELECT w, {_LOG2_DEC_SQL.format(
          x="(CAST(n_docs AS DOUBLE) - CAST(df_w AS DOUBLE) + 0.5)"
            " / (CAST(df_w AS DOUBLE) + 0.5) + 1.0")} AS idf_w
      FROM cw, stats
      WHERE w IN (SELECT DISTINCT w FROM qterms)
    ),
    scores AS (
      SELECT qt.q, dw.doc_id,
             CAST(SUM(CAST(round(
               CAST(idf.idf_w AS DOUBLE) * CAST(dw.tf AS DOUBLE) * ({_K1} + 1.0)
               / (CAST(dw.tf AS DOUBLE) + {_K1} * (1.0 - {_B}
                  + {_B} * CAST(dl.dl AS DOUBLE) * CAST(stats.n_docs AS DOUBLE)
                        / CAST(stats.total_len AS DOUBLE))),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM qterms qt
      JOIN dw ON dw.w = qt.w
      JOIN idf ON idf.w = qt.w
      JOIN dl ON dl.doc_id = dw.doc_id
      CROSS JOIN stats
      GROUP BY qt.q, dw.doc_id
    ),
    ranked AS (
      SELECT q, doc_id,
             ROW_NUMBER() OVER (PARTITION BY q
                                ORDER BY bm25 DESC, doc_id) AS rnk
      FROM scores
    )
    SELECT qd.q AS query_doc,
           CAST(COALESCE(MAX(CASE WHEN r.doc_id = qd.q
                              AND r.rnk <= {_MRR_K}
                         THEN r.rnk END), 0) AS BIGINT) AS self_rank,
           COALESCE(MAX(CASE WHEN r.doc_id = qd.q AND r.rnk <= {_MRR_K}
                        THEN round(1.0 / r.rnk, 6) END), 0.0) AS rr
    FROM qdocs qd LEFT JOIN ranked r ON r.q = qd.q
    GROUP BY qd.q
    ORDER BY query_doc
    """,
    tags=("text", "retrieval", "evaluation", "report", "llm-pipeline"),
    doc="Self-retrieval MRR audit — the index sanity check a RAG/"
        "retrieval pipeline runs before trusting its chunking+scoring "
        "stack (each sampled document queried by its own 3 RAREST terms "
        "must rank itself highly; a drop flags tokenizer, dedup-rewrite "
        "or index corruption): per query document (doc_id % 40 slice "
        "capped at a CONSTANT 128 — the ANN Q_MAX discipline), BM25-"
        "score the 3 lowest-document-frequency terms (word-asc "
        "tiebreak) against the corpus and report the document's own "
        "rank (0 if outside top-10) and reciprocal rank. Per-term "
        "scores ride the 6-dp decimal lane; idf uses the verified "
        "round+DECIMAL log2 lane; ranks tiebreak on doc_id. Scale: the "
        "query-term relation is <= 3*128 rows (broadcast); the scoring "
        "join hits only documents containing a query term (rare terms "
        "-> small df postings, the inverted-index access path); one "
        "groupBy (q, doc) + a q-partitioned rank window over those "
        "postings.",
)
def text_self_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = _doc_words(spark, sf_dir)
    # dw (the doc-term matrix) feeds FOUR consumers (corpus stats, doc
    # lengths, query-term pick, scoring join) — materialize so the text
    # tokenize + explode + groupBy runs once, not per reference
    # (guide §2.4).
    dw = (
        words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    cw = dw.groupBy("w").agg(
        F.count("*").alias("df_w"), F.sum("tf").alias("c_w")
    )
    dl = dw.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qdocs = (
        docs.filter(F.col("doc_id") % _MRR_Q_MOD == 0)
        .orderBy("doc_id")
        .limit(_MRR_Q_MAX)
        .select(F.col("doc_id").alias("q"))
    )
    w_rare = Window.partitionBy("q").orderBy(F.asc("df_w"), F.asc("w"))
    qterms = (
        F.broadcast(qdocs)
        .join(dw, F.col("doc_id") == F.col("q"))
        .join(cw, "w")
        .withColumn("rn", F.row_number().over(w_rare))
        .filter(F.col("rn") <= _MRR_N_TERMS)
        .select("q", "w")
    )
    idf = (
        cw.join(F.broadcast(qterms.select("w").distinct()), "w")
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.expr(_LOG2_DEC.format(
                x="(cast(n_docs as double) - cast(df_w as double) + 0.5)"
                  " / (cast(df_w as double) + 0.5) + 1.0")).alias("idf_w"),
        )
    )
    scores = (
        dw.join(F.broadcast(qterms), "w")
        .join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "q", "doc_id",
            F.round(
                F.col("idf_w").cast("double") * F.col("tf").cast("double")
                * F.lit(_K1 + 1.0)
                / (F.col("tf").cast("double") + F.lit(_K1)
                   * (F.lit(1.0 - _B) + F.lit(_B)
                      * F.col("dl").cast("double")
                      * F.col("n_docs").cast("double")
                      / F.col("total_len").cast("double"))),
                6,
            ).cast("decimal(18,6)").alias("term_score"),
        )
        .groupBy("q", "doc_id")
        .agg(F.sum("term_score").cast("double").alias("bm25"))
    )
    w_rank = Window.partitionBy("q").orderBy(F.desc("bm25"), F.asc("doc_id"))
    ranked = scores.withColumn("rnk", F.row_number().over(w_rank))
    hit = F.when(
        (F.col("doc_id") == F.col("q")) & (F.col("rnk") <= _MRR_K),
        F.col("rnk"),
    )
    return (
        F.broadcast(qdocs)
        .join(ranked, "q", "left")
        .groupBy("q")
        .agg(
            F.coalesce(F.max(hit), F.lit(0)).cast("long").alias("self_rank"),
            F.coalesce(
                F.max(F.when(hit.isNotNull(), F.round(F.lit(1.0) / F.col("rnk"), 6))),
                F.lit(0.0),
            ).alias("rr"),
        )
        .select(F.col("q").alias("query_doc"), "self_rank", "rr")
        .orderBy("query_doc")
    )
