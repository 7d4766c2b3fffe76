"""Statistical language-model scoring over the ``documents`` corpus:
unigram log-probability (perplexity proxy), per-document word entropy,
corpus heavy-hitter n-grams, and per-source KL divergence for mixture
weighting. These are the classic pre-training quality/curation signals
(C4/Gopher/CCNet-style) the reference has no equivalent for; they extend
SURVEY §2.12c text analysis.

Cross-engine determinism (the driver hash-compares raw doubles):

- Transcendentals are NOT bit-identical between the JVM and libm —
  measured: ``log2`` differs in ~28% of cells, ``ln`` in ~1%, over
  integer inputs 1..200k. NEVER emit a raw ``log``/``log2`` double.
- The deterministic lane (verified 0 mismatches over 250k cells):
  ``CAST(round(log2(x), 6) AS DECIMAL(18,6))``. A 1-ulp engine
  difference survives rounding to 6 decimals only within ~2e-9 of a
  rounding boundary; irrational log values make ties unobservable.
- Sums of log terms multiply the rounded DECIMAL by an exact BIGINT
  count and SUM the exact decimals (order-independent), casting to
  DOUBLE only for the final single division.

Scale (100 TB): every query here is explode -> hash-aggregate with
map-side combine. The unigram LM caps its vocabulary (top-65536 +
<unk>, the CCNet shape), so its vocab relation broadcasts at any
corpus size; uncapped word-keyed joins (KL mixture) stay shuffle
equi-joins on the word key, and 1-row corpus totals are literal
broadcasts. No windows over
unbounded partitions: the heavy-hitter top-k uses Spark's distributed
TakeOrderedAndProject (orderBy + limit), never a single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# The verified deterministic lane for a log2 term (see module docstring).
_LOG2_DEC = "cast(round(log2({x}), 6) as decimal(18,6))"
_LOG2_DEC_SQL = "CAST(round(log2({x}), 6) AS DECIMAL(18,6))"


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")


_DOC_WORDS_SQL = """
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
"""
# DuckDB keeps empty tokens from consecutive separators just like Spark;
# both sides filter them identically.
_DOC_WORDS_SQL = f"SELECT * FROM ({_DOC_WORDS_SQL}) t WHERE w <> ''"


# Exported: curation_perplexity_buckets reuses this as a CTE.
_VOCAB_CAP = 65536  # CCNet-style LM vocab bound: top-K words + <unk>

UNIGRAM_LOGPROB_SQL = f"""
    WITH dw AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c_dw
      FROM ({_DOC_WORDS_SQL}) GROUP BY doc_id, w
    ),
    cw AS (
      SELECT w, CAST(SUM(c_dw) AS BIGINT) AS c_w FROM dw GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_total FROM cw),
    head AS (SELECT w, c_w FROM cw ORDER BY c_w DESC, w LIMIT {_VOCAB_CAP}),
    ht AS (SELECT CAST(COALESCE(SUM(c_w), 0) AS BIGINT) AS n_head FROM head),
    lp AS (
      SELECT w, {_LOG2_DEC_SQL.format(
          x='CAST(c_w AS DOUBLE) / CAST(n_total AS DOUBLE)')} AS lp_w
      FROM head, tot
    ),
    unk AS (
      SELECT CASE WHEN t.n_total > h.n_head THEN {_LOG2_DEC_SQL.format(
          x='CAST(t.n_total - h.n_head AS DOUBLE)'
            ' / CAST(t.n_total AS DOUBLE)')}
             END AS lp_unk
      FROM tot t, ht h
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.c_dw) AS BIGINT) AS n_tokens,
           CAST(SUM(dw.c_dw * COALESCE(lp.lp_w, u.lp_unk)) AS DOUBLE)
             / CAST(SUM(dw.c_dw) AS DOUBLE) AS avg_logprob_bits
    FROM dw LEFT JOIN lp ON dw.w = lp.w CROSS JOIN unk u
    GROUP BY dw.doc_id
    """


@query(
    "text_unigram_logprob",
    oracle=UNIGRAM_LOGPROB_SQL,
    tags=("text", "lm", "quality"),
    doc="Unigram LM document scoring (the KenLM-perplexity proxy used by "
        "CCNet-style quality filters): every document's mean per-token "
        "log2-probability under the corpus unigram LM with a BOUNDED "
        "vocabulary — the top-65536 words by corpus frequency (count "
        "desc, word tiebreak) plus an <unk> bucket carrying the whole "
        "OOV probability mass, exactly as production unigram filters "
        "cap their models. The bound is what makes the plan scale-safe: "
        "the (word -> logprob) relation is <= 65537 rows BY "
        "CONSTRUCTION, so its F.broadcast is justified at ANY corpus "
        "size — unlike an uncapped Heaps-law vocab, and unlike leaving "
        "the side choice to static estimates (measured failure: the "
        "unhinted join let Catalyst broadcast the EXPLODED CORPUS "
        "side at 10x data, because the compressed file-scan estimate "
        "sat under the threshold while the aggregate-derived vocab "
        "estimate looked big — 0.7 s -> 3.5 s). Plan: one "
        "map-side-combinable vocab count, a distributed "
        "TakeOrderedAndProject top-K (65536 rows to the driver, "
        "bounded), broadcast left join onto the occurrence stream with "
        "COALESCE to the broadcast 1-row <unk> logprob, then ONE "
        "groupBy(doc_id) whose exchange carries n_docs-bounded "
        "partials — the corpus never shuffles on the word key. "
        "Fixture vocabularies sit far under the cap, so the oracle is "
        "value-identical to the uncapped model there; the <unk> path "
        "itself is golden-tested with a tiny patched cap "
        "(tests/test_round5_ops.py).",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _doc_words(spark, sf_dir)
    cw = words.groupBy("w").agg(F.count("*").alias("c_w"))
    tot = cw.agg(F.sum("c_w").cast("long").alias("n_total"))
    # Bounded vocab head: distributed top-K, deterministic tiebreak.
    head = cw.orderBy(F.desc("c_w"), F.asc("w")).limit(_VOCAB_CAP)
    n_head = head.agg(
        F.coalesce(F.sum("c_w"), F.lit(0)).cast("long").alias("n_head")
    )
    lp = head.crossJoin(F.broadcast(tot)).select(
        "w",
        F.expr(_LOG2_DEC.format(
            x="cast(c_w as double) / cast(n_total as double)")).alias("lp_w"),
    )
    # 1-row <unk> logprob: the OOV mass, NULL when the cap never binds
    # (then no occurrence can miss the head and COALESCE never reads it).
    unk = tot.crossJoin(F.broadcast(n_head)).select(
        F.when(
            F.col("n_total") > F.col("n_head"),
            F.expr(_LOG2_DEC.format(
                x="cast(n_total - n_head as double)"
                  " / cast(n_total as double)")),
        ).alias("lp_unk")
    )
    return (
        words.join(F.broadcast(lp), "w", "left")
        .crossJoin(F.broadcast(unk))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("lp_w", "lp_unk")).alias("slp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("slp").cast("double")
             / F.col("n_tokens").cast("double")).alias("avg_logprob_bits"),
        )
    )


@query(
    "text_word_entropy",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c_dw
      FROM ({_DOC_WORDS_SQL}) GROUP BY doc_id, w
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c_dw) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             SUM(c_dw * {_LOG2_DEC_SQL.format(x='CAST(c_dw AS DOUBLE)')})
               AS sclog
      FROM dw GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST({_LOG2_DEC_SQL.format(x='CAST(n_tokens AS DOUBLE)')}
                AS DOUBLE)
             - CAST(sclog AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS entropy_bits
    FROM per_doc
    """,
    tags=("text", "lm", "quality"),
    doc="Per-document Shannon entropy of the word distribution — the "
        "repetitiveness signal (low entropy = template/spam text) used "
        "alongside Gopher repetition filters. H = log2(n) - sum(c*log2(c))/n "
        "over exact integer counts: one hash aggregate per (doc, word), "
        "one per doc, zero joins, zero windows.",
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _doc_words(spark, sf_dir)
    dw = words.groupBy("doc_id", "w").agg(F.count("*").alias("c_dw"))
    per_doc = dw.groupBy("doc_id").agg(
        F.sum("c_dw").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(
            F.col("c_dw")
            * F.expr(_LOG2_DEC.format(x="cast(c_dw as double)"))
        ).alias("sclog"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (
            F.expr(_LOG2_DEC.format(x="cast(n_tokens as double)")).cast("double")
            - F.col("sclog").cast("double") / F.col("n_tokens").cast("double")
        ).alias("entropy_bits"),
    )


@query(
    "text_bigram_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bg
      FROM toks
    ),
    counts AS (
      SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM bigrams WHERE bg NOT LIKE '% ' AND bg NOT LIKE ' %'
        AND bg NOT LIKE '%  %' GROUP BY bg
    )
    SELECT bg, n_occurrences, n_docs, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, bg) AS rn
          FROM counts)
    WHERE rn <= 20
    """,
    tags=("text", "ngram", "topk"),
    doc="Corpus-wide heavy-hitter bigrams: the boilerplate detector "
        "(navigation chrome, licence headers) — exact counts with a "
        "distinct-document frequency. Top-k is orderBy+limit, which "
        "Spark plans as distributed TakeOrderedAndProject (each "
        "partition keeps its local 20, driver merges 20*P rows) — never "
        "a single-partition global sort; rank is then numbered over the "
        "20 surviving rows only.",
)
def text_bigram_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1),"
                   " i -> concat_ws(' ', ws[i-1], ws[i]))")
        ).alias("bg"),
    )
    counts = (
        bigrams
        # mirror the oracle: drop bigrams touching empty tokens
        .filter(~F.col("bg").like("% ") & ~F.col("bg").like(" %")
                & ~F.col("bg").like("%  %"))
        .groupBy("bg")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("bg")).limit(20)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("bg"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


@query(
    "text_source_kl_mixture",
    oracle=f"""
    WITH sw AS (
      SELECT d.source, t.w, CAST(COUNT(*) AS BIGINT) AS c_sw
      FROM ({_DOC_WORDS_SQL}) t JOIN documents d USING (doc_id)
      GROUP BY d.source, t.w
    ),
    stot AS (
      SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY source
    ),
    cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w),
    tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_total FROM cw)
    SELECT sw.source, stot.n_s AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(sw.c_sw * (
               {_LOG2_DEC_SQL.format(
                   x='CAST(sw.c_sw AS DOUBLE) / CAST(stot.n_s AS DOUBLE)')}
               - {_LOG2_DEC_SQL.format(
                   x='CAST(cw.c_w AS DOUBLE) / CAST(tot.n_total AS DOUBLE)')}
           )) AS DOUBLE) / CAST(stot.n_s AS DOUBLE) AS kl_bits
    FROM sw JOIN stot USING (source) JOIN cw USING (w), tot
    GROUP BY sw.source, stot.n_s
    """,
    tags=("text", "lm", "mixture"),
    doc="Per-source KL divergence from the corpus unigram distribution — "
        "the source-skew signal behind mixture re-weighting (DoReMi-style "
        "domain weights start from exactly this statistic). "
        "KL(P_s || P) = sum_w p_sw * (log2 p_sw - log2 p_w) computed on "
        "exact integer counts with rounded-decimal log lanes. Word-keyed "
        "shuffle joins; source/corpus totals are tiny broadcasts.",
)
def text_source_kl_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    words = _doc_words(spark, sf_dir)
    sw = (
        words.join(docs, "doc_id")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c_sw"))
    )
    stot = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    tot = cw.agg(F.sum("c_w").alias("n_total"))
    term = F.col("c_sw") * (
        F.expr(_LOG2_DEC.format(x="cast(c_sw as double) / cast(n_s as double)"))
        - F.expr(_LOG2_DEC.format(
            x="cast(c_w as double) / cast(n_total as double)"))
    )
    return (
        sw.join(F.broadcast(stot), "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum(term).alias("skl"),
        )
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_distinct",
            (F.col("skl").cast("double") / F.col("n_s").cast("double"))
            .alias("kl_bits"),
        )
    )


# Interpolation weight for the bigram term (1 - this carries the
# unigram background) — Jelinek-Mercer, the KenLM-style fixed-lambda
# variant of stupid backoff.
_BIGRAM_LAMBDA = 0.7

BIGRAM_LOGPROB_SQL = f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    bg0 AS (
      SELECT doc_id, tk[k] AS w1, tk[k + 1] AS w2
      FROM tk, unnest(range(1, len(tk))) AS u(k)
    ),
    cw AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
      FROM ({_DOC_WORDS_SQL}) GROUP BY w
    ),
    head AS (SELECT w FROM cw ORDER BY c_w DESC, w LIMIT {_VOCAB_CAP}),
    bg AS MATERIALIZED (
      SELECT bg0.doc_id,
             CASE WHEN h1.w IS NULL THEN '<unk>' ELSE bg0.w1 END AS m1,
             CASE WHEN h2.w IS NULL THEN '<unk>' ELSE bg0.w2 END AS m2
      FROM bg0
      LEFT JOIN head h1 ON bg0.w1 = h1.w
      LEFT JOIN head h2 ON bg0.w2 = h2.w
    ),
    c12 AS MATERIALIZED (
      SELECT m1, m2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg GROUP BY m1, m2
    ),
    c1 AS (SELECT m1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY m1),
    c2 AS (SELECT m2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY m2),
    tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS t FROM c12),
    lp AS (
      SELECT c12.m1, c12.m2, {_LOG2_DEC_SQL.format(
          x=f"{_BIGRAM_LAMBDA} * CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)"
            f" + {round(1 - _BIGRAM_LAMBDA, 6)} * CAST(c2 AS DOUBLE)"
            " / CAST(t AS DOUBLE)")} AS lp
      FROM c12 JOIN c1 USING (m1) JOIN c2 USING (m2) CROSS JOIN tot
    ),
    dbg AS (
      SELECT doc_id, m1, m2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY doc_id, m1, m2
    )
    SELECT dbg.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(c * lp) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS avg_bigram_lp_bits
    FROM dbg JOIN lp USING (m1, m2)
    GROUP BY dbg.doc_id
    """


@query(
    "text_bigram_logprob",
    oracle=BIGRAM_LOGPROB_SQL,
    tags=("text", "lm", "quality"),
    doc="Bigram LM document scoring — the next-order companion of "
        "text_unigram_logprob (KenLM-style perplexity filtering uses "
        "n>=2 context): mean per-bigram log2-probability under a "
        "Jelinek-Mercer interpolated corpus bigram LM, "
        "P = 0.7*c12/c1 + 0.3*c2/total, where contexts/continuations "
        "are mapped through the SAME bounded top-65536+<unk> vocabulary "
        "as the unigram LM BEFORE counting — that mapping is the scale "
        "contract: the bigram count relation is bounded by distinct "
        "SURVIVING pairs (at most head^2, in practice corpus-limited), "
        "exactly how production KenLM pipelines bound their models. "
        "Per-bigram logs go through the verified round+DECIMAL lane and "
        "the per-doc sum multiplies exact BIGINT occurrence counts by "
        "exact decimals, so cross-engine hashes match. Plan (r8 "
        "profile-driven reshape, docs/SCALING.md 'bigram LM 50x "
        "profile'): the bounded head is collected ONCE and re-shipped "
        "with dense vocab ids (no consumer can re-trigger the corpus "
        "TakeOrdered job — it used to run 4x), every downstream "
        "relation keys on ONE packed int64 (id1*span+id2, "
        "collision-free by construction; half the shuffle width of two "
        "strings), and the per-doc counts are computed FIRST with the "
        "global counts derived from them, so the corpus-sized pair "
        "stream has a single consumer. One long-keyed equi-join of "
        "per-doc counts against logprobs, one groupBy(doc_id). "
        "In-corpus scoring means no unseen bigram (every scored pair "
        "was counted), so no backoff branch is needed.",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r8 profile-driven reshape (r7 verdict item 7). The 50x stage
    # profile (docs/SCALING.md "bigram LM 50x profile") showed the query
    # at 34 s while its heaviest single stage ran in 3 s: the vocab-head
    # TakeOrdered job (a full corpus word count) was re-executed for
    # each of the FOUR broadcast subplans (h1/h2 under both the c12 and
    # dbg consumers). Fix:
    #   1. Collect the head ONCE — it is structurally bounded at
    #      _VOCAB_CAP rows (the round-5 bounded-broadcast rule makes
    #      this collect legal at any corpus size) — and re-ship it as a
    #      local relation with DENSE VOCAB IDS, so no consumer can
    #      re-trigger the corpus job.
    #   2. Key every downstream relation on ONE packed int64
    #      (id1 * (cap+1) + id2, <unk> = cap) instead of two strings —
    #      half the shuffle width, collision-free by construction
    #      (dense ids, not hashes). The (m1, m2) -> key mapping is a
    #      bijection, so every count and therefore the output is
    #      unchanged; the oracle needs no mirror.
    docs = load_table(spark, "documents", sf_dir)
    tk = F.expr("filter(split(text, ' '), x -> x != '')")
    bg0 = (
        docs.select("doc_id", tk.alias("tk"))
        # sequence(1, 0) would DESCEND in Spark — guard short docs.
        .filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    words = _doc_words(spark, sf_dir)
    head_rows = (
        words.groupBy("w").agg(F.count("*").alias("c_w"))
        .orderBy(F.desc("c_w"), F.asc("w"))
        .limit(_VOCAB_CAP)
        .select("w")
        .collect()
    )
    unk_id = _VOCAB_CAP  # one past the densest possible head
    ids = spark.createDataFrame(
        [(r.w, i) for i, r in enumerate(head_rows)], "w string, wid long"
    )
    i1 = ids.select(F.col("w").alias("w1"), F.col("wid").alias("id1"))
    i2 = ids.select(F.col("w").alias("w2"), F.col("wid").alias("id2"))
    span = _VOCAB_CAP + 1
    key = (
        F.coalesce(F.col("id1"), F.lit(unk_id)) * span
        + F.coalesce(F.col("id2"), F.lit(unk_id))
    )
    bg = (
        bg0.join(F.broadcast(i1), "w1", "left")
        .join(F.broadcast(i2), "w2", "left")
        .select("doc_id", key.alias("k"))
    )
    # dbg FIRST, global counts derived from it: the corpus-sized bg
    # chain then has a single consumer (dbg's two consumers share one
    # ReusedExchange), instead of re-running the explode + broadcasts
    # under both the global-count and per-doc-count subplans.
    dbg = bg.groupBy("doc_id", "k").agg(F.count("*").alias("c"))
    c12 = dbg.groupBy("k").agg(F.sum("c").alias("c12"))
    m1 = F.expr(f"k div {span}")
    m2 = F.col("k") % span
    c1 = c12.groupBy(m1.alias("m1")).agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy(m2.alias("m2")).agg(F.sum("c12").alias("c2"))
    tot = c12.agg(F.sum("c12").cast("long").alias("t"))
    lp = (
        c12.withColumn("m1", m1).withColumn("m2", m2)
        .join(c1, "m1").join(c2, "m2")
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.expr(_LOG2_DEC.format(
                x=f"{_BIGRAM_LAMBDA} * cast(c12 as double)"
                  " / cast(c1 as double)"
                  f" + {round(1 - _BIGRAM_LAMBDA, 6)} * cast(c2 as double)"
                  " / cast(t as double)")).alias("lp"),
        )
    )
    return (
        dbg.join(lp, "k")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lp")).alias("slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("slp").cast("double")
             / F.col("n_bigrams").cast("double")).alias("avg_bigram_lp_bits"),
        )
    )


_PMI_MIN_COUNT, _PMI_TOPK = 5, 20

COOCCURRENCE_PMI_SQL = f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    pr0 AS (
      SELECT tk[k] AS w1, tk[k + 1] AS w2
      FROM tk, unnest(range(1, len(tk))) AS u(k)
      UNION ALL
      SELECT tk[k] AS w1, tk[k + 2] AS w2
      FROM tk, unnest(range(1, len(tk) - 1)) AS u(k)
    ),
    tok AS (SELECT unnest(tk) AS w FROM tk),
    cw AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM tok GROUP BY w
    ),
    head AS (SELECT w FROM cw ORDER BY c_w DESC, w LIMIT {_VOCAB_CAP}),
    marg AS MATERIALIZED (
      SELECT CASE WHEN h.w IS NULL THEN '<unk>' ELSE t.w END AS m,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tok t LEFT JOIN head h ON t.w = h.w GROUP BY 1
    ),
    pr AS MATERIALIZED (
      SELECT CASE WHEN h1.w IS NULL THEN '<unk>' ELSE pr0.w1 END AS m1,
             CASE WHEN h2.w IS NULL THEN '<unk>' ELSE pr0.w2 END AS m2
      FROM pr0
      LEFT JOIN head h1 ON pr0.w1 = h1.w
      LEFT JOIN head h2 ON pr0.w2 = h2.w
    ),
    cab AS (
      SELECT m1, m2, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM pr GROUP BY m1, m2
    ),
    tt AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tok FROM marg),
    tp AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS t_pairs FROM cab)
    SELECT m1 AS w1, m2 AS w2, c_ab,
           CAST({_LOG2_DEC_SQL.format(
               x="(CAST(c_ab AS DOUBLE) / t_pairs)"
                 " / ((CAST(ca.c AS DOUBLE) / t_tok)"
                 " * (CAST(cb.c AS DOUBLE) / t_tok))")} AS DOUBLE)
             AS pmi_bits
    FROM cab
    JOIN marg ca ON ca.m = m1
    JOIN marg cb ON cb.m = m2
    CROSS JOIN tt CROSS JOIN tp
    WHERE c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi_bits DESC, c_ab DESC, w1, w2
    LIMIT {_PMI_TOPK}
    """


@query(
    "text_cooccurrence_pmi",
    oracle=COOCCURRENCE_PMI_SQL,
    tags=("text", "lm", "cooccurrence", "report"),
    doc="Window-2 co-occurrence PMI — the skip-gram association "
        "statistic (Church & Hanks 1990; the count table word2vec/GloVe "
        "training data preparation materializes): for ordered word "
        "pairs within distance <= 2, pmi = log2(p(a,b) / (p(a)p(b))), "
        "top-20 with a c_ab >= 5 support floor (PMI without a support "
        "floor ranks hapax noise first). High-PMI pairs are "
        "collocations/boilerplate phrases — both a tokenizer-merge "
        "candidate list and a templated-text signal. Vocabulary is "
        "bounded through the SAME collected top-65536+<unk> head as "
        "the LM family (dense ids, packed int64 pair keys — the r8 "
        "bigram shape), so the count relation is bounded at any corpus "
        "size. The PMI argument is computed in one fixed IEEE "
        "expression shape and goes through the round+DECIMAL log2 "
        "lane; ordering ties break on exact counts then words. Scale: "
        "narrow pair generator, broadcast id mapping, two hash "
        "aggregates, an id-keyed marginal join, global top-20 "
        "TakeOrdered.",
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tk = F.expr("filter(split(text, ' '), x -> x != '')")
    base = docs.select(tk.alias("tk")).filter(F.size("tk") >= 1)
    toks = base.select(F.explode("tk").alias("w"))
    head_rows = (
        toks.groupBy("w").agg(F.count("*").alias("c_w"))
        .orderBy(F.desc("c_w"), F.asc("w"))
        .limit(_VOCAB_CAP)
        .select("w")
        .collect()
    )
    unk_id, span = _VOCAB_CAP, _VOCAB_CAP + 1
    ids = spark.createDataFrame(
        [(r.w, i) for i, r in enumerate(head_rows)], "w string, wid long"
    )
    marg = (
        toks.join(F.broadcast(ids), "w", "left")
        .groupBy(F.coalesce("wid", F.lit(unk_id)).alias("m"))
        .agg(F.count("*").alias("c"))
    )
    pairs0 = (
        base.filter(F.size("tk") >= 2)
        .select(F.explode(F.expr(
            "concat("
            " transform(sequence(1, size(tk) - 1),"
            "  i -> struct(tk[i-1] AS w1, tk[i] AS w2)),"
            " if(size(tk) >= 3,"
            "  transform(sequence(2, size(tk) - 1),"
            "   i -> struct(tk[i-2] AS w1, tk[i] AS w2)),"
            "  array()))")).alias("p"))
        .select("p.w1", "p.w2")
    )
    i1 = ids.select(F.col("w").alias("w1"), F.col("wid").alias("id1"))
    i2 = ids.select(F.col("w").alias("w2"), F.col("wid").alias("id2"))
    key = (
        F.coalesce(F.col("id1"), F.lit(unk_id)) * span
        + F.coalesce(F.col("id2"), F.lit(unk_id))
    )
    cab = (
        pairs0.join(F.broadcast(i1), "w1", "left")
        .join(F.broadcast(i2), "w2", "left")
        .groupBy(key.alias("k"))
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    t_tok = marg.agg(F.sum("c").cast("long").alias("t_tok"))
    t_pairs_rel = (
        pairs0.agg(F.count("*").cast("long").alias("t_pairs"))
    )
    ca = marg.select(F.col("m").alias("m1"), F.col("c").alias("c_a"))
    cb = marg.select(F.col("m").alias("m2"), F.col("c").alias("c_b"))
    out_ids = spark.createDataFrame(
        [(r.w, i) for i, r in enumerate(head_rows)] + [("<unk>", unk_id)],
        "w string, wid long",
    )
    o1 = out_ids.select(F.col("wid").alias("m1"), F.col("w").alias("w1"))
    o2 = out_ids.select(F.col("wid").alias("m2"), F.col("w").alias("w2"))
    pmi = F.expr(
        "cast(" + _LOG2_DEC.format(
            x="(cast(c_ab as double) / t_pairs)"
              " / ((cast(c_a as double) / t_tok)"
              " * (cast(c_b as double) / t_tok))"
        ) + " as double)"
    )
    return (
        cab
        .withColumn("m1", F.expr(f"k div {span}"))
        .withColumn("m2", F.col("k") % span)
        .join(F.broadcast(ca), "m1")
        .join(F.broadcast(cb), "m2")
        .crossJoin(F.broadcast(t_tok))
        .crossJoin(F.broadcast(t_pairs_rel))
        .join(F.broadcast(o1), "m1")
        .join(F.broadcast(o2), "m2")
        .select("w1", "w2", "c_ab", pmi.alias("pmi_bits"))
        .orderBy(F.desc("pmi_bits"), F.desc("c_ab"), "w1", "w2")
        .limit(_PMI_TOPK)
    )


# Kneser-Ney absolute discount: 3/4 is an exact binary fraction, so the
# discounted term is one exact double subtraction on both engines.
_KN_D = 0.75

KNESER_NEY_SQL = f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    bg0 AS (
      SELECT doc_id, tk[k] AS w1, tk[k + 1] AS w2
      FROM tk, unnest(range(1, len(tk))) AS u(k)
    ),
    cw AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
      FROM ({_DOC_WORDS_SQL}) GROUP BY w
    ),
    head AS (SELECT w FROM cw ORDER BY c_w DESC, w LIMIT {_VOCAB_CAP}),
    bg AS MATERIALIZED (
      SELECT bg0.doc_id,
             CASE WHEN h1.w IS NULL THEN '<unk>' ELSE bg0.w1 END AS m1,
             CASE WHEN h2.w IS NULL THEN '<unk>' ELSE bg0.w2 END AS m2
      FROM bg0
      LEFT JOIN head h1 ON bg0.w1 = h1.w
      LEFT JOIN head h2 ON bg0.w2 = h2.w
    ),
    dbg AS MATERIALIZED (
      SELECT doc_id, m1, m2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY doc_id, m1, m2
    ),
    c12 AS MATERIALIZED (
      SELECT m1, m2, CAST(SUM(c) AS BIGINT) AS c12
      FROM dbg GROUP BY m1, m2
    ),
    c1 AS (
      SELECT m1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1f
      FROM c12 GROUP BY m1
    ),
    c2 AS (SELECT m2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c12 GROUP BY m2),
    np AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM c12),
    lp AS (
      SELECT c12.m1, c12.m2, {_LOG2_DEC_SQL.format(
          x=f"(CAST(c12 AS DOUBLE) - {_KN_D}) / CAST(c1 AS DOUBLE)"
            f" + {_KN_D} * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)"
            " * CAST(n1b AS DOUBLE) / CAST(np AS DOUBLE)")} AS lp
      FROM c12 JOIN c1 USING (m1) JOIN c2 USING (m2) CROSS JOIN np
    )
    SELECT dbg.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(c * lp) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS avg_kn_lp_bits
    FROM dbg JOIN lp USING (m1, m2)
    GROUP BY dbg.doc_id
    """


@query(
    "text_kneser_ney_logprob",
    oracle=KNESER_NEY_SQL,
    tags=("text", "lm", "quality"),
    doc="Kneser-Ney bigram document scoring — the smoothing the JM-"
        "interpolated sibling (text_bigram_logprob) approximates: "
        "P = (c12 - D)/c1 + D * N1+(w1,.)/c1 * N1+(.,w2)/N_pairs with "
        "D = 3/4, where the continuation probability counts DISTINCT "
        "left contexts, not raw frequency — the 'San Francisco' "
        "correction that makes KN the production perplexity-filter LM "
        "(KenLM's default). In-corpus scoring means c12 >= 1 > D, so no "
        "zero branch. The continuation statistics N1+ are row counts of "
        "the ALREADY-BOUNDED pair relation (vocab-capped to the "
        "top-65536+<unk> head before counting), so they add zero new "
        "corpus passes. Per-pair logs go through the verified "
        "round+DECIMAL lane; D = 0.75 is an exact binary fraction, so "
        "the discounted numerator is bit-identical on both engines. "
        "Plan: the text_bigram_logprob shape — head collected once with "
        "dense ids, packed int64 pair keys, per-doc counts first — plus "
        "two |vocab|-bounded aggregates for the N1+ tables.",
)
def text_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tk = F.expr("filter(split(text, ' '), x -> x != '')")
    bg0 = (
        docs.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    words = _doc_words(spark, sf_dir)
    head_rows = (
        words.groupBy("w").agg(F.count("*").alias("c_w"))
        .orderBy(F.desc("c_w"), F.asc("w"))
        .limit(_VOCAB_CAP)
        .select("w")
        .collect()
    )
    unk_id = _VOCAB_CAP
    ids = spark.createDataFrame(
        [(r.w, i) for i, r in enumerate(head_rows)], "w string, wid long"
    )
    i1 = ids.select(F.col("w").alias("w1"), F.col("wid").alias("id1"))
    i2 = ids.select(F.col("w").alias("w2"), F.col("wid").alias("id2"))
    span = _VOCAB_CAP + 1
    key = (
        F.coalesce(F.col("id1"), F.lit(unk_id)) * span
        + F.coalesce(F.col("id2"), F.lit(unk_id))
    )
    bg = (
        bg0.join(F.broadcast(i1), "w1", "left")
        .join(F.broadcast(i2), "w2", "left")
        .select("doc_id", key.alias("k"))
    )
    # dbg feeds the final per-doc scoring join and the global counts;
    # c12 feeds FOUR consumers (c1/c2/np_/lp) — materialize both so the
    # bigram explode + id mapping runs once (guide §2.4).
    dbg = (
        bg.groupBy("doc_id", "k").agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    c12 = (
        dbg.groupBy("k").agg(F.sum("c").alias("c12"))
        .localCheckpoint(eager=True)
    )
    m1 = F.expr(f"k div {span}")
    m2 = F.col("k") % span
    c1 = c12.groupBy(m1.alias("m1")).agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    c2 = c12.groupBy(m2.alias("m2")).agg(F.count("*").alias("n1b"))
    np_ = c12.agg(F.count("*").cast("long").alias("np"))
    lp = (
        c12.withColumn("m1", m1).withColumn("m2", m2)
        .join(c1, "m1").join(c2, "m2")
        .crossJoin(F.broadcast(np_))
        .select(
            "k",
            F.expr(_LOG2_DEC.format(
                x=f"(cast(c12 as double) - {_KN_D}) / cast(c1 as double)"
                  f" + {_KN_D} * cast(n1f as double) / cast(c1 as double)"
                  " * cast(n1b as double) / cast(np as double)")).alias("lp"),
        )
    )
    return (
        dbg.join(lp, "k")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lp")).alias("slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("slp").cast("double")
             / F.col("n_bigrams").cast("double")).alias("avg_kn_lp_bits"),
        )
    )


@query(
    "text_boilerplate_line_census",
    oracle="""
    WITH paged AS (
      SELECT doc_id, source,
             'home about contact ' || source AS header,
             string_split(text, ' ') AS words,
             'copyright ' || source || ' all rights reserved' AS footer
      FROM documents
    ),
    lines AS (
      SELECT doc_id, source, header AS line FROM paged
      UNION ALL
      SELECT doc_id, source,
             array_to_string(words[CAST(s + 1 AS INT):CAST(s + 12 AS INT)],
                             ' ')
      FROM paged, unnest(range(0, len(words), 12)) AS u(s)
      UNION ALL
      SELECT doc_id, source, footer FROM paged
    ),
    toks AS (
      SELECT doc_id, source, md5(line) AS h,
             CAST(len(string_split(line, ' ')) AS BIGINT) AS tk
      FROM lines
    ),
    df AS (
      SELECT source, h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS occ,
             CAST(SUM(tk) AS BIGINT) AS tok_occ
      FROM toks GROUP BY source, h
    ),
    nd AS (
      SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM toks GROUP BY source
    ),
    flagged AS (
      SELECT d.source, d.h, d.occ, d.tok_occ,
             CASE WHEN d.df >= 2
                       AND 1000 * d.df >= 500 * n.n_docs
                  THEN 1 ELSE 0 END AS bp
      FROM df d JOIN nd n ON d.source = n.source
    )
    SELECT source,
           CAST(SUM(occ) AS BIGINT) AS n_lines_total,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
           CAST(SUM(bp) AS BIGINT) AS n_boilerplate_lines,
           CAST(SUM(CASE WHEN bp = 1 THEN tok_occ ELSE 0 END)
                AS BIGINT) AS boilerplate_tokens,
           CAST((1000 * SUM(CASE WHEN bp = 1 THEN tok_occ ELSE 0 END))
                // SUM(tok_occ) AS BIGINT) AS boilerplate_share_milli
    FROM flagged GROUP BY source ORDER BY source
    """,
    tags=("text", "boilerplate", "dedup", "extraction"),
    doc="Boilerplate line census (r11) — the trafilatura/jusText "
        "problem: crawled pages repeat their site's nav headers and "
        "legal footers on every page, and training on them teaches the "
        "model site chrome, not language. Detection is line-level "
        "cross-document frequency WITHIN each source (boilerplate is "
        "per-site by nature): pages rebuild as header + 12-word content "
        "lines + footer (the synthetic chrome lane, like the URL-dedup "
        "synth), every line hashes, and a line is boilerplate when it "
        "appears in >= 2 docs AND >= 50% of the source's docs "
        "(1000*df >= 500*n_docs, exact integer). Reports per source: "
        "line volumes, distinct lines, boilerplate lines, and the "
        "milli-share of tokens that are chrome — the removal budget. "
        "Scale: two map-side-combinable hash aggregates ((source, "
        "line-hash) then source) + a broadcast-size per-source dim join "
        "— the passage-dedup shape at line granularity; no pair join.",
)
def text_boilerplate_line_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    paged = docs.select(
        "doc_id", "source",
        F.concat(F.lit("home about contact "), F.col("source"))
        .alias("header"),
        F.split("text", " ").alias("words"),
        F.concat(F.lit("copyright "), F.col("source"),
                 F.lit(" all rights reserved")).alias("footer"),
    )
    content = paged.select(
        "doc_id", "source",
        F.explode(
            F.expr(
                "transform(sequence(0, (size(words) - 1) div 12), "
                "i -> concat_ws(' ', slice(words, i * 12 + 1, 12)))"
            )
        ).alias("line"),
    )
    lines = (
        paged.select("doc_id", "source", F.col("header").alias("line"))
        .unionByName(content)
        .unionByName(
            paged.select("doc_id", "source", F.col("footer").alias("line"))
        )
    )
    toks = lines.select(
        "doc_id", "source", F.md5("line").alias("h"),
        F.size(F.split("line", " ")).cast("long").alias("tk"),
    )
    df = toks.groupBy("source", "h").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("occ"),
        F.sum("tk").cast("long").alias("tok_occ"),
    )
    nd = toks.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    flagged = df.join(F.broadcast(nd), "source").select(
        "source", "occ", "tok_occ",
        F.when(
            (F.col("df") >= 2)
            & (1000 * F.col("df") >= 500 * F.col("n_docs")), 1
        ).otherwise(0).alias("bp"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("occ").cast("long").alias("n_lines_total"),
            F.count("*").cast("long").alias("n_distinct_lines"),
            F.sum("bp").cast("long").alias("n_boilerplate_lines"),
            F.sum(F.when(F.col("bp") == 1, F.col("tok_occ")).otherwise(0))
            .cast("long").alias("boilerplate_tokens"),
            F.sum("tok_occ").cast("long").alias("__tok_total"),
        )
        .select(
            "source", "n_lines_total", "n_distinct_lines",
            "n_boilerplate_lines", "boilerplate_tokens",
            F.expr("(1000 * boilerplate_tokens) div __tok_total")
            .cast("long").alias("boilerplate_share_milli"),
        )
        .orderBy("source")
    )


_CODE_SNIPPET_SQL = (
    "repeat('def fn(a, b): s = a + b; return s; ', 1 + {d} % 5)"
    " || 'print(fn(' || CAST({d} % 100 AS STRING) || ', 2));'"
)


@query(
    "text_code_detection",
    oracle=f"""
    WITH blended AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 3
                  THEN {_CODE_SNIPPET_SQL.format(d='doc_id')}
                  ELSE text END AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, source,
             CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
             CAST(length(t) - length(replace(t, ';', '')) AS BIGINT)
               AS n_semi,
             CAST(length(t) - length(replace(t, '=', '')) AS BIGINT)
               AS n_eq,
             CAST(length(t) - length(replace(t, '(', '')) AS BIGINT)
               AS n_lpar,
             CAST((length(t) - length(replace(t, 'def ', ''))) // 4
                  AS BIGINT) AS n_def,
             CAST((length(t) - length(replace(t, 'return ', ''))) // 7
                  AS BIGINT) AS n_ret
      FROM blended
    ),
    scored AS (
      SELECT source, n_words,
             (1000 * (n_semi + n_eq + n_lpar + 3 * (n_def + n_ret)))
               // n_words AS score_milli
      FROM feats
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score_milli >= 200 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_code_docs,
           CAST((1000 * SUM(CASE WHEN score_milli >= 200 THEN 1
                                 ELSE 0 END)) // COUNT(*) AS BIGINT)
             AS code_share_milli,
           CAST(SUM(CASE WHEN score_milli >= 200 THEN n_words
                         ELSE 0 END) AS BIGINT) AS code_tokens,
           CAST(SUM(CASE WHEN score_milli < 200 THEN n_words
                         ELSE 0 END) AS BIGINT) AS prose_tokens,
           CAST(MAX(score_milli) AS BIGINT) AS max_score_milli
    FROM scored GROUP BY source ORDER BY source
    """,
    tags=("text", "quality", "classifier"),
    doc="Code-vs-prose detection census (r11) — every pretraining "
        "mixture needs to KNOW how much of each source is source code "
        "(to route it to the code pile, apply code-specific filters, or "
        "cap it), and the standard cheap detector is a symbol-density "
        "score, not a neural model. Features are exact REPLACE-LENGTH "
        "counts (semicolons, assignments, parens via "
        "length(t)-length(replace(t,c,'')), keyword hits 'def '/'"
        "'return ' via the same trick divided by pattern length) — "
        "deliberately NO regex anywhere, the cross-engine fragility "
        "class ADVICE r10 flagged; the milli-score is "
        "1000*(symbols + 3*keywords) div words, thresholded at 200. "
        "The fixture corpus is pure prose, so a deterministic code lane "
        "(doc_id % 7 == 3 swaps in a generated snippet — the synth "
        "pattern of the URL/boilerplate lanes) gives the detector both "
        "classes to separate. Scale: one narrow scan projection into "
        "one map-side-combinable census; zero shuffles before the "
        "|sources|-row aggregate.",
)
def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    snippet = F.expr(_CODE_SNIPPET_SQL.format(d="doc_id"))
    blended = docs.select(
        "doc_id", "source",
        F.when(F.col("doc_id") % 7 == 3, snippet)
        .otherwise(F.col("text")).alias("t"),
    )
    def cnt(pat, width=1):
        c = F.length("t") - F.length(F.replace(F.col("t"), F.lit(pat)))
        return (c / width).cast("long") if width > 1 else c.cast("long")

    feats = blended.select(
        "source",
        F.size(F.split("t", " ")).cast("long").alias("n_words"),
        (cnt(";") + cnt("=") + cnt("(")
         + 3 * (cnt("def ", 4) + cnt("return ", 7))).alias("sym"),
    )
    scored = feats.select(
        "source", "n_words",
        F.expr("(1000 * sym) div n_words").alias("score_milli"),
    )
    is_code = F.col("score_milli") >= 200
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(is_code, 1).otherwise(0)).cast("long")
            .alias("n_code_docs"),
            F.sum(F.when(is_code, F.col("n_words")).otherwise(0))
            .cast("long").alias("code_tokens"),
            F.sum(F.when(~is_code, F.col("n_words")).otherwise(0))
            .cast("long").alias("prose_tokens"),
            F.max("score_milli").cast("long").alias("max_score_milli"),
        )
        .select(
            "source", "n_docs", "n_code_docs",
            F.expr("(1000 * n_code_docs) div n_docs").cast("long")
            .alias("code_share_milli"),
            "code_tokens", "prose_tokens", "max_score_milli",
        )
        .orderBy("source")
    )
