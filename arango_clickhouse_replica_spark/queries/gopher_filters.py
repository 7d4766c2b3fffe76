"""Gopher/MassiveText-style document filters over ``documents`` — the
repetition and quality heuristics (Rae et al. 2021, appendix A1.1;
public method) every large-scale text-corpus curation run applies before
mixing: within-document repetition scores, rule-based quality flags,
per-source length distributions, the near-dup cluster-size census, and
the mixture/shuffle bookkeeping that turns filter survivors into a
training mix (temperature-scaled domain weights, deterministic epoch
shuffles).

These extend SURVEY §2.12 (LLM-data-pipeline surface) in the same spirit
as quality_filters.py: keep/drop signals and mixing DECISIONS, not just
statistics.

Cross-engine determinism (driver hash-compares vs DuckDB):

- Every ratio is exact-integer counts until ONE final per-row double
  division (threshold comparisons are cross-multiplied integers, never
  float compares).
- Percentiles are rank-based exact selections (type-1 quantile at
  ceil(q*n), integer arithmetic), not interpolating percentile_cont.
- The only cross-row double sum (mixture-weight normalization) goes
  through the 6-dp DECIMAL lane (exact, order-independent).
- Word splitting matches text_lm.py: split on single space, drop empty
  tokens — identical token streams in both engines.

Scale (100 TB):

- Repetition/quality scores are explode -> hash-aggregate shapes with
  map-side combine keyed on doc_id — no windows over unbounded
  partitions, no joins wider than doc_id.
- Percentiles use one per-source sort window; sources are the partition
  key (bounded cardinality), rows within a source spill-sort locally.
- Mixture weights reduce the corpus to one row per source before any
  cross-row math; the 1-row denominator attaches by broadcast.
- The epoch shuffle is a narrow deterministic projection (salted md5)
  plus one (epoch, shard)-keyed aggregate; at 100 TB the same
  projection feeds a partitioned write (shard = output file), so the
  shuffle order is reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query

# Words per document, as an ARRAY (n-gram building needs positions):
# single-space split with empty tokens dropped — the text_lm.py contract.
# (a function, not a module constant: F.expr needs a live SparkContext)
def _toks():
    return F.expr("filter(split(text, ' '), w -> w <> '')")


_TOKS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"


def _doc_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, g) — word n-grams with multiplicity. Guarded so docs
    shorter than n emit nothing (Spark's sequence(1, 0) would DESCEND)."""
    grams = F.expr(
        f"""case when size(toks) >= {n}
             then transform(sequence(1, size(toks) - {n - 1}),
                            i -> array_join(slice(toks, i, {n}), ' '))
             else array() end"""
    )
    return docs.select("doc_id", _toks().alias("toks")).select(
        "doc_id", F.explode(grams).alias("g")
    )


def _ngrams_sql(n: int) -> str:
    return f"""
      SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + {n - 1} AS INT)],
                             ' ') AS g
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
           , unnest(range(1, len(toks) - {n - 2})) AS u(i)
      WHERE len(toks) >= {n}
    """


@query(
    "text_gopher_repetition",
    oracle=f"""
    WITH w1 AS ({_ngrams_sql(1)}),
    s1 AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_word_c,
             CAST(SUM(c) AS BIGINT) AS n_words
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM w1 GROUP BY 1, 2)
      GROUP BY doc_id
    ),
    s2 AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_bigram_c,
             CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngrams_sql(2)}) GROUP BY 1, 2)
      GROUP BY doc_id
    ),
    s3 AS (
      SELECT doc_id,
             CAST(COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS BIGINT)
               AS dup_tri_occ,
             CAST(SUM(c) AS BIGINT) AS n_trigrams
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngrams_sql(3)}) GROUP BY 1, 2)
      GROUP BY doc_id
    )
    SELECT s1.doc_id, s1.n_words,
           round(CAST(s1.max_word_c AS DOUBLE) / s1.n_words, 6)
             AS max_word_frac,
           round(CASE WHEN s2.n_bigrams > 0
                 THEN CAST(2 * s2.max_bigram_c AS DOUBLE) / s1.n_words
                 ELSE 0.0 END, 6) AS top_bigram_frac,
           round(CASE WHEN s3.n_trigrams > 0
                 THEN CAST(s3.dup_tri_occ AS DOUBLE) / s3.n_trigrams
                 ELSE 0.0 END, 6) AS dup_trigram_frac
    FROM s1
    LEFT JOIN s2 USING (doc_id)
    LEFT JOIN s3 USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("text", "quality", "gopher", "repetition"),
    doc="Gopher-style within-document repetition scores (Rae et al. "
        "2021 A1.1): max single-word frequency, top-bigram coverage "
        "(2*count/words — the chars-in-top-2-gram proxy on word "
        "counts), and the duplicated-trigram occurrence fraction "
        "(occurrences of trigram types seen >= 2x / all trigram "
        "occurrences). Template spam, boilerplate, and keyword-stuffed "
        "pages score high and get dropped before training. Three "
        "explode -> (doc, gram) -> doc hash-aggregate chains joined on "
        "doc_id — map-side combinable, no windows, corpus never "
        "reshuffles wider than doc_id. Ratios are exact-integer counts "
        "until one final per-row division.",
)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)

    def stats(n: int, agg_cols):
        return (
            _doc_ngrams(docs, n)
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(*agg_cols)
        )

    s1 = stats(1, [
        F.max("c").cast("long").alias("max_word_c"),
        F.sum("c").cast("long").alias("n_words"),
    ])
    s2 = stats(2, [
        F.max("c").cast("long").alias("max_bigram_c"),
        F.sum("c").cast("long").alias("n_bigrams"),
    ])
    s3 = stats(3, [
        F.coalesce(F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0))
        .cast("long").alias("dup_tri_occ"),
        F.sum("c").cast("long").alias("n_trigrams"),
    ])
    return (
        s1.join(s2, "doc_id", "left").join(s3, "doc_id", "left")
        .select(
            "doc_id", "n_words",
            F.round(F.col("max_word_c").cast("double") / F.col("n_words"), 6)
            .alias("max_word_frac"),
            F.round(
                F.when(F.col("n_bigrams") > 0,
                       (2 * F.col("max_bigram_c")).cast("double")
                       / F.col("n_words")).otherwise(0.0), 6)
            .alias("top_bigram_frac"),
            F.round(
                F.when(F.col("n_trigrams") > 0,
                       F.col("dup_tri_occ").cast("double")
                       / F.col("n_trigrams")).otherwise(0.0), 6)
            .alias("dup_trigram_frac"),
        )
        .orderBy("doc_id")
    )


# Gopher rule thresholds, re-based for the fixture's 20-130-word docs
# (the published 50..100k-word bound would pass everything). Stopwords
# from the fixture's own function-word head.
_WC_LO, _WC_HI = 25, 2000
_STOPWORDS = ("the", "a", "data", "row", "table")


def gopher_doc_stats(docs: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """Per-document Gopher gate statistics — THE shared relation behind
    text_gopher_quality_flags, curation_quality_weighted_mixture, and
    curation_filter_agreement (quality_filters.py): one explode -> doc
    hash-aggregate producing (n_words, n_word_chars, n_short, n_stop).
    A rule change here changes every consumer together."""
    w = _doc_ngrams(docs, 1)
    base = (
        w.join(docs.select("doc_id", *extra_cols), "doc_id")
        if extra_cols else w
    )
    return base.groupBy("doc_id", *extra_cols).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.length("g")).cast("long").alias("n_word_chars"),
        F.sum(F.when(F.length("g") <= 2, 1).otherwise(0))
        .cast("long").alias("n_short"),
        F.count_distinct(
            F.when(F.col("g").isin(*_STOPWORDS), F.col("g"))
        ).cast("long").alias("n_stop"),
    )


def gopher_pass_predicate():
    """The combined Gopher keep decision over gopher_doc_stats columns
    (word-count bounds, mean word length in [3,10] as integer cross-
    multiplications, short-word fraction <= 20%, >= 2 function words)."""
    return (
        F.col("n_words").between(_WC_LO, _WC_HI)
        & (F.col("n_word_chars") >= 3 * F.col("n_words"))
        & (F.col("n_word_chars") <= 10 * F.col("n_words"))
        & (5 * F.col("n_short") <= F.col("n_words"))
        & (F.col("n_stop") >= 2)
    )


@query(
    "text_gopher_quality_flags",
    oracle=f"""
    WITH w AS ({_ngrams_sql(1)}),
    per_doc AS (
      SELECT w.doc_id, d.source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(len(g)) AS BIGINT) AS n_word_chars,
             CAST(COUNT(*) FILTER (WHERE len(g) <= 2) AS BIGINT) AS n_short,
             CAST(COUNT(DISTINCT g) FILTER (
               WHERE g IN ({", ".join(f"'{s}'" for s in _STOPWORDS)})
             ) AS BIGINT) AS n_stop
      FROM w JOIN documents d ON d.doc_id = w.doc_id
      GROUP BY 1, 2
    ),
    flags AS (
      SELECT source,
             CASE WHEN n_words BETWEEN {_WC_LO} AND {_WC_HI}
                  THEN 1 ELSE 0 END AS f_wc,
             CASE WHEN n_word_chars >= 3 * n_words
                   AND n_word_chars <= 10 * n_words THEN 1 ELSE 0 END AS f_len,
             CASE WHEN 5 * n_short <= n_words THEN 1 ELSE 0 END AS f_short,
             CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS f_stop
      FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_wc) AS BIGINT) AS n_pass_wordcount,
           CAST(SUM(f_len) AS BIGINT) AS n_pass_meanlen,
           CAST(SUM(f_short) AS BIGINT) AS n_pass_shortword,
           CAST(SUM(f_stop) AS BIGINT) AS n_pass_stopword,
           CAST(SUM(f_wc * f_len * f_short * f_stop) AS BIGINT) AS n_pass_all
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality", "gopher"),
    doc="Gopher-style rule-based quality gate, reported as per-source "
        "pass counts: word-count bounds, mean word length in [3, 10] "
        "(compared as integers: 3n <= chars <= 10n — no float "
        "thresholds), short-word fraction <= 20% (5*short <= n), and "
        ">= 2 distinct function words present (the 'real prose' "
        "smell). The per-source pass-rate table is what a curation run "
        "reads to decide which sources need cleaning vs dropping. One "
        "explode -> doc hash-aggregate -> source hash-aggregate chain, "
        "all integer flags — map-side combinable end to end.",
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_doc = gopher_doc_stats(docs, ("source",))
    f_wc = F.when(F.col("n_words").between(_WC_LO, _WC_HI), 1).otherwise(0)
    f_len = F.when(
        (F.col("n_word_chars") >= 3 * F.col("n_words"))
        & (F.col("n_word_chars") <= 10 * F.col("n_words")), 1).otherwise(0)
    f_short = F.when(5 * F.col("n_short") <= F.col("n_words"), 1).otherwise(0)
    f_stop = F.when(F.col("n_stop") >= 2, 1).otherwise(0)
    return (
        per_doc.select(
            "source", f_wc.alias("f_wc"), f_len.alias("f_len"),
            f_short.alias("f_short"), f_stop.alias("f_stop"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("f_wc").cast("long").alias("n_pass_wordcount"),
            F.sum("f_len").cast("long").alias("n_pass_meanlen"),
            F.sum("f_short").cast("long").alias("n_pass_shortword"),
            F.sum("f_stop").cast("long").alias("n_pass_stopword"),
            F.sum(F.col("f_wc") * F.col("f_len") * F.col("f_short")
                  * F.col("f_stop")).cast("long").alias("n_pass_all"),
        )
        .orderBy("source")
    )


# Exact rank-based percentiles (type-1 quantile): value at row
# ceil(q*n) in (n_chars, doc_id) order — integer arithmetic, so both
# engines select the SAME row (percentile_cont would interpolate in
# engine-specific float math).
_PCTS = (25, 50, 75, 95)


@query(
    "text_doc_length_percentiles",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
           {", ".join(
               f"CAST(MAX(CASE WHEN rn = ({p} * n + 99) // 100 "
               f"THEN n_chars END) AS BIGINT) AS p{p}"
               for p in _PCTS)}
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "distribution", "report"),
    doc="Per-source document-length percentiles (exact p25/50/75/95 of "
        "n_chars): the length-distribution fingerprint a curation run "
        "compares across sources to spot truncation bugs, boilerplate "
        "floods (collapsed spread), or concatenation errors (inflated "
        "tails). Exact type-1 quantiles — the value at ceil(q*n) in "
        "(n_chars, doc_id) order, integer arithmetic — so both engines "
        "pick the identical row; one window per source partition "
        "(bounded cardinality key), then a conditional aggregate.",
)
def text_doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    sel = [
        F.max(
            F.when(F.col("rn") == F.expr(f"({p} * n + 99) div 100"),
                   F.col("n_chars"))
        ).cast("long").alias(f"p{p}")
        for p in _PCTS
    ]
    return (
        ranked.groupBy("source")
        .agg(F.max("n").cast("long").alias("n_docs"), *sel)
        .orderBy("source")
    )


@query(
    "curation_domain_mixture_weights",
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(GREATEST(1, n_chars // 4)) AS BIGINT) AS est_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(est_tokens) AS t FROM per_source),
    raw AS (
      SELECT source, n_docs, est_tokens,
             CAST(round(sqrt(CAST(est_tokens AS DOUBLE) / t), 6)
                  AS DECIMAL(18,6)) AS w_raw
      FROM per_source, tot
    ),
    denom AS (SELECT SUM(w_raw) AS d FROM raw)
    SELECT source, n_docs, est_tokens,
           round(CAST(w_raw AS DOUBLE) / CAST(d AS DOUBLE), 6) AS weight
    FROM raw, denom
    ORDER BY source
    """,
    tags=("curation", "mixing", "decision"),
    doc="Temperature-scaled domain mixture weights (alpha = 0.5, the "
        "multilingual-sampling rule of Conneau & Lample): per-source "
        "token shares p_s are raised to p_s^alpha and renormalized, "
        "up-weighting small domains so a handful of giant crawls don't "
        "drown everything else. THE decision table a training run "
        "consumes as its sampling distribution. Cross-engine exactness: "
        "sqrt doubles are IEEE correctly-rounded (bit-identical), each "
        "is rounded to a 6-dp DECIMAL before the cross-row "
        "normalization sum (exact, order-independent), and the final "
        "division is one per-row double op. The corpus reduces to one "
        "row per source before any cross-row math; the 1-row total and "
        "denominator attach by broadcast.",
)
def curation_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_source = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.greatest(F.lit(1), F.expr("n_chars div 4")))
        .cast("long").alias("est_tokens"),
    )
    tot = per_source.agg(F.sum("est_tokens").alias("t"))
    raw = per_source.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "est_tokens",
        F.round(F.sqrt(F.col("est_tokens").cast("double") / F.col("t")), 6)
        .cast("decimal(18,6)").alias("w_raw"),
    )
    denom = raw.agg(F.sum("w_raw").alias("d"))
    return (
        raw.crossJoin(F.broadcast(denom))
        .select(
            "source", "n_docs", "est_tokens",
            F.round(F.col("w_raw").cast("double")
                    / F.col("d").cast("double"), 6).alias("weight"),
        )
        .orderBy("source")
    )


_N_EPOCHS, _N_SHARDS = 3, 8


@query(
    "curation_epoch_shuffle",
    oracle=f"""
    WITH assign AS (
      SELECT e.epoch, d.doc_id,
             md5(CAST(d.doc_id AS VARCHAR) || ':epoch:'
                 || CAST(e.epoch AS VARCHAR)) AS h
      FROM documents d,
           (SELECT unnest(range(0, {_N_EPOCHS})) AS epoch) e
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INT)
             % {_N_SHARDS} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY h, doc_id))
             AS order_fingerprint
    FROM assign
    GROUP BY 1, 2
    ORDER BY epoch, shard
    """,
    tags=("curation", "shuffle", "decision"),
    doc="Deterministic epoch-wise training shuffle: every document gets "
        "a fresh pseudorandom position per epoch (md5 of doc_id:epoch — "
        "replayable on any engine/partitioning, no RNG state), hex-"
        "bucketed into shards; within a shard the hash IS the read "
        "order. Output is the (epoch, shard) manifest: document count "
        "plus an order fingerprint (md5 of the doc_id sequence in hash "
        "order) — two engines computing the same fingerprint proves "
        "they would feed the trainer the IDENTICAL permutation. A "
        "narrow projection plus one (epoch, shard) aggregate; at scale "
        "the same projection feeds a partitioned-by-shard write.",
)
def curation_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(_N_EPOCHS - 1))
    ).alias("epoch")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch:"),
                       F.col("epoch").cast("string")))
    assign = docs.select("doc_id", epochs).select(
        "doc_id", "epoch", h.alias("h")
    )
    shard = (
        (F.expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1)
        % _N_SHARDS
    ).cast("int")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("h"), F.col("doc_id")))),
        lambda s: s.doc_id.cast("string"),
    )
    return (
        assign.select(F.col("epoch").cast("int").alias("epoch"),
                      shard.alias("shard"), "doc_id", "h")
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.md5(F.array_join(ordered, ",")).alias("order_fingerprint"),
        )
        .orderBy("epoch", "shard")
    )


@query(
    "curation_quality_weighted_mixture",
    oracle=f"""
    WITH w AS ({_ngrams_sql(1)}),
    per_doc AS (
      SELECT w.doc_id, d.source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(len(g)) AS BIGINT) AS n_word_chars,
             CAST(COUNT(*) FILTER (WHERE len(g) <= 2) AS BIGINT) AS n_short,
             CAST(COUNT(DISTINCT g) FILTER (
               WHERE g IN ({", ".join(f"'{s}'" for s in _STOPWORDS)})
             ) AS BIGINT) AS n_stop
      FROM w JOIN documents d ON d.doc_id = w.doc_id
      GROUP BY 1, 2
    ),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS est_tokens,
             CAST(SUM(CASE WHEN n_words BETWEEN {_WC_LO} AND {_WC_HI}
                            AND n_word_chars >= 3 * n_words
                            AND n_word_chars <= 10 * n_words
                            AND 5 * n_short <= n_words
                            AND n_stop >= 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM per_doc GROUP BY source
    ),
    tot AS (SELECT SUM(est_tokens) AS t FROM per_source),
    raw AS (
      SELECT source, n_docs, est_tokens, n_pass,
             round(CAST(n_pass AS DOUBLE) / n_docs, 6) AS pass_rate,
             CAST(round(sqrt(CAST(est_tokens AS DOUBLE) / t)
                        * (CAST(n_pass AS DOUBLE) / n_docs), 6)
                  AS DECIMAL(18,6)) AS w_raw
      FROM per_source, tot
    ),
    denom AS (SELECT SUM(w_raw) AS d FROM raw)
    SELECT source, n_docs, est_tokens, pass_rate,
           round(CASE WHEN CAST(d AS DOUBLE) > 0
                 THEN CAST(w_raw AS DOUBLE) / CAST(d AS DOUBLE)
                 ELSE 0.0 END, 6) AS weight
    FROM raw, denom
    ORDER BY source
    """,
    tags=("curation", "mixing", "quality", "decision", "composition"),
    doc="Quality-weighted domain mixture: the alpha=0.5 temperature "
        "weights of curation_domain_mixture_weights DISCOUNTED by each "
        "source's Gopher quality-gate pass rate (weight ~ sqrt(token "
        "share) * pass_rate, renormalized) — a source that is mostly "
        "template spam contributes tokens to the share but loses "
        "sampling mass in proportion to what the gate would drop. This "
        "is the mixing table a run uses when it samples from RAW "
        "sources and filters on the fly. Exact-lane discipline as the "
        "plain mixture: sqrt and pass_rate are deterministic doubles "
        "rounded to 6-dp decimals BEFORE the cross-row normalization "
        "sum; token-true word counts come from the same explode "
        "aggregate as the gate flags (one corpus pass total).",
)
def curation_quality_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_doc = gopher_doc_stats(docs, ("source",))
    passes = gopher_pass_predicate()
    per_source = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("est_tokens"),
        F.sum(passes.cast("int")).cast("long").alias("n_pass"),
    )
    tot = per_source.agg(F.sum("est_tokens").alias("t"))
    pass_rate = F.col("n_pass").cast("double") / F.col("n_docs")
    raw = per_source.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "est_tokens",
        F.round(pass_rate, 6).alias("pass_rate"),
        F.round(
            F.sqrt(F.col("est_tokens").cast("double") / F.col("t")) * pass_rate,
            6,
        ).cast("decimal(18,6)").alias("w_raw"),
    )
    denom = raw.agg(F.sum("w_raw").alias("d"))
    return (
        raw.crossJoin(F.broadcast(denom))
        .select(
            "source", "n_docs", "est_tokens", "pass_rate",
            F.round(
                F.when(F.col("d").cast("double") > 0,
                       F.col("w_raw").cast("double")
                       / F.col("d").cast("double")).otherwise(0.0), 6)
            .alias("weight"),
        )
        .orderBy("source")
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
      FROM documents
    ),
    cc AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM chars GROUP BY 1, 2
    ),
    n AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM cc GROUP BY doc_id
    )
    SELECT cc.doc_id, n.n AS n_chars, n.n_distinct AS n_distinct_chars,
           round(CAST(SUM(CAST(round(
             -(CAST(cc.c AS DOUBLE) / n.n)
               * log2(CAST(cc.c AS DOUBLE) / n.n), 6)
             AS DECIMAL(18,6))) AS DOUBLE), 6) AS entropy
    FROM cc JOIN n ON n.doc_id = cc.doc_id
    GROUP BY cc.doc_id, n.n, n.n_distinct
    ORDER BY cc.doc_id
    """,
    tags=("text", "quality", "entropy"),
    doc="Per-document character-level Shannon entropy (bits/char): the "
        "encoding-junk detector — base64 blobs and hex dumps sit near "
        "max entropy, repeated-character padding near zero, natural "
        "text in a narrow band — used alongside the Gopher rules to "
        "drop non-prose payloads that word-level heuristics misread. "
        "Each -p*log2(p) term is a deterministic per-row double (same "
        "c/n on both engines) rounded to a 6-dp DECIMAL before the "
        "per-doc cross-row sum (the text_lm.py log-lane discipline). "
        "One char explode -> (doc, char) -> doc hash-aggregate chain, "
        "map-side combinable; the char alphabet bounds the inner "
        "relation at ~100 rows per doc.",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cc = (
        docs.select(
            "doc_id",
            F.explode(F.expr("regexp_extract_all(text, '.', 0)")).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n = cc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log2(p), 6).cast("decimal(18,6)")
    return (
        cc.join(n, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("entropy"))
        .select(
            "doc_id",
            F.col("n").alias("n_chars"),
            F.col("n_distinct").alias("n_distinct_chars"),
            "entropy",
        )
        .orderBy("doc_id")
    )


@query(
    "text_c4_heuristics",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             CASE WHEN text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?'
                    OR text LIKE '%"' THEN 1 ELSE 0 END AS f_punct,
             CASE WHEN text NOT LIKE '%{%' THEN 1 ELSE 0 END AS f_brace,
             CASE WHEN lower(text) NOT LIKE '%lorem ipsum%'
                  THEN 1 ELSE 0 END AS f_lorem,
             CASE WHEN lower(text) NOT LIKE '%javascript%'
                  THEN 1 ELSE 0 END AS f_js,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       x -> x <> '')) >= 5
                  THEN 1 ELSE 0 END AS f_words,
             CASE WHEN len(string_split(text, '. ')) >= 3
                  THEN 1 ELSE 0 END AS f_sent
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_punct) AS BIGINT) AS pass_terminal_punct,
           CAST(SUM(f_brace) AS BIGINT) AS pass_no_brace,
           CAST(SUM(f_lorem) AS BIGINT) AS pass_no_lorem,
           CAST(SUM(f_js) AS BIGINT) AS pass_no_javascript,
           CAST(SUM(f_words) AS BIGINT) AS pass_min_words,
           CAST(SUM(f_sent) AS BIGINT) AS pass_min_sentences,
           CAST(SUM(f_punct * f_brace * f_lorem * f_js * f_words * f_sent)
                AS BIGINT) AS pass_all
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality", "c4"),
    doc="C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the OTHER "
        "canonical published filter set, complementing the Gopher rules "
        "already registered): per-source pass counts for terminal "
        "punctuation, no curly braces (code leakage), no 'lorem ipsum' "
        "placeholder, no 'javascript' boilerplate, >= 5 words, and "
        ">= 3 sentences, plus the all-rules conjunction. Every rule is "
        "a pure string predicate, so the whole query is one narrow "
        "projection folded into a per-source hash aggregate — "
        "map-side combinable, nothing wider than the source key "
        "shuffles at any corpus size.",
)
def text_c4_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    lo = F.lower(t)
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    per = docs.select(
        "source",
        flag(t.like("%.") | t.like("%!") | t.like("%?") | t.like('%"'))
        .alias("f_punct"),
        flag(~t.like("%{%")).alias("f_brace"),
        flag(~lo.like("%lorem ipsum%")).alias("f_lorem"),
        flag(~lo.like("%javascript%")).alias("f_js"),
        flag(F.size(F.expr("filter(split(text, ' '), x -> x != '')")) >= 5)
        .alias("f_words"),
        flag(F.size(F.split(t, F.lit("\\. "), -1).cast("array<string>")) >= 3)
        .alias("f_sent"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("f_punct").cast("long").alias("pass_terminal_punct"),
            F.sum("f_brace").cast("long").alias("pass_no_brace"),
            F.sum("f_lorem").cast("long").alias("pass_no_lorem"),
            F.sum("f_js").cast("long").alias("pass_no_javascript"),
            F.sum("f_words").cast("long").alias("pass_min_words"),
            F.sum("f_sent").cast("long").alias("pass_min_sentences"),
            F.sum(
                F.col("f_punct") * F.col("f_brace") * F.col("f_lorem")
                * F.col("f_js") * F.col("f_words") * F.col("f_sent")
            ).cast("long").alias("pass_all"),
        )
        .orderBy("source")
    )


_UNIMAX_EPOCH_CAP = 4


@query(
    "curation_unimax_budget",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(SUM(GREATEST(1, n_chars // 4)) AS BIGINT) AS tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(tokens) // 2 AS BIGINT) AS budget FROM per_lang
    ),
    ranked AS (
      SELECT lang, tokens, budget,
             CAST({_UNIMAX_EPOCH_CAP} * tokens AS BIGINT) AS cap_tokens,
             ROW_NUMBER() OVER (ORDER BY tokens, lang) AS i,
             COUNT(*) OVER () AS n,
             COALESCE(SUM({_UNIMAX_EPOCH_CAP} * tokens) OVER (
               ORDER BY tokens, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM per_lang, tot
    ),
    flagged AS (
      SELECT *, CASE WHEN cap_tokens * (n - i + 1) <= budget - cum_prev
                     THEN 1 ELSE 0 END AS capped
      FROM ranked
    ),
    totals AS (
      SELECT *,
             SUM(capped * cap_tokens) OVER () AS s_capped,
             SUM(capped) OVER () AS k
      FROM flagged
    )
    SELECT lang, tokens, cap_tokens,
           CAST(capped AS INT) AS at_cap,
           round(CASE WHEN capped = 1 THEN CAST(cap_tokens AS DOUBLE)
                      ELSE CAST(budget - s_capped AS DOUBLE) / (n - k)
                 END, 6) AS alloc_tokens,
           round(CASE WHEN capped = 1 THEN CAST(cap_tokens AS DOUBLE)
                      ELSE CAST(budget - s_capped AS DOUBLE) / (n - k)
                 END / tokens, 6) AS epochs
    FROM totals ORDER BY lang
    """,
    tags=("curation", "mixing", "decision"),
    doc=f"UniMax budget allocation (Chung et al. 2023): distribute a "
        "token budget (half the corpus here) across languages so every "
        f"language is repeated at most {_UNIMAX_EPOCH_CAP} epochs and "
        "the remainder spreads UNIFORMLY over the others — the "
        "closed-form waterfill: langs ascending by size, lang i is "
        "'capped' iff giving it its full cap still leaves every larger "
        "lang an equal share (an exact integer comparison, so the "
        "branch point is bit-identical cross-engine; caps ascend, so "
        "cappedness is a prefix property). Allocations: cap for capped "
        "langs, (budget - capped mass) / #uncapped for the rest — one "
        "double division on exact integers. THE sampling table "
        "multilingual runs consume instead of temperature mixing when "
        "low-resource repetition must be bounded. Scale: the corpus "
        "reduces to one row per lang before any window; every window "
        "runs over that L-row relation.",
)
def curation_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.greatest(F.lit(1), F.expr("n_chars div 4")))
        .cast("long").alias("tokens"),
    )
    tot = per_lang.agg(
        F.expr("sum(tokens) div 2").cast("long").alias("budget")
    )
    w_ord = Window.orderBy("tokens", "lang")
    ranked = (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang", "tokens", "budget",
            (F.lit(_UNIMAX_EPOCH_CAP) * F.col("tokens"))
            .cast("long").alias("cap_tokens"),
        )
        .withColumn("i", F.row_number().over(w_ord))
        .withColumn("n", F.count("*").over(Window.partitionBy()))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    flagged = ranked.withColumn(
        "capped",
        F.when(
            F.col("cap_tokens") * (F.col("n") - F.col("i") + 1)
            <= F.col("budget") - F.col("cum_prev"),
            1,
        ).otherwise(0),
    )
    w_all = Window.partitionBy()
    totals = (
        flagged
        .withColumn(
            "s_capped", F.sum(F.col("capped") * F.col("cap_tokens")).over(w_all)
        )
        .withColumn("k", F.sum("capped").over(w_all))
    )
    alloc = F.when(
        F.col("capped") == 1, F.col("cap_tokens").cast("double")
    ).otherwise(
        (F.col("budget") - F.col("s_capped")).cast("double")
        / (F.col("n") - F.col("k"))
    )
    return totals.select(
        "lang", "tokens", "cap_tokens",
        F.col("capped").cast("int").alias("at_cap"),
        F.round(alloc, 6).alias("alloc_tokens"),
        F.round(alloc / F.col("tokens"), 6).alias("epochs"),
    ).orderBy("lang")


@query(
    "curation_shard_balance_report",
    oracle=f"""
    WITH assign AS (
      SELECT CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR) || ':epoch:0'),
                                1, 1)) - 1 AS INT) % {_N_SHARDS} AS shard,
             GREATEST(1, n_chars // 4) AS est_tokens
      FROM documents
    ),
    per_shard AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(est_tokens) AS BIGINT) AS est_tokens
      FROM assign GROUP BY shard
    ),
    tot AS (SELECT CAST(SUM(est_tokens) AS BIGINT) AS t FROM per_shard)
    SELECT shard, n_docs, est_tokens,
           round(CAST(est_tokens AS DOUBLE) / t, 6) AS token_share,
           round(CAST(est_tokens AS DOUBLE) * {_N_SHARDS} / t, 6)
             AS load_factor
    FROM per_shard, tot ORDER BY shard
    """,
    tags=("curation", "sharding", "report", "decision"),
    doc="Shard-balance audit over the deterministic training shards "
        "(epoch 0 of curation_epoch_shuffle's md5 assignment): per-shard "
        "doc and estimated-token mass, token share, and load factor "
        "(share * n_shards — 1.0 is perfect balance). THE pre-flight "
        "check before a training run trusts its shards: a load factor "
        "far from 1.0 means stragglers (data-parallel ranks idle on the "
        "small shards while the big one streams). Exact integer masses; "
        "the two derived doubles are single divisions of exact "
        "integers. Scale: one narrow hash pass into an 8-key aggregate, "
        "1-row total broadcast attach.",
)
def curation_shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    shard = (
        (F.expr(f"instr('0123456789abcdef', substr(md5(concat("
                f"cast(doc_id as string), ':epoch:0')), 1, 1))") - 1)
        % _N_SHARDS
    ).cast("int")
    per_shard = (
        docs.select(
            shard.alias("shard"),
            F.greatest(F.lit(1), F.expr("n_chars div 4")).alias("est_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("est_tokens").cast("long").alias("est_tokens"),
        )
    )
    tot = per_shard.agg(F.sum("est_tokens").cast("long").alias("t"))
    return (
        per_shard.crossJoin(F.broadcast(tot))
        .select(
            "shard", "n_docs", "est_tokens",
            F.round(F.col("est_tokens").cast("double") / F.col("t"), 6)
            .alias("token_share"),
            F.round(
                F.col("est_tokens").cast("double") * _N_SHARDS / F.col("t"), 6
            ).alias("load_factor"),
        )
        .orderBy("shard")
    )


@query(
    "text_length_outlier_mad",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    med AS (
      SELECT source, MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END)
               AS median_chars
      FROM ranked GROUP BY source
    ),
    dev AS (
      SELECT d.source, d.doc_id, m.median_chars,
             ABS(d.n_chars - m.median_chars) AS dv
      FROM documents d JOIN med m USING (source)
    ),
    ranked2 AS (
      SELECT source, doc_id, median_chars, dv,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY dv, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM dev
    ),
    mad AS (
      SELECT source, MAX(CASE WHEN rn = (n + 1) // 2 THEN dv END)
               AS mad_chars
      FROM ranked2 GROUP BY source
    ),
    worst AS (
      SELECT source, doc_id, dv FROM (
        SELECT source, doc_id, dv,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY dv DESC, doc_id DESC) AS rn
        FROM dev
      ) WHERE rn = 1
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(d.median_chars) AS BIGINT) AS median_chars,
           CAST(MAX(m.mad_chars) AS BIGINT) AS mad_chars,
           CAST(SUM(CASE WHEN d.dv > 3 * m.mad_chars
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(MAX(w.dv) AS BIGINT) AS max_dev,
           CAST(MAX(w.doc_id) AS BIGINT) AS worst_doc_id
    FROM dev d
    JOIN mad m USING (source)
    JOIN worst w ON w.source = d.source
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("text", "quality", "outlier", "llm-pipeline"),
    doc="Robust per-source length-outlier census — the median/MAD twin "
        "of the mean/std censor (a single 100 MB crawl artifact shifts "
        "a mean but not a median): type-1 medians select by RANK "
        "(ceil(n/2), doc_id tiebreak — pure integers, no interpolating "
        "percentile, the text_doc_length_percentiles discipline), "
        "deviation and MAD stay integers, and the 3-MAD flag is an "
        "integer compare — nothing for float drift to touch. Flags the "
        "truncation/boilerplate artifacts a length-quality gate drops. "
        "Scale: two sort-windows PARTITIONED BY the same source key "
        "(one hash exchange, re-sorted in place) + one broadcast of "
        "the |sources|-row median/MAD relations back onto the corpus; "
        "the final aggregate is map-side combinable on source.",
)
def text_length_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "source", "doc_id", "n_chars"
    )
    w_rank = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("source")
    med = (
        docs.select(
            "source", "n_chars",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_n).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("source", F.col("n_chars").alias("median_chars"))
    )
    dev = docs.join(F.broadcast(med), "source").select(
        "source", "doc_id", "median_chars",
        F.abs(F.col("n_chars") - F.col("median_chars")).alias("dv"),
    )
    w_rank2 = Window.partitionBy("source").orderBy("dv", "doc_id")
    mad = (
        dev.select(
            "source", "dv",
            F.row_number().over(w_rank2).alias("rn"),
            F.count("*").over(w_n).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("source", F.col("dv").alias("mad_chars"))
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("median_chars").cast("long").alias("median_chars"),
            F.max("mad_chars").cast("long").alias("mad_chars"),
            F.sum(
                F.when(F.col("dv") > 3 * F.col("mad_chars"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.max(F.struct(F.col("dv").alias("d"),
                           F.col("doc_id").alias("i"))).alias("w"),
        )
        .select(
            "source", "n_docs", "median_chars", "mad_chars", "n_outliers",
            F.col("w.d").cast("long").alias("max_dev"),
            F.col("w.i").cast("long").alias("worst_doc_id"),
        )
        .orderBy("source")
    )


_C4_LINE_KEEP = (
    "x -> size(filter(split(x, ' '), y -> y != '')) >= 3"
    " AND NOT x LIKE '%{%'"
    " AND NOT lower(x) LIKE '%javascript%'"
    " AND NOT lower(x) LIKE '%lorem ipsum%'"
)


@query(
    "text_c4_line_cleaning",
    oracle="""
    WITH cleaned AS (
      SELECT source,
             string_split(text, '. ') AS ls,
             list_filter(string_split(text, '. '),
               x -> len(list_filter(string_split(x, ' '),
                                    y -> y <> '')) >= 3
                    AND x NOT LIKE '%{%'
                    AND lower(x) NOT LIKE '%javascript%'
                    AND lower(x) NOT LIKE '%lorem ipsum%') AS kept
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(ls)) AS BIGINT) AS n_lines,
           CAST(SUM(len(kept)) AS BIGINT) AS n_kept,
           CAST(SUM(length(array_to_string(kept, ''))) AS BIGINT)
             AS kept_chars,
           CAST(SUM(CAST('0x' || substr(
             md5(array_to_string(kept, chr(10))), 1, 8) AS BIGINT))
             AS BIGINT) AS cleaned_checksum
    FROM cleaned GROUP BY source ORDER BY source
    """,
    tags=("text", "quality", "c4", "transform"),
    doc="C4 line-level cleaning as a TRANSFORMATION (Raffel et al. 2020 "
        "§2.2 applies its rules per LINE and reassembles the page; "
        "text_c4_heuristics only reports whole-doc pass flags): each "
        "document splits into sentence-lines, lines failing the "
        ">=3-words / no-brace / no-javascript / no-lorem rules drop, "
        "and the survivors reassemble into the cleaned document. The "
        "cleaned text itself is proven, not just counted: per-source "
        "sums of each cleaned doc's 32-bit md5 prefix must match the "
        "oracle's reassembly bit-for-bit (order-independent integer "
        "lane, the PII-redaction md5 pattern). Scale: pure per-row "
        "string kernels (split/filter/array_join, whole-stage codegen, "
        "zero Python) folding into a |sources|-key map-side aggregate "
        "— the transform is embarrassingly parallel at any corpus "
        "size, exactly how a 100 TB C4 rebuild runs.",
)
def text_c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    lines = F.expr("split(text, '\\\\. ')")
    kept = F.expr(f"filter(split(text, '\\\\. '), {_C4_LINE_KEEP})")
    per = docs.select(
        "source",
        F.size(lines).alias("ls_n"),
        F.size(kept).alias("kept_n"),
        F.length(F.array_join(kept, "")).alias("kept_chars"),
        F.conv(
            F.substring(F.md5(F.array_join(kept, "\n")), 1, 8), 16, 10
        ).cast("long").alias("csum"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ls_n").cast("long").alias("n_lines"),
            F.sum("kept_n").cast("long").alias("n_kept"),
            F.sum("kept_chars").cast("long").alias("kept_chars"),
            F.sum("csum").cast("long").alias("cleaned_checksum"),
        )
        .orderBy("source")
    )
