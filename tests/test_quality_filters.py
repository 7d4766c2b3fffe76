"""Semantic checks for the quality-filter operators (beyond the DuckDB
oracle parity that test_oracle_parity.py runs for every registered
query): the rewrite keeps exactly the non-duplicated segments, terciles
balance per language, and the classifier's feature algebra holds."""

import hashlib

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


DOCS = [
    # A: unique content — every segment survives the rewrite.
    (1, " ".join(f"a{i}" for i in range(20)), "en", "s1", 100),
    # B and C: identical — every segment duplicated, both rewritten empty.
    (2, " ".join(f"b{i}" for i in range(20)), "en", "s1", 100),
    (3, " ".join(f"b{i}" for i in range(20)), "en", "s2", 100),
    # D: shares its FIRST 8-word segment with E, rest unique.
    (4, " ".join(f"c{i}" for i in range(8)) + " "
        + " ".join(f"d{i}" for i in range(8)), "fr", "s1", 100),
    (5, " ".join(f"c{i}" for i in range(8)) + " "
        + " ".join(f"e{i}" for i in range(8)), "fr", "s2", 100),
    # F..K: distinct docs so terciles have members in both langs.
    (6, "zeta eta theta iota kappa lambda", "en", "s1", 30),
    (7, "mu nu xi omicron pi rho", "en", "s2", 30),
    (8, "sigma tau upsilon phi chi psi", "fr", "s1", 30),
    (9, "alef bet gimel dalet he vav", "fr", "s2", 30),
]


@pytest.fixture(scope="module")
def mini_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("quality_docs")
    df = spark.createDataFrame(
        DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(out / "documents.parquet"))
    return str(out)


def test_segment_rewrite_keeps_unique_drops_duplicated(spark, mini_dir):
    rows = {
        r.doc_id: r
        for r in QUERIES["curation_segment_dedup_rewrite"]
        .build(spark, mini_dir).collect()
    }
    # Unique doc: rewrite is the identity (segments rejoin to the text).
    assert rows[1].n_kept == rows[1].n_segments
    assert rows[1].kept_md5 == _md5(DOCS[0][1])
    # Fully duplicated pair: nothing survives.
    for d in (2, 3):
        assert rows[d].n_kept == 0
        assert rows[d].kept_md5 == _md5("")
    # Partial: docs 4/5 share segment 1 of 2 — only the tail survives.
    assert rows[4].n_segments == 2 and rows[4].n_kept == 1
    assert rows[4].kept_md5 == _md5(" ".join(f"d{i}" for i in range(8)))
    assert rows[5].kept_md5 == _md5(" ".join(f"e{i}" for i in range(8)))


def test_perplexity_buckets_balance_and_order(spark, sf_dir):
    df = QUERIES["curation_perplexity_buckets"].build(spark, sf_dir)
    per = (
        df.groupBy("lang")
        .pivot("bucket", ["head", "middle", "tail"])
        .count()
        .collect()
    )
    for r in per:
        counts = [r.head or 0, r.middle or 0, r.tail or 0]
        assert max(counts) - min(counts) <= 1, r
    # Within a lang, every head score >= every tail score.
    agg = (
        df.groupBy("lang")
        .agg(
            F.min(F.when(F.col("bucket") == "head",
                         F.col("avg_logprob_bits"))).alias("head_min"),
            F.max(F.when(F.col("bucket") == "tail",
                         F.col("avg_logprob_bits"))).alias("tail_max"),
        )
        .collect()
    )
    for r in agg:
        if r.head_min is not None and r.tail_max is not None:
            assert r.head_min >= r.tail_max, r


def test_classifier_feature_algebra(spark, mini_dir):
    rows = (
        QUERIES["text_hashed_ngram_classifier"].build(spark, mini_dir)
        .collect()
    )
    words = {d[0]: len(d[1].split(" ")) for d in DOCS}
    for r in rows:
        # unigrams + bigrams over single-spaced text: n + (n-1) features
        n = words[r.doc_id]
        assert r.n_features == 2 * n - 1, r
        assert r.keep == (r.score_milli_sum >= 0)
        assert -1.0 <= r.score <= 1.0
