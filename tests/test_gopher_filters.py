"""Round-6 Gopher-family semantics: repetition scores, quality flags,
exact percentiles, mixture weights, epoch shuffle — golden values on
hand-built corpora (the driver's DuckDB oracle covers fixture-scale
hashing; these pin the SEMANTICS)."""

import hashlib

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES


def _write_docs(spark, out, rows):
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, t, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def test_gopher_repetition_golden(spark, tmp_path):
    rows = [
        # "a a a a": max word 4/4, top bigram ("a a" x3) 2*3/4, trigrams
        # "a a a" x2 -> dup occurrences 2/2
        (1, "a a a a", "s"),
        # all-distinct: max word 1/4, top bigram 2/4, no dup trigram
        (2, "w x y z", "s"),
        # two words only: no trigram row (left join -> 0.0 path)
        (3, "p q", "s"),
    ]
    _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: r
        for r in QUERIES["text_gopher_repetition"]
        .build(spark, str(tmp_path)).collect()
    }
    assert got[1].max_word_frac == 1.0
    assert got[1].top_bigram_frac == 1.5  # 2*3/4
    assert got[1].dup_trigram_frac == 1.0
    assert got[2].max_word_frac == 0.25
    assert got[2].top_bigram_frac == 0.5
    assert got[2].dup_trigram_frac == 0.0
    assert got[3].n_words == 2
    assert got[3].dup_trigram_frac == 0.0


def test_gopher_quality_flags_golden(spark, tmp_path):
    good = " ".join(
        ["the", "a"] + [f"word{i}" for i in range(28)]
    )  # 30 words, mean len ok, 2 short words (2/30 <= 20%), 2 stopwords
    too_short = "the a data"  # fails word count
    no_stop = " ".join(f"zz{i}" for i in range(30))  # fails stopword rule
    shorties = " ".join(["a"] * 15 + [f"word{i}" for i in range(15)])
    rows = [(1, good, "s1"), (2, too_short, "s1"),
            (3, no_stop, "s2"), (4, shorties, "s2")]
    _write_docs(spark, tmp_path, rows)
    got = {
        r.source: r
        for r in QUERIES["text_gopher_quality_flags"]
        .build(spark, str(tmp_path)).collect()
    }
    assert got["s1"].n_docs == 2
    assert got["s1"].n_pass_wordcount == 1  # only doc 1
    assert got["s1"].n_pass_all == 1
    # doc 4 has 'a' only -> 1 distinct stopword, below the >= 2 bar
    assert got["s2"].n_pass_stopword == 0
    assert got["s2"].n_pass_shortword == 1  # doc 4: 15/30 short -> fail
    assert got["s2"].n_pass_all == 0


def test_length_percentiles_exact_selection(spark, tmp_path):
    # 4 docs, lengths 10/20/30/40: ceil-rank selection -> p25 = value at
    # rank ceil(.25*4)=1, p50 at 2, p75 at 3, p95 at ceil(3.8)=4
    rows = [(i, "x" * (10 * i), "s") for i in (1, 2, 3, 4)]
    _write_docs(spark, tmp_path, rows)
    r = QUERIES["text_doc_length_percentiles"].build(
        spark, str(tmp_path)).collect()[0]
    assert (r.p25, r.p50, r.p75, r.p95) == (10, 20, 30, 40)
    assert r.n_docs == 4


def test_mixture_weights_sum_to_one_and_temper(spark, tmp_path):
    # source 'big' has 16x the tokens of 'small': raw shares 16/17 vs
    # 1/17; alpha=0.5 tempers the ratio from 16x to 4x
    rows = [(i, "w " * 400, "big") for i in range(16)]
    rows += [(100, "w " * 400, "small")]
    _write_docs(spark, tmp_path, rows)
    got = {
        r.source: r.weight
        for r in QUERIES["curation_domain_mixture_weights"]
        .build(spark, str(tmp_path)).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-5
    assert 3.9 < got["big"] / got["small"] < 4.1


def test_epoch_shuffle_fingerprint_matches_reference(spark, tmp_path):
    rows = [(i, "doc", "s") for i in range(40)]
    _write_docs(spark, tmp_path, rows)
    got = QUERIES["curation_epoch_shuffle"].build(spark, str(tmp_path)).collect()
    # reference implementation of the same permutation, pure python
    by_key = {}
    for epoch in range(3):
        for d in range(40):
            h = hashlib.md5(f"{d}:epoch:{epoch}".encode()).hexdigest()
            shard = int(h[0], 16) % 8
            by_key.setdefault((epoch, shard), []).append((h, d))
    for r in got:
        members = sorted(by_key.get((r.epoch, r.shard), []))
        assert r.n_docs == len(members)
        want = hashlib.md5(
            ",".join(str(d) for _, d in members).encode()
        ).hexdigest()
        assert r.order_fingerprint == want
    # every epoch covers every doc exactly once
    per_epoch = {}
    for r in got:
        per_epoch[r.epoch] = per_epoch.get(r.epoch, 0) + r.n_docs
    assert per_epoch == {0: 40, 1: 40, 2: 40}
    # and the permutation actually CHANGES between epochs
    fp = {(r.epoch, r.shard): r.order_fingerprint for r in got}
    assert any(
        fp.get((0, s)) != fp.get((1, s)) for s in range(8)
    )


def test_cluster_size_histogram_counts(spark, tmp_path):
    # corpus with one 3-member near-dup group and 9 unrelated docs
    base = [f"base_{j}" for j in range(24)]
    rows = []
    for r in range(3):
        toks = list(base)
        toks[-1] = f"r{r}"
        rows.append((100 + r, " ".join(toks), "s"))
    for d in range(9):
        rows.append((d, " ".join(f"w{d}_{j}" for j in range(24)), "s"))
    _write_docs(spark, tmp_path, rows)
    got = {
        r.cluster_size: r.n_clusters
        for r in QUERIES["dedup_cluster_size_histogram"]
        .build(spark, str(tmp_path)).collect()
    }
    assert got.get(3) == 1
    assert got.get(1) == 9
