"""Golden tests for the round-4 operators.

The driver's oracle check proves cross-engine parity, but at sf0.01 some
of these relations are legitimately empty (no eval-leak pair happens to
cross the %97 split), so parity alone would pass vacuously. These tests
construct corpora where the expected output is KNOWN and assert it.
"""

import pytest

from arango_clickhouse_replica_spark.queries import QUERIES


@pytest.fixture(scope="module")
def toy_docs_dir(spark, tmp_path_factory):
    """A documents.parquet fixture with a designed near-dup structure:

    - doc 0 (eval: 0 % 97 == 0) and doc 1 (train) share ALL shingles
      (identical text) -> guaranteed band hit + 8/8 lane agreement.
    - doc 2 (train) is unrelated text -> no hit.
    - docs 3/4 are identical to each other (both train) -> simhash
      hamming 0 pair, but NOT a decontamination hit (neither is eval).
    """
    common = "the quick brown fox jumps over the lazy dog again and again today"
    other = "entirely different words compose this second document corpus sample here now"
    third = "numerical linear algebra kernels dominate training throughput on accelerators"
    rows = [
        (0, common, "en", "web"),
        (1, common, "en", "web"),
        (2, other, "en", "web"),
        (3, third, "en", "web"),
        (4, third, "en", "web"),
    ]
    out = str(tmp_path_factory.mktemp("toy_sf"))
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_fuzzy_decontam_flags_designed_leak(spark, toy_docs_dir):
    got = QUERIES["decontam_minhash_fuzzy"].build(spark, toy_docs_dir).collect()
    hits = {(r.train_doc, r.eval_doc): (r.lanes_eq, r.contaminated) for r in got}
    # the identical train/eval pair is found and flagged with full lane
    # agreement; no other (train, eval) pair exists to hit
    assert hits == {(1, 0): (8, True)}


def test_fuzzy_decontam_fires_on_fixture_at_bench_scale(spark):
    # the sf0.01 driver check can be legitimately empty; the bench-scale
    # fixture must actually exercise the operator
    df = QUERIES["decontam_minhash_fuzzy"].build(spark, "/root/testdata/sf0.1")
    assert df.count() > 0


def test_simhash_hamming_pairs_find_identical_docs(spark, toy_docs_dir):
    got = QUERIES["dedup_simhash_hamming_pairs"].build(spark, toy_docs_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in got}
    # identical texts have identical simhashes -> hamming 0, always within
    # the <= 3 ball and always sharing every band
    assert pairs[(0, 1)] == 0
    assert pairs[(3, 4)] == 0
    # unrelated 32-bit signatures are ~16 bits apart; doc 2 must not pair
    assert not any(2 in p for p in pairs)


def test_bpe_merge_pairs_counts_weighted_adjacent_pairs(spark, tmp_path):
    out = str(tmp_path)
    spark.createDataFrame(
        [(0, "aaab aaab aaab", "en", "web", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = QUERIES["text_bpe_merge_pairs"].build(spark, out).collect()
    counts = {r.pair: r.pair_count for r in got}
    # piece 'aaab' x3: adjacent pairs per occurrence are aa, aa, ab
    assert counts == {"aa": 6, "ab": 3}
    # and the first learned merge is the argmax pair
    assert got[0].pair == "aa" and got[0].pair_count == 6


def test_snapshot_diff_statuses_match_stream_construction(spark, sf_dir):
    rows = QUERIES["cdc_snapshot_diff"].build(spark, sf_dir).collect()
    offset = 1 << 40
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, set()).add(r.event_id)
    # the synthetic stream: deletes at %20==7, value updates at %10==0,
    # inserts are the offset keys at %25==9; everything else unchanged
    assert by_status["removed"] == {e for e in by_status["removed"] if e % 20 == 7}
    assert all(e % 10 == 0 for e in by_status["changed"])
    assert all(e >= offset and (e - offset) % 25 == 9 for e in by_status["added"])
    assert by_status["added"] and by_status["removed"] and by_status["changed"]
    # changed rows change exactly the value column
    assert {r.changed_cols for r in rows if r.status == "changed"} == {"value"}
    assert {r.changed_cols for r in rows if r.status != "changed"} == {""}
    # the diff covers every snapshot key plus every inserted key, once
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_inserts = len(by_status["added"])
    assert len(rows) == n_events + n_inserts


def test_simhash_banding_is_complete_within_hamming_3(spark, tmp_path):
    """Pigeonhole completeness: on a corpus of random-ish docs, the banded
    candidate search returns EXACTLY the pairs a brute-force all-pairs
    Hamming scan finds within distance 3 (banding may only cut candidates
    beyond the ball, never inside it)."""
    import itertools

    from pyspark.sql import functions as F

    # deterministic pseudo-random corpus: md5-derived word soup, with a
    # couple of engineered near-identical pairs to populate the <=3 ball
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(30):
        toks = [words[(d * 7 + j * 11) % 40] for j in range(25)]
        rows.append((d, " ".join(toks)))
    rows.append((100, rows[0][1]))            # identical twin of doc 0
    rows.append((101, rows[1][1] + " extra")) # near twin of doc 1
    out = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["dedup_simhash_hamming_pairs"].build(spark, out).collect()
    }

    # brute force over the same 32-bit signatures (reuse the query's own
    # signature relation by recomputing it via the fingerprints pipeline
    # semantics: group the pair query's bands back is circular, so rebuild
    # from first principles on the driver)
    from arango_clickhouse_replica_spark.queries.llm_ops import _doc_shingles
    import hashlib

    sh = (
        _doc_shingles(spark, out)
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("ss"))
        .collect()
    )
    def simhash64(shingles):
        bal = [0] * 64
        for s in shingles:
            h = hashlib.md5(s.encode()).hexdigest()
            for g in range(32):
                n = int(h[g], 16)
                bal[g] += 1 if (n & 8) else -1       # nibble bit 3 -> low half
                bal[32 + g] += 1 if (n & 4) else -1  # nibble bit 2 -> high half
        return sum((1 << g) for g in range(64) if bal[g] >= 0)

    sig = {r.doc_id: simhash64(r.ss) for r in sh}
    expected = {}
    for a, b in itertools.combinations(sorted(sig), 2):
        d = bin(sig[a] ^ sig[b]).count("1")
        if d <= 3:
            expected[(a, b)] = d
    assert got == expected
    assert (0, 100) in got and got[(0, 100)] == 0  # the engineered twin
