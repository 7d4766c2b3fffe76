"""Round-5 semantics: threshold-derived prefix filtering completeness
(the AllPairs bound) and the real PNG resize pipeline."""

import itertools

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES


def _shingle_set(text: str) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def test_prefix_filter_blocker_is_complete_at_threshold(spark, tmp_path):
    """AllPairs completeness property (r4 verdict item #4): every pair
    with true shingle-set Jaccard >= t (t = 0.8) must appear in the
    query output — the threshold-derived prefix may only prune pairs
    BELOW the threshold. Brute-force all-pairs Jaccard on the driver is
    the oracle; the corpus is engineered with pairs straddling t."""
    words = [f"tok{i}" for i in range(60)]
    docs = []
    # 12 unrelated base docs (pairwise low Jaccard)
    for d in range(12):
        toks = [words[(d * 13 + j * 7) % 60] for j in range(24)]
        docs.append((d, " ".join(toks)))
    # near-identical twins (J well above 0.8): copy with one word changed
    for i, base in enumerate(docs[:4]):
        toks = base[1].split(" ")
        toks[-1] = "zz%d" % i
        docs.append((100 + i, " ".join(toks)))
    # borderline pairs (J below 0.8): copy with ~40% replaced
    for i, base in enumerate(docs[4:8]):
        toks = base[1].split(" ")
        for j in range(0, len(toks), 3):
            toks[j] = "yy%d_%d" % (i, j)
        docs.append((200 + i, " ".join(toks)))

    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_prefix_filter_pairs"].build(
            spark, str(tmp_path)).collect()
    }

    sets = {i: _shingle_set(t) for i, t in docs}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * 5 >= union * 4:  # J >= 4/5, exact integers
            want.add((a, b))
    assert want, "fixture must contain above-threshold pairs"
    assert len(want) <= 20, "fixture must fit inside the LIMIT"
    # completeness: nothing above the threshold is missed, and the
    # J >= t output filter means nothing below it appears either
    assert got == want


# ---------------------------------------------------------------------------
# round-5 operators: substring-span dedup + SemDeDup
# ---------------------------------------------------------------------------

K = 12  # must match llm_ops._SUBSTR_K


def _write_docs(spark, out, rows):
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def test_substring_spans_golden(spark, tmp_path):
    """Designed corpus: a 20-token run copied between docs 0/1 at the
    SAME offset, an internal 12-token repeat in doc 2 whose two window
    positions sit exactly k apart (must merge into ONE span), and a
    fully unique doc 3 (no spans)."""
    a = [f"a{i}" for i in range(40)]
    doc0 = " ".join(a)
    doc1 = " ".join([f"b{i}" for i in range(10)] + a[10:30]
                    + [f"c{i}" for i in range(10)])
    d = [f"d{i}" for i in range(12)]
    doc2 = " ".join(d + d + [f"e{i}" for i in range(6)])
    doc3 = " ".join(f"u{i}" for i in range(30))
    out = str(tmp_path)
    _write_docs(spark, out, [(0, doc0), (1, doc1), (2, doc2), (3, doc3)])

    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in QUERIES["dedup_substring_spans"].build(spark, out).collect()
    )
    # run a10..a29: duplicated windows p=10..18 in both docs -> one
    # maximal span [10, 29] of 20 tokens each; doc 2's windows at 0 and
    # 12 (gap == k) merge to [0, 23]
    assert got == [(0, 10, 29, 20), (1, 10, 29, 20), (2, 0, 23, 24)]


def _brute_spans(texts: dict) -> set:
    """Independent driver-side reimplementation: rolling windows, count
    across the corpus, merge duplicated positions with gap > K breaking."""
    from collections import Counter

    wins = {}
    counts = Counter()
    for doc, text in texts.items():
        toks = text.split(" ")
        ps = list(range(len(toks) - K + 1))
        wins[doc] = [(p, " ".join(toks[p:p + K])) for p in ps]
        counts.update(w for _, w in wins[doc])
    spans = set()
    for doc in texts:
        dup = [p for p, w in wins[doc] if counts[w] >= 2]
        run = []
        for p in dup:
            if run and p - run[-1] > K:
                spans.add((doc, run[0], run[-1] + K - 1, run[-1] + K - run[0]))
                run = []
            run.append(p)
        if run:
            spans.add((doc, run[0], run[-1] + K - 1, run[-1] + K - run[0]))
    return spans


def test_substring_spans_match_brute_force(spark, tmp_path):
    """Pseudo-random corpus with planted copies at varying offsets and
    lengths; the query must equal the brute-force span set exactly."""
    import random

    rng = random.Random(7)
    texts = {}
    for doc in range(12):
        texts[doc] = " ".join(f"w{rng.randrange(500)}" for _ in range(60))
    # plant: doc 100 copies doc0[5:45] at offset 3; doc 101 copies
    # doc1[0:20] twice back-to-back; doc 102 copies doc2[10:22] (== K,
    # minimal duplicated run)
    t0 = texts[0].split(" ")
    texts[100] = " ".join(["x0", "x1", "x2"] + t0[5:45] + ["x3"])
    t1 = texts[1].split(" ")
    texts[101] = " ".join(t1[0:20] + t1[0:20])
    t2 = texts[2].split(" ")
    texts[102] = " ".join(["y%d" % i for i in range(7)] + t2[10:22])
    out = str(tmp_path)
    _write_docs(spark, out, sorted(texts.items()))

    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in QUERIES["dedup_substring_spans"].build(spark, out).collect()
    }
    assert got == _brute_spans(texts)
    # sanity: the planted structures actually produced spans
    assert any(d == 102 for d, *_ in got)


def _write_vecs(spark, out, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def _basis(i, dim=64, scale=1.0, extra=()):
    v = [0.0] * dim
    v[i] = scale
    for j, s in extra:
        v[j] = s
    return v


def test_semdedup_drops_within_cell_keeps_lowest_id(spark, tmp_path):
    """16 orthogonal seed vectors own one cell each; vecs 16-19 are
    near-copies of vec 0, land in its cell, and must be dropped with
    kept_id=0 and n_dups counting every lower-id near-dup in the cell.
    vec 20 is assigned to cell 0 (weak 0.3 alignment beats the other
    15 zero-cos centroids) but every pair similarity is below tau=0.4,
    so it survives."""
    rows = [(i, _basis(i), 0) for i in range(16)]
    for j in range(4):
        rows.append((16 + j, _basis(0, extra=[(1 + j, 0.01)]), 0))
    rows.append((20, _basis(0, scale=0.3, extra=[(40, 0.95)]), 0))
    out = str(tmp_path)
    _write_vecs(spark, out, rows)

    got = {
        r.vec_id: (r.cell, r.kept_id, r.n_dups, r.max_sim)
        for r in QUERIES["dedup_semdedup_dropped"].build(spark, out).collect()
    }
    assert set(got) == {16, 17, 18, 19}  # vec 0 kept, vec 20 survives
    for j in range(4):
        cell, kept, n_dups, max_sim = got[16 + j]
        assert (cell, kept) == (0, 0)
        assert n_dups == 1 + j  # 16: {0}; 17: {0,16}; 18: +17; 19: +18
        assert max_sim > 0.99


def test_semdedup_orthogonal_corpus_drops_nothing(spark, tmp_path):
    rows = [(i, _basis(i % 64, scale=1.0 + i // 64), 0) for i in range(32)]
    out = str(tmp_path)
    _write_vecs(spark, out, rows)
    # vecs 0-31 are pairwise orthogonal -> no pair reaches tau anywhere
    assert QUERIES["dedup_semdedup_dropped"].build(spark, out).count() == 0


def test_decontam_substring_flags_designed_leak(spark, tmp_path):
    """doc 0 (eval: 0 % 97 == 0) shares a 15-token run with train doc 5
    at a different offset; train doc 6 is clean. Only doc 5's leaked
    interval may appear — localized to the exact tokens."""
    leak = [f"L{i}" for i in range(15)]
    doc0 = " ".join([f"p{i}" for i in range(4)] + leak)
    doc5 = " ".join([f"q{i}" for i in range(7)] + leak + ["q99"])
    doc6 = " ".join(f"z{i}" for i in range(25))
    out = str(tmp_path)
    _write_docs(spark, out, [(0, doc0), (5, doc5), (6, doc6)])

    got = [
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in QUERIES["decontam_substring_spans"].build(spark, out).collect()
    ]
    # leak occupies positions 7..21 in doc 5; its 12-windows start at
    # p=7..10 -> span [7, 21], 15 tokens. Eval doc 0 itself is excluded.
    assert got == [(5, 7, 21, 15)]


def test_decontam_substring_fires_at_bench_scale(spark):
    # sf0.01 is legitimately empty (no 12-token run crosses the %97
    # split); the operator must actually fire at bench scale
    df = QUERIES["decontam_substring_spans"].build(spark, "/root/testdata/sf0.1")
    assert df.count() > 0


def test_centroid_outliers_flags_planted_outlier(spark, tmp_path):
    """16 orthogonal seeds own one cell each; cell 0 gets 6 extra
    members exactly along its axis (cosine 1) plus ONE planted vector at
    45 degrees (cosine ~0.7071, assigned to cell 0 by the tie-break).
    mean-2sd for cell 0 lands at ~0.7697, so exactly the planted vector
    flags; every single-member cell has sd 0 and must flag nothing."""
    rows = [(i, _basis(i), 0) for i in range(16)]
    rows += [(17 + j, _basis(0, scale=float(j + 2)), 0) for j in range(6)]
    rows.append((16, _basis(0, extra=[(1, 1.0)]), 0))  # planted outlier
    out = str(tmp_path)
    _write_vecs(spark, out, rows)

    got = {r.cell: r for r in
           QUERIES["embed_centroid_outliers"].build(spark, out).collect()}
    c0 = got[0]
    assert c0.n_members == 8
    assert c0.n_outliers == 1
    assert c0.worst_vec_id == 16
    assert abs(c0.worst_sim - 0.707107) < 1e-6
    for cell, r in got.items():
        if cell != 0:
            assert r.n_outliers == 0 and r.sd_sim == 0.0


def test_contamination_report_is_consistent_with_components(spark, tmp_path):
    """The report must be EXACTLY the roll-up of the three registered
    decontamination queries on the same corpus: a designed corpus fires
    substring (15-token leak at a shifted offset) and the whole-doc
    methods (doc 7 is a near-copy of eval doc 0)."""
    leak = [f"L{i}" for i in range(15)]
    doc0 = " ".join([f"p{i}" for i in range(4)] + leak)      # eval (0 % 97)
    doc5 = " ".join([f"q{i}" for i in range(7)] + leak + ["q99"])
    doc6 = " ".join(f"z{i}" for i in range(25))              # clean
    doc7 = " ".join([f"p{i}" for i in range(4)] + leak[:-1] + ["tail"])
    out = str(tmp_path)
    _write_docs(spark, out, [(0, doc0), (5, doc5), (6, doc6), (7, doc7)])

    rep = {r.method: r.docs_flagged for r in
           QUERIES["curation_contamination_report"].build(spark, out).collect()}
    assert set(rep) == {"ngram_overlap", "minhash_fuzzy",
                        "substring_spans", "any_method"}

    ng = {r.doc_id for r in
          QUERIES["decontam_ngram_overlap"].build(spark, out)
          .filter("contaminated").collect()}
    fz = {r.train_doc for r in
          QUERIES["decontam_minhash_fuzzy"].build(spark, out)
          .filter("contaminated").collect()}
    ss = {r.doc_id for r in
          QUERIES["decontam_substring_spans"].build(spark, out).collect()}
    assert rep["ngram_overlap"] == len(ng)
    assert rep["minhash_fuzzy"] == len(fz)
    assert rep["substring_spans"] == len(ss)
    assert rep["any_method"] == len(ng | fz | ss)
    # the designed corpus fires at least the substring and one
    # whole-doc method, so the test is non-vacuous
    assert ss and (ng or fz)
    assert rep["any_method"] >= max(rep["ngram_overlap"],
                                    rep["minhash_fuzzy"],
                                    rep["substring_spans"])


def test_cluster_representatives_prefer_quality_over_min_id(spark, tmp_path):
    """Docs 0/1/2 are near-identical (one LSH cluster, min id 0), but doc
    2 carries the full 25-token body while docs 0/1 are truncated below
    the 20-token quality window — the representative must be doc 2
    (higher quality score), flagged as replacing the min id."""
    base = [f"w{i}" for i in range(25)]
    doc2 = " ".join(base)
    doc0 = " ".join(base[:12])           # truncated: fails length window
    doc1 = " ".join(base[:12] + ["x1"])  # truncated variant
    solo = " ".join(f"s{i}" for i in range(30))
    out = str(tmp_path)
    _write_docs(spark, out, [(0, doc0), (1, doc1), (2, doc2), (9, solo)])

    rows = {r.cluster_id: r for r in
            QUERIES["curation_cluster_representatives"].build(spark, out)
            .collect()}
    assert 0 in rows, "docs 0/1/2 must form one cluster labeled 0"
    rep = rows[0]
    assert rep.rep_doc_id == 2
    assert rep.replaced_min_id == 1
    assert rep.rep_quality > 0
    # the unrelated solo doc shares no shingles -> never clustered
    assert all(r.rep_doc_id != 9 for r in rows.values())


def test_unigram_logprob_unk_bucket_with_tiny_cap(spark, tmp_path, monkeypatch):
    """Patch the vocab cap to 2 so the <unk> bucket binds: corpus counts
    a=4 b=3 c=3 -> head = {a, b} (count desc, word tiebreak), c's mass
    (3/10) flows through <unk>. Checked against hand-computed logprobs."""
    import math

    from arango_clickhouse_replica_spark.queries import text_lm

    monkeypatch.setattr(text_lm, "_VOCAB_CAP", 2)
    out = str(tmp_path)
    _write_docs(spark, out, [(0, "a a a b b c"), (1, "a b c c")])

    got = {r.doc_id: (r.n_tokens, r.avg_logprob_bits) for r in
           text_lm.text_unigram_logprob(spark, out).collect()}
    lp = {w: round(math.log2(c / 10), 6) for w, c in
          [("a", 4), ("b", 3), ("unk", 3)]}
    exp0 = (3 * lp["a"] + 2 * lp["b"] + 1 * lp["unk"]) / 6
    exp1 = (1 * lp["a"] + 1 * lp["b"] + 2 * lp["unk"]) / 4
    assert got[0][0] == 6 and abs(got[0][1] - exp0) < 1e-9
    assert got[1][0] == 4 and abs(got[1][1] - exp1) < 1e-9


def test_unigram_logprob_no_unk_when_cap_unbound(spark, tmp_path):
    """With the production cap, fixture vocab never overflows — results
    must equal the uncapped model (every word in head, <unk> unread)."""
    import math

    out = str(tmp_path)
    _write_docs(spark, out, [(0, "x x y"), (1, "y z")])
    got = {r.doc_id: r.avg_logprob_bits for r in
           QUERIES["text_unigram_logprob"].build(spark, out).collect()}
    lp = {w: round(math.log2(c / 5), 6) for w, c in
          [("x", 2), ("y", 2), ("z", 1)]}
    assert abs(got[0] - (2 * lp["x"] + lp["y"]) / 3) < 1e-9
    assert abs(got[1] - (lp["y"] + lp["z"]) / 2) < 1e-9


def test_pca_power_iteration_finds_planted_axis(spark, tmp_path):
    """40 vectors hug axis 0 (length 10, tiny per-vector tilt onto a
    second axis), so the top principal direction must be ~e0: loading
    of dim 0 near 1, every other |loading| small, eigenvalue ~ sum of
    squared projections (~40 * 100)."""
    rows = [(i, _basis(0, scale=10.0, extra=[(1 + i % 4, 0.1)]), 0)
            for i in range(40)]
    out = str(tmp_path)
    _write_vecs(spark, out, rows)

    got = {r.dim: r for r in
           QUERIES["embed_pca_power_iteration"].build(spark, out).collect()}
    assert len(got) == 64
    assert abs(got[0].loading) > 0.999
    assert all(abs(r.loading) < 0.02 for d, r in got.items() if d != 0)
    lam = got[0].eigenvalue_est
    assert 3900 < lam < 4100


def test_bpe_train_steps_golden(spark, tmp_path):
    """'low lower lowest': round-1 pair stats are lo:3 ow:3 we:2 er/es/st:1
    -> argmax with (count desc, pair asc) tiebreak picks ('l','o'); after
    merging, round 2 must pick ('lo','w') on the REWRITTEN tokens —
    proving the trainer recounts rather than taking round-1's top-2.
    Token totals: 3+5+6=14 chars -> 11 after merge 1 -> 8 after merge 2."""
    out = str(tmp_path)
    _write_docs(spark, out, [(1, "low lower lowest")])

    rows = {r.merge_rank: r for r in
            QUERIES["text_bpe_train_steps"].build(spark, out).collect()}
    r1, r2 = rows[1], rows[2]
    assert (r1.pair_x, r1.pair_y, r1.pair_count) == ("l", "o", 3)
    assert r1.corpus_tokens_after == 11
    assert (r2.pair_x, r2.pair_y, r2.pair_count) == ("lo", "w", 3)
    assert r2.corpus_tokens_after == 8


def test_bpe_merge_transform_matches_reference_on_random_words(spark, tmp_path):
    """The disjoint-match array transform must equal reference greedy
    leftmost BPE for a single (x, y) merge with x != y — stressed on
    random words over a 2-letter alphabet (maximal run/overlap density).
    One corpus engineered so the learned first merge is ('a','b')."""
    import random

    rng = random.Random(7)
    words = ["ab"] * 50  # dominate pair stats -> merge1 = (a, b)
    words += ["".join(rng.choice("ab") for _ in range(rng.randrange(1, 12)))
              for _ in range(120)]
    out = str(tmp_path)
    _write_docs(spark, out, [(1, " ".join(words))])

    rows = QUERIES["text_bpe_train_steps"].build(spark, out).collect()
    m1 = next(r for r in rows if r.merge_rank == 1)
    assert (m1.pair_x, m1.pair_y) == ("a", "b")

    def ref_merge(w, x, y):
        toks, i = [], 0
        cs = list(w)
        while i < len(cs):
            if i + 1 < len(cs) and cs[i] == x and cs[i + 1] == y:
                toks.append(x + y)
                i += 2
            else:
                toks.append(cs[i])
                i += 1
        return toks

    # corpus_tokens_after is the aggregate witness of every word's merge
    from collections import Counter
    cw = Counter(words)
    expect = sum(c * len(ref_merge(w, "a", "b")) for w, c in cw.items())
    assert m1.corpus_tokens_after == expect


def test_lsh_precision_report_on_engineered_corpus(spark, tmp_path):
    """One true near-dup pair (J=1 twins) among unrelated docs: whatever
    each blocker emits, every emitted twin pair must clear J >= 0.9, and
    the minhash row must contain the twins (identical shingles collide
    in every band)."""
    twin = " ".join(f"t{i}" for i in range(30))
    docs = [(0, twin), (1, twin)]
    docs += [(10 + i, " ".join(f"u{i}_{j}" for j in range(25)))
             for i in range(6)]
    out = str(tmp_path)
    _write_docs(spark, out, docs)

    rows = {r.method: r for r in
            QUERIES["dedup_lsh_precision_report"].build(spark, out).collect()}
    mh = rows["minhash_lsh"]
    assert mh.n_candidates >= 1
    assert mh.n_j90 >= 1
    # unrelated docs share no shingles -> no spurious candidates, so
    # precision at 0.5 is exactly 1.0 for every reported method
    for r in rows.values():
        assert r.n_j50 == r.n_candidates
        assert r.precision_at_50 == 1.0


def test_ngram_novelty_first_occurrence_semantics(spark, tmp_path):
    """doc 0 introduces everything (novelty 1); doc 1 repeats doc 0
    exactly (novelty 0); doc 2 is half doc-0 trigrams, half new."""
    a = [f"a{i}" for i in range(12)]
    doc2 = " ".join(a[:6] + [f"z{i}" for i in range(6)])
    out = str(tmp_path)
    _write_docs(spark, out, [(0, " ".join(a)), (1, " ".join(a)), (2, doc2)])

    got = {r.doc_id: r for r in
           QUERIES["text_ngram_novelty"].build(spark, out).collect()}
    assert got[0].novelty == 1.0
    assert got[1].novelty == 0.0
    # doc 2: 10 trigrams, the first 4 (within a[:6]) already seen
    assert got[2].n_shingles == 10 and got[2].n_novel == 6
    assert abs(got[2].novelty - 0.6) < 1e-9
