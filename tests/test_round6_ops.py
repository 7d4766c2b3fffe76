"""Round-6 semantics: the dup-dense-safe complete dedup composition
(dedup_prefix_filter_clustered) — LSH-cluster collapse first, complete
AllPairs prefix verify within survivors."""

import itertools

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES
from arango_clickhouse_replica_spark.queries.llm_ops import clusters_relation
from arango_clickhouse_replica_spark.queries.retrieval import (
    _prefix_verified_pairs,
    _survivor_shingles,
)


def _shingle_set(text: str) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def _write_docs(spark, out, rows):
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def _dup_dense_corpus():
    """12 distinct base docs; bases 0-3 replicated 4x with one-word
    salting (true J >= 0.8 sibling groups — the dup-dense shape the 50x
    probe salts at corpus scale). Sibling groups are capped at 5 members
    because at this corpus size the hot-shingle df cap is
    max(5, n_docs//100) = 5: a 6-member group's shared shingles would go
    hot (df = 6 > 5) and be dropped from the MinHash signatures, making
    the group invisible to LSH by design."""
    docs = []
    # disjoint per-doc vocabularies: base docs share NO shingles, so the
    # only cross-doc document frequency comes from the sibling groups
    # (shared base-text shingles would all go hot under the small-corpus
    # cap and vanish from the MinHash signatures)
    for d in range(12):
        toks = [f"w{d}_{j}" for j in range(24)]
        docs.append((d, " ".join(toks)))
    nxt = 100
    for base_id, text in docs[:4]:
        toks = text.split(" ")
        for r in range(4):
            rep = list(toks)
            rep[-1] = f"r{base_id}_{r}"
            docs.append((nxt, " ".join(rep)))
            nxt += 1
    # one borderline pair (J ~ 0.45, below t = 0.8): shares a 14-token
    # run with doc 11, so the survivor blocking stage has candidates to
    # verify-and-reject
    docs.append((300, " ".join([f"w11_{j}" for j in range(14)]
                               + [f"x{j}" for j in range(10)])))
    return docs


def test_clustered_prefix_residual_is_complete_among_survivors(spark, tmp_path):
    """THE contract of the composition: after LSH collapse, the complete
    prefix pass must report EXACTLY the J >= 0.8 pairs among survivors
    (brute force over survivor shingle sets is the oracle). Whatever the
    probabilistic bands caught or missed, no above-threshold survivor
    pair may escape, and nothing below the threshold may appear."""
    docs = _dup_dense_corpus()
    _write_docs(spark, tmp_path, docs)

    survivors = {
        r.doc_id
        for r in _survivor_shingles(spark, str(tmp_path))
        .select("doc_id").distinct().collect()
    }
    assert survivors, "collapse must leave survivors"
    # the dup-dense mass must actually collapse: each 6-member sibling
    # group (base + 5 replicas) keeps at most one member... unless the
    # bands missed a sibling — which is exactly what the residual audits
    sets = {i: _shingle_set(t) for i, t in docs}
    got = {
        (r.doc_a, r.doc_b)
        for r in _prefix_verified_pairs(
            _survivor_shingles(spark, str(tmp_path))).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(survivors), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * 5 >= union * 4:
            want.add((a, b))
    assert got == want


def test_clustered_funnel_self_consistent(spark, tmp_path):
    docs = _dup_dense_corpus()
    _write_docs(spark, tmp_path, docs)
    rows = {
        r.stage: r.n
        for r in QUERIES["dedup_prefix_filter_clustered"]
        .build(spark, str(tmp_path)).collect()
    }
    assert rows["docs_total"] == len(docs)
    assert rows["survivors"] == rows["docs_total"] - rows["docs_dropped_by_lsh"]
    # the dup-dense corpus must actually collapse (4 sibling groups of 5;
    # >= 12 tolerates a band-miss or two — misses land in residual_pairs)
    assert rows["docs_dropped_by_lsh"] >= 12
    # residual pairs are a subset of blocking candidates by construction
    assert rows["residual_pairs"] <= rows["prefix_candidates"]
    # funnel agrees with the cluster relation it composed
    dropped = (
        clusters_relation(spark, str(tmp_path))
        .filter(F.col("is_canonical") == 0).count()
    )
    assert rows["docs_dropped_by_lsh"] == dropped


def test_clustered_candidates_bounded_by_distinct_content(spark, tmp_path):
    """The scale claim, at fixture size: replicating content 5x must NOT
    multiply the post-collapse blocking volume. Candidate pairs among
    survivors of the dup-dense corpus stay within the candidate volume
    of the 12-distinct-doc corpus plus the (small) set of sibling pairs
    the bands happened to miss."""
    from arango_clickhouse_replica_spark.queries.retrieval import (
        _prefix_candidates,
        prefix_filter_clustered_candidates,
    )
    from arango_clickhouse_replica_spark.queries.llm_ops import _doc_shingles

    base = [(i, t) for i, t in _dup_dense_corpus() if i < 12]
    _write_docs(spark, tmp_path, base)
    base_cand = _prefix_candidates(
        _doc_shingles(spark, str(tmp_path)).distinct()).count()

    dense_dir = f"{tmp_path}/dense"
    _write_docs(spark, dense_dir, _dup_dense_corpus())
    dense_cand = prefix_filter_clustered_candidates(spark, dense_dir).count()
    # missed siblings can add at most a handful of survivor pairs; 3x is
    # a generous ceiling, while the UNCOLLAPSED dup-dense corpus would
    # add C(5,2)*4 = 40 true pairs on top of the base volume
    assert dense_cand <= 3 * max(base_cand, 4)
