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
