"""Round-7 semantics: C4 cleaning heuristics, hard-negative mining,
and video scene-cut detection — invariants the DuckDB hash oracle
can't state directly (label disjointness, ground-truth segmentation,
rule monotonicity)."""

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES


def test_c4_pass_all_bounded_by_each_rule(spark, sf_dir):
    """The all-rules conjunction can never exceed any single rule's
    pass count, and per-source doc counts must sum to the corpus."""
    rows = QUERIES["text_c4_heuristics"].build(spark, sf_dir).collect()
    assert rows, "no sources"
    rule_cols = [
        "pass_terminal_punct", "pass_no_brace", "pass_no_lorem",
        "pass_no_javascript", "pass_min_words", "pass_min_sentences",
    ]
    for r in rows:
        for c in rule_cols:
            assert 0 <= r["pass_all"] <= r[c] <= r["n_docs"], (r["source"], c)
    from arango_clickhouse_replica_spark.sources.tables import load_table
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_hard_negatives_labels_differ_and_ranked(spark, sf_dir):
    """Every mined negative has a label different from its query's;
    per-query lists are exactly the rounded-domain top order."""
    df = QUERIES["embed_hard_negatives"].build(spark, sf_dir)
    rows = df.collect()
    assert rows
    per_query = {}
    for r in rows:
        assert r["neighbor_label"] != r["query_label"]
        assert r["neighbor_id"] != r["query_id"]
        per_query.setdefault(r["query_id"], []).append(r)
    for qid, lst in per_query.items():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) == 5
        # descending rounded similarity with id tie-break
        keys = [(-r["cos_sim"], r["neighbor_id"]) for r in lst]
        assert keys == sorted(keys), qid


def test_hard_negatives_none_better_omitted(spark, sf_dir):
    """Adversarial completeness: recompute rank-1 exactly for a few
    queries driver-side and confirm the operator found it."""
    import math

    from arango_clickhouse_replica_spark.sources.tables import load_table

    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in load_table(spark, "embeddings", sf_dir).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    got = {
        r["query_id"]: (r["neighbor_id"], r["cos_sim"])
        for r in QUERIES["embed_hard_negatives"].build(spark, sf_dir)
        .filter(F.col("rank") == 1).collect()
    }
    checked = 0
    for qid in sorted(got)[:3]:
        qv, ql = emb[qid]
        best = min(
            ((-cos(qv, v), nid) for nid, (v, lb) in emb.items() if lb != ql),
        )
        assert got[qid] == (best[1], -best[0]), qid
        checked += 1
    assert checked == 3


def test_scene_cuts_match_ground_truth(spark, sf_dir):
    """Detected segmentation equals the synth formula's f // seg_len
    ground truth: scene spans are contiguous, start at frame 0, and
    each clip's scene count is ceil(n_frames / seg_len)."""
    rows = (
        QUERIES["mm_mjpeg_scene_cuts"].build(spark, sf_dir)
        .orderBy("media_id", "scene_id").collect()
    )
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, scenes in by_media.items():
        d = int(mid)
        seg, n = 3 + d % 2, 6 + d % 4
        want_scenes = -(-n // seg)  # ceil
        assert len(scenes) == want_scenes, mid
        assert scenes[0]["start_frame"] == 0
        assert scenes[-1]["end_frame"] == n - 1
        for i, s in enumerate(scenes):
            assert s["scene_id"] == i
            assert s["start_frame"] == i * seg
            assert s["end_frame"] == min((i + 1) * seg, n) - 1
            assert s["n_frames"] == s["end_frame"] - s["start_frame"] + 1
            # decoded luma is bit-exact: mean = base drift mean + 4.5
            base = 16 + 60 * i
            offs = range(0, s["n_frames"])
            want_mean = base + 7 * sum(offs) / len(offs) + 4.5
            assert abs(s["mean_luma"] - round(want_mean, 6)) < 1e-9, (mid, i)


def test_silhouette_in_range_and_cells_cover(spark, sf_dir):
    """Silhouette values are bounded, every vector lands in exactly one
    cell, and per-cell counts match the kmeans seed assignment."""
    from arango_clickhouse_replica_spark.sources.tables import load_table

    rows = QUERIES["embed_silhouette_approx"].build(spark, sf_dir).collect()
    assert rows
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["cell"] < 16
        # simplified silhouette with a = nearest-centroid distance is
        # >= 0 by construction; float-noise can nudge the mean a hair
        assert -1e-6 <= r["mean_silhouette"] <= 1.0 + 1e-6, r


def test_band_sweep_monotone_candidates(spark, sf_dir):
    """Fewer rows per band -> a (weakly) superset candidate space:
    candidate counts must be non-decreasing in the band count, recall
    non-decreasing, and every ratio a true ratio of its own counts."""
    rows = {
        r["bands"]: r
        for r in QUERIES["dedup_minhash_band_sweep"].build(spark, sf_dir)
        .collect()
    }
    assert rows, "sweep emitted nothing"
    present = sorted(rows)
    for b in present:
        r = rows[b]
        assert r["rows_per_band"] == 8 // b
        assert 0 <= r["n_true_j50"] <= r["n_candidates"]
        assert abs(
            r["precision_j50"]
            - round(r["n_true_j50"] / r["n_candidates"], 6)
        ) < 1e-9
    for lo, hi in zip(present, present[1:]):
        # not strictly guaranteed under occupancy caps (a hot 8x1
        # bucket is dropped while its 4x2 refinement survives), but at
        # fixture scale no bucket is hot — pin the theory ordering
        assert rows[lo]["n_candidates"] <= rows[hi]["n_candidates"]
        assert rows[lo]["recall_vs_union"] <= rows[hi]["recall_vs_union"]
