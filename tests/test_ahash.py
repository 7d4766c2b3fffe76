"""Round-6 perceptual image dedup: aHash semantics over the real PNG
codec — brightness-offset siblings collide (tiny Hamming), distinct
gradient families don't match as full hashes, and the bit math equals a
pure-python reference."""

import numpy as np

from arango_clickhouse_replica_spark.queries import QUERIES


def _write_docs(spark, out, doc_ids):
    spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in doc_ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def _ref_ahash(doc_id: int, group_size: int = 5):
    """Pure-python reference of synth_group_png_media + extract_ahash."""
    s, off = doc_id // group_size, doc_id % group_size % 3
    w, h = 16 + s % 5, 16 + s % 3
    ax, ay = 3 + s % 4, 5 + s % 3
    px = np.array(
        [(s * 11 + ax * x + ay * y + off) % 256
         for y in range(h) for x in range(w)], dtype=np.int64)
    xs, ys = np.arange(len(px)) % w, np.arange(len(px)) // w
    g = (8 * ys // h) * 8 + (8 * xs // w)
    cs = np.bincount(g, weights=px, minlength=64).astype(np.int64)
    cc = np.bincount(g, minlength=64)
    bits = (cs * len(px) >= px.sum() * cc).astype(int)
    return [int((bits[k * 16:(k + 1) * 16] * (1 << np.arange(16))).sum())
            for k in range(4)]


def test_ahash_bands_match_reference(spark, tmp_path):
    from arango_clickhouse_replica_spark.operators.multimodal import (
        extract_ahash,
        synth_group_png_media,
    )
    from arango_clickhouse_replica_spark.sources.tables import load_table

    ids = [0, 7, 35, 36, 103, 342]
    _write_docs(spark, tmp_path, ids)
    docs = load_table(spark, "documents", str(tmp_path))
    got = {
        r.media_id: [r.b0, r.b1, r.b2, r.b3]
        for r in extract_ahash(synth_group_png_media(docs)).collect()
    }
    for i in ids:
        assert got[i] == _ref_ahash(i), i


def test_ahash_near_dup_finds_sibling_groups(spark, tmp_path):
    # docs 35-39 share group 7; 65-66 share group 13; 91/103 are lone
    ids = [35, 36, 37, 65, 66, 91, 103]
    _write_docs(spark, tmp_path, ids)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["mm_ahash_near_dup"].build(spark, str(tmp_path)).collect()
    }
    assert (35, 36) in pairs
    assert (35, 37) in pairs
    assert (65, 66) in pairs
    for (a, b), ham in pairs.items():
        assert ham <= 6
        # sibling pairs have near-identical hashes
        if a // 5 == b // 5:
            assert ham <= 3, (a, b, ham)
