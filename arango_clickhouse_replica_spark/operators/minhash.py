"""MinHash signature / LSH band operators shared by the batch dedup
query (queries/llm_ops.py) and the incremental streaming deduper
(streaming/dedup.py).

The signature derives N lanes from ONE md5 per shingle (fixed-width hex
substrings; lexicographic MIN == numeric MIN), aggregated as N parallel
MINs in a single map-side-combinable groupBy — no per-seed explode, no
second shuffle. Bands concatenate adjacent lanes; documents sharing any
(band, sig) bucket are near-dup candidates via a bucket-local equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LANES = 8
BANDS = 4


def word_shingles(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, s)."""
    expr = (
        f"array_distinct(transform(sequence(1, size(__toks) - {n - 1}),"
        f" i -> concat_ws(' ', {', '.join(f'__toks[i{j - 1:+d}]' for j in range(n))})))"
    )
    return (
        docs.select(id_col, F.split(text_col, " ").alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(id_col, F.explode(F.expr(expr)).alias("s"))
    )


def lane_mins(
    shingles: DataFrame,
    *,
    id_col: str = "doc_id",
    shingle_col: str = "s",
    lanes: int = LANES,
) -> DataFrame:
    """(id, m0..m{lanes-1}) minhash lanes: N parallel MINs over fixed-width
    hex substrings of ONE md5 per shingle, in a single groupBy."""
    h = shingles.withColumn("__h", F.md5(shingle_col))
    return h.groupBy(id_col).agg(
        *[F.min(F.substring("__h", 1 + 4 * g, 4)).alias(f"m{g}") for g in range(lanes)]
    )


def band_signatures(
    shingles: DataFrame,
    *,
    id_col: str = "doc_id",
    shingle_col: str = "s",
    lanes: int = LANES,
    bands: int = BANDS,
) -> DataFrame:
    """(id, band, sig) LSH bucket keys from a shingle stream."""
    mins = lane_mins(shingles, id_col=id_col, shingle_col=shingle_col, lanes=lanes)
    return bands_from_lane_mins(mins, id_col=id_col, lanes=lanes, bands=bands)


def bands_from_lane_mins(
    mins: DataFrame,
    *,
    id_col: str = "doc_id",
    lanes: int = LANES,
    bands: int = BANDS,
) -> DataFrame:
    """(id, band, sig) bucket keys from a PRECOMPUTED lane-min relation —
    lets a band sweep derive several layouts (2x4 / 4x2 / 8x1) from one
    shingle scan + groupBy instead of recomputing the minhash per layout."""
    per_band = lanes // bands
    stack = ", ".join(
        f"{b}, concat({', '.join(f'm{b * per_band + j}' for j in range(per_band))})"
        for b in range(bands)
    )
    return mins.select(id_col, F.expr(f"stack({bands}, {stack}) AS (band, sig)"))


def candidate_pairs(
    sigs_a: DataFrame, sigs_b: DataFrame | None = None, *, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing an LSH bucket.

    One-argument form: self-join of a signature set. Two-argument form:
    cross-set candidates (e.g. new batch vs the accumulated store) —
    still normalized to doc_a < doc_b.
    """
    a = sigs_a.alias("a")
    ida = F.col(f"a.{id_col}")
    bucket_eq = lambda idb: (  # noqa: E731
        (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig"))
    )
    if sigs_b is None:
        # Self-join: '<' emits each unordered pair ONCE (half the join
        # output of '!=' + normalize).
        b = sigs_a.alias("b")
        idb = F.col(f"b.{id_col}")
        return (
            a.join(b, bucket_eq(idb) & (ida < idb))
            .select(ida.alias("doc_a"), idb.alias("doc_b"))
            .distinct()
        )
    # Cross-set: ids come from different sets, so both orders can occur —
    # normalize to doc_a < doc_b.
    b = sigs_b.alias("b")
    idb = F.col(f"b.{id_col}")
    return (
        a.join(b, bucket_eq(idb) & (ida != idb))
        .select(F.least(ida, idb).alias("doc_a"), F.greatest(ida, idb).alias("doc_b"))
        .distinct()
    )
