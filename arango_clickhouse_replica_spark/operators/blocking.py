"""Blocking helpers for pairwise similarity at scale.

Two guards that keep blocked pair-joins from going quadratic on skewed
blocks (the two residual 100 TB risks the round-1 audit flagged):

- **Hot-shingle document-frequency cap**: shingles that appear in more
  than a fraction of the corpus are non-discriminative (stopword-like)
  and dominate the pair-join cost (a shingle with document frequency d
  produces O(d^2) candidate pairs). Production MinHash pipelines drop
  them before the pair join; ``drop_hot_shingles`` does it with a
  broadcast anti-join against the (small by construction) hot list.
- **Label sub-blocking**: a label block of n vectors produces O(n^2)
  cosine pairs. ``with_sub_block`` splits oversized labels into
  2^bits random-hyperplane sign buckets (bits grows with the overflow
  factor), bounding per-block pair counts at the cost of missing pairs
  that straddle a hyperplane — the standard LSH recall trade.

The hyperplane components are deterministic md5-derived constants
(identical to the ANN LSH path), shipped as literal arrays so the
signature is a compact JVM codegen tree, never a Python UDF.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hyperplane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-0.5, 0.5)."""
    return [
        (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 1000) / 1000.0
        - 0.5
        for d in range(dim)
    ]


def sign_bit(vec: Column, plane: list[float]) -> Column:
    """One LSH signature bit: sign of the (sequential-fold) dot product."""
    lit_plane = F.array(*[F.lit(c) for c in plane])
    total = F.aggregate(
        F.zip_with(vec, lit_plane, lambda x, h: x.cast("double") * h),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(total >= 0, F.lit(1)).otherwise(F.lit(0))


def sign_signature(vec: Column, bits: int, dim: int) -> Column:
    """String of ``bits`` sign bits for ``vec`` (e.g. '0110...')."""
    return F.concat(
        *[sign_bit(vec, hyperplane(p, dim)).cast("string") for p in range(bits)]
    )


def drop_hot_shingles(
    shingles: DataFrame, df_cap: int | DataFrame, shingle_col: str = "s"
) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``df_cap``.

    The hot list (df > cap) is usually tiny — but NOT by construction:
    the cap callers pass has an ABSOLUTE ceiling (e.g. 64 docs), so on a
    duplicate-heavy corpus the number of shingles crossing it grows with
    corpus size. A forced ``F.broadcast`` here OOM'd the driver on the
    50x salted probe (every base shingle with df >= 2 went hot).
    The join therefore carries NO broadcast hint: AQE sees the hot
    list's TRUE size at runtime and converts to a broadcast-hash
    anti-join when it's small (the common, organic-corpus case — the
    local shuffle reader keeps the probe side un-exchanged), or keeps a
    partitioned anti-join when it isn't. Never trust a pre-aggregation
    cardinality guess enough to force a driver-side build.

    ``df_cap`` is either a collected int or a 1-row single-column
    DataFrame holding the cap (r14 opt round): the relation form lets a
    caller fold the cap's own aggregate (e.g. a corpus count) into this
    plan as a broadcast scalar attach instead of paying a separate
    driver-blocking count job per build.
    """
    counts = shingles.groupBy(shingle_col).agg(F.count("*").alias("__df"))
    if isinstance(df_cap, DataFrame):
        # Constant-key broadcast HASH join for the 1-row scalar attach:
        # a bare crossJoin(broadcast(...)) plans as a
        # BroadcastNestedLoopJoin with the cap filter as its join
        # condition, which the scale plan-lint rightly rejects. The key
        # must DERIVE FROM AN ATTRIBUTE and survive constant folding —
        # a literal key folds away, and arithmetic identities (x * 0) on
        # non-nullable attributes fold too (observed on Spark 4); the
        # least(1, greatest(1, x)) clamp is always 1 but has no
        # simplification rule, so the planner keeps the equi-predicate
        # and picks BroadcastHashJoin (r14 opt round). Semantics and
        # cost are the crossJoin's (1-row build side, every row
        # matches).
        cap_name = df_cap.columns[0]
        cap_col = F.col(cap_name)
        one = lambda c: F.least(  # noqa: E731
            F.lit(1).cast("long"), F.greatest(F.lit(1).cast("long"), c)
        )
        counts = counts.withColumn("__ck", one(F.col("__df"))).join(
            F.broadcast(df_cap.withColumn("__ck", one(cap_col.cast("long")))),
            "__ck",
        )
        hot = counts.filter(F.col("__df") > cap_col).select(shingle_col)
    else:
        hot = counts.filter(F.col("__df") > df_cap).select(shingle_col)
    return shingles.join(hot, shingle_col, "left_anti")


def with_sub_block(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    label_cap: int = 10_000,
    max_bits: int = 8,
    out_col: str = "sub",
) -> DataFrame:
    """Attach a sub-block key that splits labels larger than ``label_cap``.

    Labels within the cap get the empty sub-key (single block, exact
    semantics — the guard is free until a label actually overflows).
    Oversized labels get ``ceil(log2(n / cap))`` signature bits (up to
    ``max_bits``), so the EXPECTED sub-block size is back under the cap.
    The per-label row count is a map-side-combinable aggregate joined
    back via broadcast (label cardinality << row count).
    """
    cnt = emb.groupBy(label_col).agg(F.count("*").alias("__n"))
    bits = F.least(
        F.lit(max_bits),
        F.ceil(F.log2(F.col("__n") / F.lit(float(label_cap)))).cast("int"),
    )
    full_sig = sign_signature(F.col(vec_col), max_bits, dim)
    return (
        emb.join(F.broadcast(cnt), label_col)
        .withColumn(
            out_col,
            F.when(F.col("__n") > label_cap, F.substring(full_sig, 1, bits))
            .otherwise(F.lit("")),
        )
        .drop("__n")
    )
