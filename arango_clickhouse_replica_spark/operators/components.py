"""Distributed connected components via min-label propagation.

The reference's dedup is per-key version replacement (ReplacingMergeTree,
``tables/test.yaml:13``, ``readme.md:89-91``); fuzzy dedup of a document
corpus needs one more step the reference never had: candidate pairs
(MinHash/LSH) form a GRAPH, and "keep one document per near-dup group"
means one canonical row per connected component.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label among itself
and its neighbors. Labels only ever decrease, and the component minimum
reaches every member in O(component diameter) rounds — for near-dup
clusters the diameter is tiny (pairs share LSH buckets), so a handful of
rounds converge. Convergence is detected by the global label sum, which
is strictly decreasing until fixpoint (labels are non-negative and
monotonically non-increasing per node).

Scale notes (100 TB): each round is one self-contained join+groupBy on
the node id — hash-partition the edge list once and every round reuses
that partitioning (no growing lineage: labels are localCheckpoint-ed
eagerly each round). For graphs with giant diameters the large-star /
small-star alternation (Kiveris et al., "Connected Components in
MapReduce and Beyond") halves round count; near-dup graphs don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id of its connected component.

    Returns a DataFrame ``(node, component)``. Nodes are whatever appears
    in ``src``/``dst``; isolated nodes (absent from ``edges``) are absent
    from the result. ``src`` and ``dst`` must share one id type — the
    struct-array explode below fails analysis on mismatched field types
    (unlike the pre-r14 unionAll form, which silently coerced); mixed
    integer widths are widened to long here to preserve that tolerance
    (r15, ADVICE r14).
    """
    ta = edges.schema[src].dataType
    tb = edges.schema[dst].dataType
    if ta != tb:
        from pyspark.sql import types as T

        ints = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if not (isinstance(ta, ints) and isinstance(tb, ints)):
            raise TypeError(
                f"connected_components: {src} ({ta}) and {dst} ({tb}) "
                "must share one id type"
            )
        edges = edges.select(
            F.col(src).cast("long").alias(src),
            F.col(dst).cast("long").alias(dst),
        )
    # Undirected edge list via ONE reference to ``edges``: the unionAll of
    # two column-swapped projections references the upstream pipeline
    # twice, which re-executes it twice unless exchange reuse happens to
    # fire; exploding each edge into its two directions is single-pass by
    # construction (r14 opt round, guide §2.4).
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    # Materialize the edge list ONCE: every propagation round joins against
    # ``und``, and without this the whole upstream pipeline that produced
    # ``edges`` (e.g. shingle -> MinHash -> LSH banding) re-executes per
    # round. At 100 TB the edge list is the small derived relation; the
    # corpus scan it came from is the thing you must not repeat.
    und = und.repartition("b").localCheckpoint(eager=True)
    # Fused first propagation (r14 opt round): enumerating the nodes
    # already costs a full shuffle of the edge list (the old bare
    # ``distinct``); grouping by node instead gives min-neighbor for the
    # same shuffle, so the initial labels start one round ahead —
    # bit-identical to initializing with the node id and propagating
    # once (label = min(self, min over neighbors)).
    # Per-round action economy (r14 opt round): the checkpoint is LAZY and
    # the convergence-sum collect materializes it — one Spark job per
    # round instead of an eager-checkpoint job followed by a separate
    # collect job (each with its own scheduling + planning gap; the round
    # body is node-sized, so fixed per-job overhead dominates it).
    labels = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__mb"))
        .select(
            "node", F.least(F.col("node"), F.col("__mb")).alias("component")
        )
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_rounds):
        # One propagation = min over {self} UNION {neighbor labels}: a
        # single groupBy replaces the old neighbor-min groupBy + re-join
        # onto labels (same per-round result, one less exchange and one
        # less join per round — guide §2.4). The edge list keeps its
        # checkpointed b-partitioning, so only the (node-sized) label
        # relation moves each round.
        contrib = und.join(labels, und["b"] == labels["node"]).select(
            und["a"].alias("node"), "component"
        )
        labels = (
            contrib.unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
