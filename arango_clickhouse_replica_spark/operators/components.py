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
    from the result.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # Materialize the edge list ONCE: every propagation round joins against
    # ``und``, and without this the whole upstream pipeline that produced
    # ``edges`` (e.g. shingle -> MinHash -> LSH banding) re-executes per
    # round. At 100 TB the edge list is the small derived relation; the
    # corpus scan it came from is the thing you must not repeat.
    und = und.repartition("b").localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_rounds):
        nbr_min = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
