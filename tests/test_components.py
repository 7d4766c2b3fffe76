"""Connected-components operator semantics (operators/components.py)."""

from arango_clickhouse_replica_spark.operators.components import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_converges_to_min(spark):
    # 1-2-3-4-5 chain: min label must travel the full diameter
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_stay_apart(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_cycle_and_cross_edges(spark):
    # cycle 1-2-3-1 bridged to 4-5; duplicate and reversed edges tolerated
    got = _cc(spark, [(2, 1), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4)])
    assert set(got.values()) == {1}
    assert len(got) == 5


def test_star_converges_in_one_round(spark):
    hub = [(1, k) for k in range(2, 30)]
    got = _cc(spark, hub)
    assert set(got.values()) == {1} and len(got) == 29


def test_two_node_component(spark):
    got = _cc(spark, [(7, 8)])
    assert got == {7: 7, 8: 7}


def test_long_diameter_chain_survives_fused_init(spark):
    # r14 opt round: the initial labels are one propagation ahead (label
    # = min(self, min neighbor) fused into the node enumeration) and each
    # loop round is a single union+groupBy min. A descending-id chain of
    # diameter 16 forces many loop rounds after the fused init and makes
    # any off-by-one in the convergence probe (sum unchanged) visible:
    # the min label must still reach the far end exactly.
    n = 17
    edges = [(i + 1, i) for i in range(1, n)]  # 2->1, 3->2, ..., 17->16
    got = _cc(spark, edges)
    assert got == {k: 1 for k in range(1, n + 1)}


def test_cluster_ids_match_bruteforce(spark):
    # random-ish small graph vs a driver-side union-find
    edges = [(1, 5), (5, 9), (2, 6), (6, 2), (3, 7), (7, 11), (11, 3), (4, 4)]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    got = _cc(spark, edges)
    assert got == want
