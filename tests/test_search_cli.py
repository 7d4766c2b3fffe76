"""tools/search.py parity: the index-then-serve CLI must return exactly
what the registered oracle-checked queries compute in-flight — same
decimal lanes, same rounded-domain rank order — and the dense index
must actually be cell-partitioned (the partition-pruning story)."""

import importlib.util
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "acs_tools_search",
    Path(__file__).resolve().parent.parent / "tools" / "search.py",
)
_search = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_search)
_auto_terms = _search._auto_terms
bm25_search = _search.bm25_search
build_index = _search.build_index
probe_cells = _search.probe_cells
rrf_fuse = _search.rrf_fuse
vector_search = _search.vector_search

from arango_clickhouse_replica_spark.queries import QUERIES


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("search_idx"))
    summary = build_index(spark, sf_dir, out)
    assert summary["n_docs"] > 0 and summary["n_vectors"] > 0
    return out


def test_text_search_equals_registered_bm25(spark, sf_dir, index_dir):
    terms = _auto_terms(spark, index_dir)
    assert len(terms) == 3
    got = [
        (r["doc_id"], r["n_terms_hit"], r["bm25"])
        for r in bm25_search(spark, index_dir, terms, k=20).collect()
    ]
    want = [
        (r["doc_id"], r["n_terms_hit"], r["bm25"])
        for r in QUERIES["text_bm25_topk"].build(spark, sf_dir).collect()
    ]
    assert got == want


def test_vector_search_equals_registered_ivf(spark, sf_dir, index_dir):
    from pyspark.sql import functions as F

    ivf = (
        QUERIES["ann_ivf_probed"].build(spark, sf_dir)
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    )
    assert ivf, "registered IVF emitted nothing for query 0"
    q_vec = [
        float(x)
        for x in spark.read.parquet(f"{index_dir}/vectors")
        .filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    got = vector_search(
        spark, index_dir, 0, q_vec, nprobe=3, k=5
    ).orderBy("rank").collect()
    assert [(r["neighbor_id"], r["cos_sim"], r["rank"]) for r in got] == [
        (r["neighbor_id"], r["cos_sim"], r["rank"]) for r in ivf
    ]


def test_vector_index_is_cell_partitioned_and_pruned(spark, index_dir):
    cells = sorted(
        int(p.name.split("=")[1])
        for p in Path(index_dir, "vectors").iterdir()
        if p.name.startswith("cell=")
    )
    assert cells and all(0 <= c < 16 for c in cells)
    # the probe scan must carry a partition filter on cell — pruning at
    # the source, not a post-scan filter
    from pyspark.sql import functions as F

    probed = probe_cells(
        spark, index_dir,
        [float(x) for x in spark.read.parquet(f"{index_dir}/vectors")
         .limit(1).collect()[0]["embedding"]],
        nprobe=3,
    )
    scan = spark.read.parquet(f"{index_dir}/vectors").filter(
        F.col("cell").isin(probed)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_hybrid_rrf_rule(spark, sf_dir, index_dir):
    terms = _auto_terms(spark, index_dir)
    text_rows = bm25_search(spark, index_dir, terms, k=5).collect()
    from pyspark.sql import functions as F

    q_vec = [
        float(x)
        for x in spark.read.parquet(f"{index_dir}/vectors")
        .filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    vec_rows = vector_search(spark, index_dir, 0, q_vec, k=5).collect()
    fused = rrf_fuse(text_rows, vec_rows, k=10)
    # recompute the rule independently
    want = {}
    for rank, r in enumerate(text_rows, 1):
        want[int(r["doc_id"])] = want.get(int(r["doc_id"]), 0.0) + 1 / (60 + rank)
    for rank, r in enumerate(vec_rows, 1):
        want[int(r["neighbor_id"])] = (
            want.get(int(r["neighbor_id"]), 0.0) + 1 / (60 + rank)
        )
    for e in fused:
        assert e["rrf"] == round(want[e["doc_id"]], 6)
    # sorted by fused score desc with id tiebreak
    keys = [(-e["rrf"], e["doc_id"]) for e in fused]
    assert keys == sorted(keys)
