"""The driver contract surface (__spark_entry__.py): rotation ordering,
registry completeness, and resilience to malformed driver write-backs."""

import importlib.util
import json


def _load(tmp_repo=None):
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if tmp_repo is not None:
        mod._REPO = tmp_repo
    return mod


def test_queries_cover_registry_exactly_once():
    mod = _load()
    from arango_clickhouse_replica_spark.queries import QUERIES

    names = list(mod.queries())
    assert sorted(names) == sorted(QUERIES)
    assert set(mod.oracle_sql()) == {
        n for n in QUERIES if QUERIES[n].oracle is not None
    }


def test_never_verified_queries_order_first(tmp_path):
    mod = _load(tmp_path)
    all_names = list(mod.queries())
    some_green = all_names[:3]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"hash_match": True, "spark_rows": 1, "err": None}
                    for n in some_green})
    )
    ordered = list(mod.queries())
    # the three verified names moved to the back
    assert ordered[-3:] == some_green
    assert set(ordered[:-3]) == set(all_names) - set(some_green)


def test_least_recently_verified_cycle(tmp_path):
    mod = _load(tmp_path)
    names = list(mod.queries())
    a, b = names[0], names[1]
    row = {"hash_match": True, "spark_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({a: row, b: row}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({a: row}))
    ordered = list(mod.queries())
    # b (last verified r1) cycles in before a (last verified r2)
    assert ordered.index(b) < ordered.index(a)
    assert ordered[-1] == a


def test_failed_and_erred_rows_reenter_first(tmp_path):
    mod = _load(tmp_path)
    names = list(mod.queries())
    ok, bad_hash, erred = names[0], names[1], names[2]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        ok: {"hash_match": True, "spark_rows": 1, "err": None},
        bad_hash: {"hash_match": False, "spark_rows": 1, "err": None},
        erred: {"hash_match": None, "spark_rows": None, "err": "boom"},
    }))
    ordered = list(mod.queries())
    assert ordered[-1] == ok
    assert ordered.index(bad_hash) < ordered.index(ok)
    assert ordered.index(erred) < ordered.index(ok)


def test_malformed_writebacks_are_ignored(tmp_path):
    mod = _load(tmp_path)
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"stale_query_name": {"hash_match": True, "spark_rows": 1},
                    "weird": "not-a-dict"})
    )
    from arango_clickhouse_replica_spark.queries import QUERIES

    assert sorted(mod.queries()) == sorted(QUERIES)
