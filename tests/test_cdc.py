"""CDC apply kernel tests, mirroring test/test_consumer.py (tombstone drop,
tick cutoff, _ver/_deleted stamping) plus latest-state merge semantics
(version wins, delete wins, replay/overlap idempotence) that the reference
delegates to ClickHouse ReplacingMergeTree."""

from pyspark.sql import Row

from arango_clickhouse_replica_spark.operators.cdc import (
    latest_alive,
    latest_state,
    merge_upsert,
    preprocess_envelopes,
)

ENVELOPE_SCHEMA = (
    "tick long, type int, cuid string, "
    "data struct<_key string, name string, attr1 long>"
)


def _envelopes(spark):
    rows = [
        (100, 2300, "c1", Row(_key="1", name="t1", attr1=1)),
        (101, 2300, "c1", Row(_key="2", name="t1", attr1=2)),
        (102, 2302, "c1", Row(_key="3", name="t1", attr1=3)),
        (103, 2300, "c1", None),                              # tombstone
        (104, 2201, "c1", Row(_key="9", name="tx", attr1=9)),  # txn marker
        (105, 2300, "c_untracked", Row(_key="8", name="x", attr1=8)),
    ]
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def test_preprocess_mirror_of_reference_case(spark):
    # initial_tick=101 drops tick 100; tombstone dropped; txn marker dropped;
    # untracked collection dropped; _ver=tick (deterministic, not wall-clock)
    out = preprocess_envelopes(
        _envelopes(spark), tracked_cuids=["c1"], initial_tick=101
    ).orderBy("_ver")
    rows = [r.asDict() for r in out.collect()]
    assert rows == [
        {"_key": "2", "name": "t1", "attr1": 2, "_ver": 101, "_deleted": 0},
        {"_key": "3", "name": "t1", "attr1": 3, "_ver": 102, "_deleted": 1},
    ]


def test_latest_state_version_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, 10, 0), ("a", 3, 30, 0), ("a", 2, 20, 0), ("b", 1, 5, 0)],
        "_key string, _ver long, attr long, _deleted int",
    )
    out = {r._key: r.attr for r in latest_state(df, ["_key"]).collect()}
    assert out == {"a": 30, "b": 5}


def test_latest_alive_delete_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, 10, 0), ("a", 2, 10, 1), ("b", 1, 5, 0), ("b", 2, 6, 0)],
        "_key string, _ver long, attr long, _deleted int",
    )
    alive = {r._key: r.attr for r in latest_alive(df, ["_key"]).collect()}
    assert alive == {"b": 6}  # 'a' soft-deleted by the winning version


def test_latest_state_order_insensitive(spark):
    # M5: correctness never depends on arrival order
    rows = [("a", 3, 30, 0), ("a", 1, 10, 0), ("a", 2, 20, 0)]
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[2]]):
        df = spark.createDataFrame(perm, "_key string, _ver long, attr long, _deleted int")
        assert latest_state(df, ["_key"]).collect()[0].attr == 30


def test_merge_upsert_idempotent_and_overlap(spark):
    schema = "_key string, _ver long, attr long, _deleted int"
    snapshot = spark.createDataFrame([("a", 1, 10, 0), ("b", 1, 20, 0)], schema)
    batch = spark.createDataFrame([("a", 2, 11, 0), ("a", 1, 10, 0), ("c", 1, 30, 0)], schema)
    once = merge_upsert(snapshot, batch, ["_key"])
    twice = merge_upsert(once, batch, ["_key"])  # replay the same batch
    expect = {("a", 11), ("b", 20), ("c", 30)}
    assert {(r._key, r.attr) for r in once.collect()} == expect
    assert {(r._key, r.attr) for r in twice.collect()} == expect


def test_equal_version_delete_preferred(spark):
    # deterministic tie rule: same _ver -> the delete wins (documented;
    # ClickHouse keeps an arbitrary last-inserted row on ties)
    df = spark.createDataFrame(
        [("a", 2, 10, 0), ("a", 2, 10, 1)],
        "_key string, _ver long, attr long, _deleted int",
    )
    assert latest_alive(df, ["_key"]).count() == 0
