"""As-of join operator edge cases beyond the oracle-checked query:
no preceding right row, equal timestamps (inclusive + tiebreak),
multi-column keys, and left rows preserved."""

from datetime import datetime

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.asof import asof_join_backward


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "e1"),   # after r2 -> picks r2
            (1, _ts("2024-01-01T09:00:00"), "e2"),   # == r2.ts -> inclusive
            (1, _ts("2024-01-01T07:00:00"), "e3"),   # before all -> null
            (2, _ts("2024-01-01T12:00:00"), "e4"),   # key with no rights -> null
        ],
        ["uid", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T08:00:00"), 100, 1.0),
            (1, _ts("2024-01-01T09:00:00"), 200, 2.0),  # tie on ts below
            (1, _ts("2024-01-01T09:00:00"), 300, 3.0),  # greater tiebreak wins
        ],
        ["uid", "rts", "rid", "amount"],
    )
    out = asof_join_backward(
        left, right, on="uid", left_ts="ts", right_ts="rts",
        right_cols=["rid", "amount"], tiebreak="rid",
    )
    got = {r.tag: (r.asof_rid, r.asof_amount) for r in out.collect()}
    assert got == {
        "e1": (300, 3.0),
        "e2": (300, 3.0),
        "e3": (None, None),
        "e4": (None, None),
    }
    assert out.count() == left.count()  # every left row survives


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T10:00:00")), (1, "b", _ts("2024-01-01T10:00:00"))],
        ["k1", "k2", "ts"],
    )
    right = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T09:00:00"), 7)],
        ["k1", "k2", "rts", "rid"],
    )
    out = asof_join_backward(
        left, right, on=["k1", "k2"], left_ts="ts", right_ts="rts",
        right_cols=["rid"], tiebreak="rid",
    )
    got = {r.k2: r.asof_rid for r in out.collect()}
    assert got == {"a": 7, "b": None}  # (1,'b') must not see (1,'a')'s row
