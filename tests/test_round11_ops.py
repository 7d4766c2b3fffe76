"""Round-11 semantics tests: crafted-input edge coverage for the new
operators (the driver oracle proves engine parity at the fixture SFs;
these prove the SEMANTICS on inputs the fixtures don't contain)."""

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows, path):
    """rows: (user_id, ts, event_id, event_type, value)."""
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "value"]
    ).withColumn("props", F.lit("{}"))
    df.write.mode("overwrite").parquet(str(path / "events.parquet"))


def test_sample_by_hash_user_coherent(spark, tmp_path):
    """Membership is decided by md5(user_id) alone: a sampled user's
    events are ALL in (entity-coherent sampling), an unsampled user's
    are ALL out, and the x8 scale-up is exact integer arithmetic."""
    in_uid = next(
        u for u in range(1, 500)
        if hashlib.md5(str(u).encode()).hexdigest()[0] in "01"
    )
    out_uid = next(
        u for u in range(1, 500)
        if hashlib.md5(str(u).encode()).hexdigest()[0] not in "01"
    )
    rows = [
        (in_uid, T0, 1, "view", 1.0),
        (in_uid, T0.replace(minute=1), 2, "view", 2.5),
        (out_uid, T0, 3, "view", 100.0),
        (out_uid, T0.replace(minute=2), 4, "click", 9.0),
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.event_type: r
        for r in QUERIES["q_sample_by_hash_parity"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"view"}  # out_uid's click row never appears
    v = out["view"]
    assert (v.n_sampled, v.n_users_sampled) == (2, 1)
    assert v.v_milli_sampled == 1000 + 2500
    assert v.n_scaled == 16 and v.v_milli_scaled == 28000


def test_counter_rate_reset_semantics(spark, tmp_path):
    """increase() counts positive deltas; a drop is a restart whose new
    value is counted in full; the first sample contributes nothing; the
    event_id tiebreak orders equal timestamps."""
    rows = [
        # user 1: 10 -> 25 -> 5 (reset) -> 7; increase = 15 + 5 + 2
        (1, T0, 1, "view", 0.010),
        (1, T0.replace(minute=1), 2, "view", 0.025),
        (1, T0.replace(minute=2), 3, "view", 0.005),
        (1, T0.replace(minute=3), 4, "view", 0.007),
        # user 2: equal ts, ids 6 < 7 order it: 30 then 10 -> one reset
        (2, T0, 6, "view", 0.030),
        (2, T0, 7, "view", 0.010),
        # user 3: single sample -> increase 0, no resets
        (3, T0, 8, "view", 0.099),
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.user_id: (r.n_samples, r.n_resets, r.increase_milli)
        for r in QUERIES["q_counter_rate_resets"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1] == (4, 1, 22)
    assert out[2] == (2, 1, 10)
    assert out[3] == (1, 0, 0)


def test_combinators_masking(spark, tmp_path):
    """Each -If combinator masks independently: rows below the
    threshold feed max_if_low but not sum/count/uniq_if_high; avgIf is
    sum/count over the masked subset only; an all-low group yields NULL
    min_if_high and 0 counts."""
    rows = [
        (1, T0, 1, "view", 60.0),    # high
        (2, T0, 2, "view", 70.0),    # high
        (2, T0, 3, "view", 10.0),    # low
        (3, T0, 4, "click", 5.0),    # low only -> click has no highs
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.event_type: r
        for r in QUERIES["q_clickhouse_combinators_parity"].build(
            spark, str(tmp_path)
        ).collect()
    }
    v = out["view"]
    assert (v.n_rows, v.count_if_high, v.sum_if_high_milli) == (3, 2, 130000)
    assert v.avg_if_high_milli == 65000.0
    assert v.uniq_if_high_users == 2
    assert v.max_if_low_milli == 10000
    assert v.min_if_high_milli == 60000
    c = out["click"]
    assert (c.count_if_high, c.sum_if_high_milli) == (0, 0)
    assert c.min_if_high_milli is None
    assert c.max_if_low_milli == 5000


def test_linreg_recovers_exact_line(spark, tmp_path):
    """Orders priced exactly on y = 2000*x + 5000 milli (x = days since
    1992-01-01) regress to slope 2000, intercept 5000 in every
    segment — and a constant-y segment regresses to slope 0."""
    custs = [(1, "c1", 0, 0.0, "BUILDING"), (2, "c2", 0, 0.0, "AUTO")]
    orders = []
    for i, day in enumerate([10, 20, 30, 40]):
        # y_milli = 2000*day + 5000 -> price = 2*day + 5 dollars
        orders.append((i, 1, "O", 2.0 * day + 5.0,
                       dt.datetime(1992, 1, 1) + dt.timedelta(days=day),
                       "1-URGENT"))
    for i, day in enumerate([5, 15, 25]):
        orders.append((100 + i, 2, "O", 7.0,
                       dt.datetime(1992, 1, 1) + dt.timedelta(days=day),
                       "1-URGENT"))
    spark.createDataFrame(
        custs,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.segment: r
        for r in QUERIES["q_simple_linreg_by_segment"].build(
            spark, str(tmp_path)
        ).collect()
    }
    b = out["BUILDING"]
    assert b.n_orders == 4
    assert b.slope_milli_per_day == 2000.0
    assert b.intercept_milli == 5000.0
    a = out["AUTO"]
    assert a.slope_milli_per_day == 0.0
    assert a.intercept_milli == 7000.0
