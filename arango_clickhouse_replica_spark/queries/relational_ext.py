"""Extended relational surface (SURVEY.md §2.7): as-of / range joins,
advanced window functions (range frames, distribution, first/last/nth),
exact percentiles, pivot, grouping sets, correlated subqueries, argmax
aggregation, skew-salted two-phase aggregation, and histogram binning.

The reference delegates this whole surface to ClickHouse SQL over its
replicated tables (pass-through executor ``clickhouse/connect.py:25-26``);
here each capability is a first-class, oracle-checked Spark query.

Scale notes (100 TB):

- The as-of join (``operators/asof.py``) is union + ONE key shuffle, never
  an inequality-join explosion.
- The range join anchors on an equi key (user_id) so Catalyst plans a
  hash join with the range as a post-join predicate — no cross product.
- The salted aggregation demonstrates the two-phase (salt -> combine)
  pattern for hot grouping keys; with exact DECIMAL partials the re-agg
  is lossless, so the oracle is the plain GROUP BY.
- ``max_by`` replaces window top-1 where only the argmax row is needed:
  a map-side-combinable aggregate (one shuffle, no sort) vs. the
  window's shuffle + full per-key sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.asof import asof_join_backward
from ..sources.tables import load_table
from .registry import query
from .relational import dec2

# --- as-of join (custom operator; backward, inclusive) ----------------------


@query(
    "q_asof_join_latest_order",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.event_type,
             o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, event_type,
           o_orderkey AS asof_o_orderkey,
           o_totalprice AS asof_o_totalprice
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof", "custom-operator"),
    doc="As-of (temporal) join: each event enriched with the user's most "
        "recent order at event time. Spark side is the union+carry-forward "
        "operator (one key shuffle); the oracle is the equivalent "
        "row_number-over-inequality-join formulation.",
)
def q_asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "event_type", "ts")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_custkey", "user_id")
    joined = asof_join_backward(
        ev, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], tiebreak="o_orderkey",
    )
    return joined.filter(F.col("asof_o_orderkey").isNotNull()).select(
        "event_id", "user_id", "event_type",
        F.col("asof_o_orderkey").cast("long").alias("asof_o_orderkey"),
        "asof_o_totalprice",
    )


# --- range (interval) join --------------------------------------------------


@query(
    "q_range_join_event_bursts",
    oracle="""
    SELECT a.event_id, a.user_id, CAST(COUNT(b.event_id) AS BIGINT) AS prior_10m
    FROM events a
    LEFT JOIN events b
      ON b.user_id = a.user_id
     AND b.ts >= a.ts - INTERVAL 10 MINUTE
     AND b.ts < a.ts
    GROUP BY a.event_id, a.user_id
    """,
    tags=("join", "range"),
    doc="Range (interval) join: per event, how many events the same user "
        "produced in the preceding 10 minutes. The equi key (user_id) "
        "anchors a hash join; the time band is a post-join predicate — "
        "no cross product at any scale.",
)
def q_range_join_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("b.ts") < F.col("a.ts")),
            "left",
        )
        .groupBy(F.col("a.event_id").alias("event_id"), F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.col("b.event_id")).alias("prior_10m"))
    )


# --- window: RANGE frame over event time ------------------------------------


@query(
    "q_window_range_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                        RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_30d
    FROM orders
    """,
    tags=("window", "range-frame"),
    doc="RANGE window frame over event time: per-customer trailing-30-day "
        "spend. Spark orders by days-since-epoch with a numeric range "
        "frame (-29..0) — identical semantics to the interval RANGE frame.",
)
def q_window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-29, 0)
    )
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


# --- window: distribution functions -----------------------------------------


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(10) OVER w AS INTEGER) AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
    doc="Distribution window functions (ntile / percent_rank / cume_dist) "
        "per segment over a unique sort (acctbal, custkey) so bucket "
        "edges are deterministic across engines. Partitioned — never a "
        "global single-reducer sort.",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@query(
    "q_window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "navigation"),
    doc="Navigation window functions (first_value / last_value / "
        "nth_value) with an explicit unbounded frame and a unique sort.",
)
def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey", "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


# --- exact percentiles ------------------------------------------------------


@query(
    "q_percentiles_by_segment",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 6) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 6) AS p75
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "percentile"),
    doc="Exact percentiles (linear interpolation) per group — Spark "
        "percentile() == DuckDB quantile_cont(), rounded to absorb the "
        "last-ulp of interpolation.",
)
def q_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("c_acctbal", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 6).alias("p75"),
    )


# --- pivot ------------------------------------------------------------------


@query(
    "q_pivot_status_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_p
    FROM orders GROUP BY 1
    """,
    tags=("agg", "pivot"),
    doc="Pivot (wide aggregation): order totals by year x status. Spark "
        "pivot with an EXPLICIT value list — never the two-pass "
        "distinct-discovery pivot — so the plan is a single aggregate.",
)
def q_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec2("o_totalprice")).cast("double"))
        .withColumnsRenamed({"F": "total_f", "O": "total_o", "P": "total_p"})
    )


# --- grouping sets ----------------------------------------------------------


@query(
    "q_grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
    doc="Explicit GROUPING SETS with GROUPING() markers (beyond "
        "rollup/cube): per-flag, per-status, and grand totals in one pass.",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


# --- correlated subqueries --------------------------------------------------


@query(
    "q_scalar_subquery_above_avg",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
          (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
                  / COUNT(*)
           FROM customer i WHERE i.c_mktsegment = c.c_mktsegment)
    """,
    tags=("subquery", "correlated"),
    doc="Correlated scalar subquery: customers above their segment's mean "
        "balance (exact decimal mean). Catalyst decorrelates to an "
        "aggregate + join — no per-row re-execution.",
)
def q_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    cust.createOrReplaceTempView("__sq_customer")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM __sq_customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
              (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
                      / COUNT(*)
               FROM __sq_customer i WHERE i.c_mktsegment = c.c_mktsegment)
    """)


@query(
    "q_exists_high_value_order",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("subquery", "exists"),
    doc="EXISTS / NOT EXISTS correlated predicates — planned as left-semi "
        "and left-anti hash joins.",
)
def q_exists_high_value_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust.createOrReplaceTempView("__ex_customer")
    orders.createOrReplaceTempView("__ex_orders")
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM __ex_customer c
        WHERE EXISTS (SELECT 1 FROM __ex_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM __ex_orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """)


# --- argmax aggregation (top-1 without a window) ----------------------------


@query(
    "q_argmax_latest_order",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey,
                   CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
                   * 10000000000 + o_orderkey) AS latest_orderkey,
           arg_max(o_totalprice,
                   CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
                   * 10000000000 + o_orderkey) AS latest_totalprice
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "argmax"),
    doc="Argmax via max_by: each customer's latest order in ONE map-side-"
        "combinable aggregate (no window sort). The ordering key packs "
        "(days, orderkey) into a single BIGINT for an exact total order.",
)
def q_argmax_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    ordkey = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
        * F.lit(10_000_000_000).cast("long")
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("latest_orderkey"),
        F.max_by("o_totalprice", ordkey).alias("latest_totalprice"),
    )


# --- skew-salted two-phase aggregation --------------------------------------


@query(
    "q_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salting"),
    doc="Skew-salted two-phase aggregation: phase 1 groups by (key, salt) "
        "spreading a hot key over 16 reducers; phase 2 combines the exact "
        "DECIMAL partials. Result is provably identical to the plain "
        "GROUP BY (the oracle). The pattern for power-law keys at 100 TB "
        "when AQE skew handling isn't enough.",
)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    salted = li.withColumn("__salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(dec2("l_quantity")).alias("pq"),
        F.count("*").alias("pn"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pq").cast("double").alias("sum_qty"),
        F.sum("pn").alias("n"),
    )


# --- histogram binning ------------------------------------------------------


@query(
    "q_histogram_order_totals",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY 1
    """,
    tags=("agg", "histogram"),
    doc="Histogram binning: fixed-width buckets via arithmetic floor "
        "division (portable across engines), count + extrema per bucket.",
)
def q_histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "q_window_rank_vs_dense",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY round(o_totalprice / 100000) DESC,
                 o_orderkey)
    """,
    tags=("window", "ranking"),
    doc="rank() vs dense_rank() with real ties (coarse price bands) and a "
        "unique final tiebreak so both engines agree on every row.",
)
def q_window_rank_vs_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.round(F.col("o_totalprice") / 100000).desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).cast("int").alias("price_rank"),
        F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
    )


@query(
    "q_approx_percentile_sketch",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "approx", "sketch"),
    doc="Approximate percentiles via the KLL-style sketch "
        "(approx_percentile with accuracy 100): single-pass, mergeable, "
        "constant memory per group — the 100 TB path where exact "
        "percentile's full sort/shuffle is not affordable. The checkable "
        "property is exact: group counts plus booleans asserting each "
        "estimate lands within the documented bound of the exact "
        "percentile (the oracle emits literal TRUE), so the sketch is "
        "exercised AND the row hash-matches DuckDB.",
)
def q_approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    agg = cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.percentile_approx("c_acctbal", 0.25, 100).alias("_a25"),
        F.percentile_approx("c_acctbal", 0.50, 100).alias("_a50"),
        F.percentile_approx("c_acctbal", 0.75, 100).alias("_a75"),
        F.expr("percentile(c_acctbal, 0.25D)").alias("_e25"),
        F.expr("percentile(c_acctbal, 0.50D)").alias("_e50"),
        F.expr("percentile(c_acctbal, 0.75D)").alias("_e75"),
        (F.max("c_acctbal") - F.min("c_acctbal")).cast("double").alias("_spread"),
    )

    def ok(a: str, e: str) -> Column:
        # accuracy=100 => rank error <= 1%; value error bounded by a
        # generous fraction of the per-group value spread.
        return F.abs(F.col(a).cast("double") - F.col(e)) <= F.col("_spread") * 0.25

    return agg.select(
        "c_mktsegment",
        "n_customers",
        ok("_a25", "_e25").alias("p25_ok"),
        ok("_a50", "_e50").alias("p50_ok"),
        ok("_a75", "_e75").alias("p75_ok"),
    )


@query(
    "q_set_ops_all_multiset",
    oracle="""
    WITH a AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_linestatus = 'F'),
         b AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05)
    SELECT 'intersect_all' AS tag, flag, COUNT(*) AS n
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY flag
    UNION ALL
    SELECT 'except_all' AS tag, flag, COUNT(*) AS n
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY flag
    """,
    tags=("setop", "multiset"),
    doc="Multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL keep "
        "duplicate multiplicities (min / difference of per-value counts), "
        "unlike the distinct variants — counted per flag to keep the "
        "result compact.",
)
def q_set_ops_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    a = li.filter(F.col("l_linestatus") == "F").select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_discount") > 0.05).select(F.col("l_returnflag").alias("flag"))
    inter = (
        a.intersectAll(b).groupBy("flag").agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("tag"), "flag", "n")
    )
    exc = (
        a.exceptAll(b).groupBy("flag").agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("tag"), "flag", "n")
    )
    return inter.unionAll(exc)


@query(
    "q_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS status
      FROM orders
    )
    SELECT status,
           COUNT(*) AS n_rows,
           COUNT(price) AS n_price,
           CAST(SUM(CAST(COALESCE(price, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_coalesced,
           CAST(COUNT(CASE WHEN price IS NULL THEN 1 END) AS BIGINT) AS n_null_price,
           CAST(COUNT(*) FILTER (WHERE NULLIF(status, 'O') IS NULL) AS BIGINT) AS n_o_or_null
    FROM t
    GROUP BY status
    """,
    tags=("scalar", "null-semantics"),
    doc="NULL semantics end to end: NULL grouping keys form their own "
        "group, COUNT(col) vs COUNT(*), COALESCE in aggregates, NULLIF, "
        "and filtered aggregation over a three-valued predicate.",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    t = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_totalprice")).alias("price"),
        F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_orderstatus")).alias("status"),
    )
    return t.groupBy("status").agg(
        F.count("*").alias("n_rows"),
        F.count("price").alias("n_price"),
        F.sum(F.coalesce(F.col("price"), F.lit(0)).cast("decimal(18,2)"))
        .cast("double").alias("total_coalesced"),
        F.count(F.when(F.col("price").isNull(), 1)).cast("long").alias("n_null_price"),
        F.count_if(F.nullif(F.col("status"), F.lit("O")).isNull()).cast("long")
        .alias("n_o_or_null"),
    )


@query(
    "q_weighted_avg_discount",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS wavg_discount,
           CAST(COUNT(DISTINCT CASE WHEN l_discount > 0.05
                                    THEN l_orderkey END) AS BIGINT)
             AS n_discounted_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "weighted"),
    doc="Price-weighted average discount per flag (exact decimal "
        "numerator and denominator, ONE double division at the end) plus "
        "a conditional COUNT DISTINCT — distinct orders that ever "
        "exceeded 5% discount. Both are single-pass, map-side-"
        "combinable aggregates.",
)
def q_weighted_avg_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    return li.groupBy("l_returnflag").agg(
        (F.sum(price * disc).cast("double") / F.sum(price).cast("double"))
        .alias("wavg_discount"),
        F.count_distinct(
            F.when(F.col("l_discount") > 0.05, F.col("l_orderkey"))
        ).cast("long").alias("n_discounted_orders"),
    )


@query(
    "q_mode_ship_priority",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderstatus
            ORDER BY n DESC, o_orderpriority) AS rn
          FROM counts)
    WHERE rn = 1
    """,
    tags=("agg", "mode"),
    doc="Deterministic MODE per group (most frequent order priority per "
        "status): value counts then a per-group argmax with a value "
        "tiebreak. The built-in mode() aggregate picks an ARBITRARY "
        "value on ties — unusable under a hash-compare oracle or a "
        "retried task at scale; count+argmax costs one extra (tiny, "
        "already-aggregated) window and is replay-stable.",
)
def q_mode_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf_dir)
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )


@query(
    "q_recursive_order_chains",
    oracle="""
    WITH RECURSIVE nxt AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS nk,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS nd
      FROM orders
    ),
    edges AS (
      SELECT o_custkey, o_orderkey, nk FROM nxt
      WHERE nk IS NOT NULL
        AND date_diff('day', CAST(o_orderdate AS DATE), CAST(nd AS DATE)) <= 30
    ),
    firsts AS (
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 1
    ),
    chain(custkey, okey, depth) AS (
      SELECT o_custkey, o_orderkey, 1 FROM firsts
      UNION ALL
      SELECT c.custkey, e.nk, c.depth + 1
      FROM chain c JOIN edges e
        ON e.o_custkey = c.custkey AND e.o_orderkey = c.okey
    )
    SELECT custkey AS o_custkey, CAST(MAX(depth) AS INT) AS chain_len
    FROM chain GROUP BY custkey
    """,
    tags=("relational", "recursive-cte", "spark4"),
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4): per customer, "
        "walk the successor chain of orders placed within 30 days of "
        "the previous one, starting from the customer's FIRST order, "
        "and report the chain length — linear recursion over a "
        "FUNCTIONAL successor edge (each order has at most one "
        "next-within-30d), so every step strictly advances the order "
        "date and the recursion terminates at the business-bounded "
        "chain depth, far under Spark's recursion-level limit; no "
        "combinatorial path blowup is possible. Each recursive step is "
        "one hash equi-join of the frontier (<= |customers| rows) "
        "against the edge relation — the same bounded-frontier shape "
        "as the iterative connected-components operator "
        "(operators/components.py), here expressed declaratively so "
        "Catalyst plans the per-round joins.",
)
def q_recursive_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    orders.createOrReplaceTempView("__rc_orders")
    return spark.sql("""
        WITH RECURSIVE nxt AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS nk,
                 LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS nd
          FROM __rc_orders
        ),
        edges AS (
          SELECT o_custkey, o_orderkey, nk FROM nxt
          WHERE nk IS NOT NULL AND datediff(nd, o_orderdate) <= 30
        ),
        firsts AS (
          SELECT o_custkey, o_orderkey FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM __rc_orders
          ) WHERE rn = 1
        ),
        chain(custkey, okey, depth) AS (
          SELECT o_custkey, o_orderkey, 1 FROM firsts
          UNION ALL
          SELECT c.custkey, e.nk, c.depth + 1
          FROM chain c JOIN edges e
            ON e.o_custkey = c.custkey AND e.o_orderkey = c.okey
        )
        SELECT custkey AS o_custkey, CAST(MAX(depth) AS INT) AS chain_len
        FROM chain GROUP BY custkey
    """)
