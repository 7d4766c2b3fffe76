"""Event-analytics query surface: funnel conversion, cohort retention,
forward fill (IGNORE NULLS), event transitions, SCD Type 2 intervals,
ordered string aggregation, exact-decimal statistical moments, unpivot.

The reference replicates change streams into latest-state tables and
delegates analytics to ClickHouse SQL (pass-through executor
``clickhouse/connect.py:25-26``); these queries are the standard
product-analytics workload a user of such a replica runs downstream,
expressed as first-class oracle-checked Spark plans.

Scale notes (100 TB):

- Funnel stages aggregate to per-user minima FIRST (users << events), so
  the stage joins are small-table joins, never event-x-event.
- Cohort retention is two hash aggregations on (user) then
  (cohort, offset) — both map-side combinable, no window over raw events.
- Forward fill / transitions / SCD2 are ONE window each, partitioned by
  user_id: a single key shuffle, state bounded per user, no self-join.
- Moments use exact DECIMAL partial sums (order-independent across any
  partitioning) folded into closed-form variance/correlation on the
  driver-visible aggregate row — bit-identical under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query

# --- funnel conversion ------------------------------------------------------


@query(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click
    """,
    tags=("analytics", "funnel"),
    doc="Ordered funnel view -> click -> purchase: each stage counts users "
        "whose stage event strictly follows their previous-stage time. "
        "Aggregates to per-user minima before joining, so stage joins are "
        "user-cardinality, never event-cardinality. The stage joins carry "
        "NO broadcast hint: |users| grows with the corpus, so AQE picks "
        "broadcast only when the true runtime size allows; otherwise the "
        "user_id hash partitioning of the per-stage aggregates is reused "
        "by the join (no second exchange, no driver-side build).",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    v = (ev.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("vt")))
    c = (ev.filter(F.col("event_type") == "click")
           .join(v, "user_id")
           .filter(F.col("ts") > F.col("vt"))
           .groupBy("user_id").agg(F.min("ts").alias("ct")))
    p = (ev.filter(F.col("event_type") == "purchase")
           .join(c, "user_id")
           .filter(F.col("ts") > F.col("ct"))
           .groupBy("user_id").agg(F.min("ts").alias("pt")))
    stages = (
        v.select(F.lit("view").alias("stage"))
        .unionAll(c.select(F.lit("click").alias("stage")))
        .unionAll(p.select(F.lit("purchase").alias("stage")))
    )
    return stages.agg(
        F.count(F.when(F.col("stage") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("stage") == "click", 1)).alias("n_click_after_view"),
        F.count(F.when(F.col("stage") == "purchase", 1)).alias("n_purchase_after_click"),
    )


# --- cohort retention -------------------------------------------------------


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_wk
      FROM events GROUP BY user_id
    )
    SELECT STRFTIME(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(DATEDIFF('day', f.cohort_wk,
                         CAST(DATE_TRUNC('week', e.ts) AS DATE)) / 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN first_seen f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    tags=("analytics", "cohort"),
    doc="Weekly cohort retention: users bucketed by first-seen week, "
        "activity counted per (cohort, week offset). Two hash "
        "aggregations; the first-seen relation is |users|-sized — it "
        "GROWS with the corpus, so no broadcast hint: AQE broadcasts it "
        "only when the runtime size allows, else the join reuses the "
        "aggregate's user_id partitioning.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_wk")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                        F.col("cohort_wk")) / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
    )


# --- forward fill (last_value IGNORE NULLS) ---------------------------------


@query(
    "q_forward_fill_purchase",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
    tags=("analytics", "window", "ignore-nulls"),
    doc="Forward fill: every event carries the user's most recent purchase "
        "amount (LAST_VALUE ... IGNORE NULLS over a running frame). One "
        "window = one key shuffle; per-key state is a single scalar.",
)
def q_forward_fill_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id", "user_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# --- event transition matrix ------------------------------------------------


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("analytics", "window", "markov"),
    doc="First-order transition matrix over per-user event sequences "
        "(LEAD + pair count). One window shuffle on user_id, then a "
        "25-cell aggregate.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


# --- SCD Type 2 history intervals -------------------------------------------


@query(
    "q_scd2_event_intervals",
    oracle="""
    SELECT event_id, user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current
    FROM events
    """,
    tags=("analytics", "scd2", "window"),
    doc="SCD Type 2 from a change stream: each per-user change becomes a "
        "[valid_from, valid_to) interval, open-ended row flagged current. "
        "This is the history-table view of the reference's "
        "ReplacingMergeTree latest-state semantics (readme.md:89-91) — "
        "latest-state = is_current rows.",
)
def q_scd2_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "event_id", "user_id", "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


# --- ordered string aggregation ---------------------------------------------


@query(
    "q_string_agg_segments",
    oracle="""
    SELECT n.n_name,
           (SELECT STRING_AGG(s, ',' ORDER BY s)
            FROM (SELECT DISTINCT c.c_mktsegment AS s
                  FROM customer c WHERE c.c_nationkey = n.n_nationkey))
             AS segments,
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey) AS BIGINT) AS n_customers
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
    """,
    tags=("analytics", "string-agg"),
    doc="Ordered string aggregation: per nation, the sorted distinct "
        "market segments serialized to one CSV string (collect_set -> "
        "array_sort -> array_join; scalar output per the no-complex-"
        "output rule). Map-side-combinable set agg, broadcast dim join.",
)
def q_string_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",")
            .alias("segments"),
            F.count("*").alias("n_customers"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "segments", "n_customers")
    )


# --- exact-decimal statistical moments --------------------------------------


@query(
    "q_stat_moments_by_segment",
    oracle="""
    WITH s AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sx,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))
                 * CAST(c_acctbal AS DECIMAL(18,2))) AS sxx
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n,
           CAST(sx AS DOUBLE) / n AS mean_acctbal,
           (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1)) AS var_acctbal
    FROM s
    """,
    tags=("analytics", "statistics"),
    doc="Sample mean/variance per segment from EXACT decimal partial sums "
        "(sum x, sum x^2) folded through the closed form on the aggregate "
        "row — bit-identical under any partitioning, unlike naive "
        "double accumulation. The built-in var_samp is the same algebra "
        "with float partials.",
)
def q_stat_moments_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    x = F.col("c_acctbal").cast("decimal(18,2)")
    s = cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    return s.select(
        "c_mktsegment",
        "n",
        (sx / F.col("n")).alias("mean_acctbal"),
        ((F.col("n") * sxx - sx * sx) / (n * (F.col("n") - 1))).alias("var_acctbal"),
    )


# --- unpivot (wide -> long) -------------------------------------------------


@query(
    "q_unpivot_order_metrics",
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
    UNION ALL
    SELECT o_orderstatus, 'total_price', total_price FROM wide
    UNION ALL
    SELECT o_orderstatus, 'n_customers', n_customers FROM wide
    """,
    tags=("analytics", "unpivot"),
    doc="Unpivot (wide -> long): per-status metrics melted to "
        "(status, metric, value) rows via DataFrame.unpivot — the inverse "
        "of q_pivot_status_by_year. Values unified to DOUBLE (unpivot "
        "requires one value type); money goes through exact decimal first.",
)
def q_unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    wide = orders.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .alias("total_price"),
        F.count_distinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- date-spine gap fill ----------------------------------------------------


@query(
    "q_gap_fill_daily_revenue",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders
    ),
    spine AS (
      SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT STRFTIME(s.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(daily.rev, 0) AS DOUBLE) AS revenue,
           COALESCE(daily.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN daily ON daily.d = s.d
    """,
    tags=("analytics", "gap-fill", "generator"),
    doc="Date-spine gap fill: a generated contiguous day spine "
        "(sequence + explode) left-joined to daily revenue so quiet days "
        "appear as explicit zeros. The spine is O(days) — generated on "
        "one row and broadcast; the fact side aggregates before joining.",
)
def q_gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    spine = (
        orders.agg(
            F.min(F.col("o_orderdate").cast("date")).alias("lo"),
            F.max(F.col("o_orderdate").cast("date")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").alias("n_orders"),
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("rev"), F.lit(0)).cast("double").alias("revenue"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


# --- percent of total (ratio_to_report) -------------------------------------


@query(
    "q_pct_of_total_by_nation",
    oracle="""
    WITH rev AS (
      SELECT n.n_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS nation_rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name,
           CAST(nation_rev AS DOUBLE) AS revenue,
           CAST(nation_rev AS DOUBLE) / CAST(SUM(nation_rev) OVER () AS DOUBLE)
             AS pct_of_total
    FROM rev
    """,
    tags=("analytics", "window", "ratio"),
    doc="Percent-of-total (ratio_to_report): nation revenue share via an "
        "unpartitioned window over the ALREADY-AGGREGATED 25-row result — "
        "the single-partition exchange touches nation-cardinality rows, "
        "never the fact table. Exact decimal partials keep the ratio "
        "bit-stable.",
)
def q_pct_of_total_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_totalprice")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("nation_rev"))
    )
    total = F.sum("nation_rev").over(Window.partitionBy())
    return rev.select(
        "n_name",
        F.col("nation_rev").cast("double").alias("revenue"),
        (F.col("nation_rev").cast("double") / total.cast("double"))
        .alias("pct_of_total"),
    )


# --- month-over-month growth ------------------------------------------------


@query(
    "q_mom_revenue_growth",
    oracle="""
    WITH monthly AS (
      SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_delta
    FROM monthly
    """,
    tags=("analytics", "window", "timeseries"),
    doc="Month-over-month growth: LAG over the monthly aggregate series "
        "(months-cardinality rows, so the unpartitioned ordered window is "
        "trivially small after the map-side-combinable monthly rollup). "
        "Delta computed on exact decimals, cast once to double.",
)
def q_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.partitionBy().orderBy("month")
    return monthly.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.lag("rev").over(w)).cast("double").alias("mom_delta"),
    )


@query(
    "q_click_purchase_attribution",
    oracle="""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT c.user_id, c.click_id, p.purchase_id, p.value
      FROM clicks c JOIN purchases p
        ON c.user_id = p.user_id
       AND c.click_ts <= p.purchase_ts
       AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_attributed_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
    FROM pairs
    GROUP BY user_id
    """,
    tags=("analytics", "interval-join", "streaming-twin"),
    doc="Click->purchase attribution: every (click, purchase) pair by the "
        "same user with the click inside the 30-minute lookback, "
        "aggregated per user. The pair builder (streaming/joins.py "
        "click_purchase_pairs) is THE stream-stream interval join run "
        "verbatim on a batch frame — the oracle certifies it here, and "
        "tests/test_streaming_joins.py proves the streaming execution "
        "matches. The time bound on both event-times is what lets the "
        "streaming state evict; per-user keying makes the batch join a "
        "user-keyed shuffle, never event-x-event.",
)
def q_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import click_purchase_pairs

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    pairs = click_purchase_pairs(ev)
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("purchase_id").alias("n_attributed_purchases"),
        F.sum(F.col("purchase_value").cast("decimal(18,2)"))
        .cast("double").alias("attributed_value"),
    )


# --- gaps-and-islands interval merge ----------------------------------------


@query(
    "q_interval_merge_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts)
               + (60 + CAST(floor(value) AS BIGINT) % 3600) * 1000000
               AS e_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, s_us, e_us,
             CASE WHEN s_us > MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s_us, e_us,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    per_island AS (
      SELECT user_id, island,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(e_us) - MIN(s_us) AS span_us
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(span_us) // 1000000 AS BIGINT) AS covered_s,
           CAST(MAX(span_us) // 1000000 AS BIGINT) AS longest_island_s,
           CAST(MAX(n_events) AS BIGINT) AS max_events_per_island
    FROM per_island GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "window", "gaps-islands"),
    doc="Gaps-and-islands interval merge: each event opens a derived "
        "activity interval [ts, ts + 60..3659 s); overlapping/touching "
        "intervals per user merge into islands (running MAX(end) over the "
        "start-ordered frame detects island starts, a running SUM numbers "
        "them), then per-user coverage stats — the classic sessionized "
        "'total active time' report that a naive self-join makes "
        "quadratic. All arithmetic in exact epoch microseconds (positive, "
        "so DuckDB's truncating // and Spark's div agree). Scale: two "
        "windows + two aggregates all partitioned by user_id — ONE key "
        "shuffle, per-user state is a single running max; no self-join, "
        "no range join.",
)
def q_interval_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    s_us = F.unix_micros("ts")
    dur_us = (60 + F.floor("value").cast("long") % 3600) * F.lit(1000000)
    iv = ev.select(
        "user_id", "event_id",
        s_us.alias("s_us"), (s_us + dur_us).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id").orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e_us").over(w_prev)
    flagged = iv.select(
        "user_id", "event_id", "s_us", "e_us",
        F.when(prev_max_e.isNull() | (F.col("s_us") > prev_max_e), 1)
        .otherwise(0).alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id").orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id", "s_us", "e_us",
        F.sum("new_island").over(w_run).alias("island"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("e_us") - F.min("s_us")).alias("span_us"),
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.expr("cast(sum(span_us) div 1000000 as bigint)").alias("covered_s"),
            F.expr("cast(max(span_us) div 1000000 as bigint)")
            .alias("longest_island_s"),
            F.max("n_events").cast("long").alias("max_events_per_island"),
        )
        .orderBy("user_id")
    )


@query(
    "q_event_anomaly_zscore",
    oracle="""
    WITH win AS (
      SELECT user_id, event_id, value,
             COUNT(value) OVER w AS cnt,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) OVER w
                  AS DOUBLE) AS s1,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(18,6))) OVER w
                  AS DOUBLE) AS s2
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT user_id, event_id, value,
             (value - s1 / cnt)
               / sqrt(GREATEST(0.0, s2 / cnt - (s1 / cnt) * (s1 / cnt)))
               AS z
      FROM win
      WHERE cnt >= 10
        AND sqrt(GREATEST(0.0, s2 / cnt - (s1 / cnt) * (s1 / cnt))) > 0
    ),
    worst AS (
      SELECT user_id, event_id, ABS(z) AS az FROM (
        SELECT user_id, event_id, z,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ABS(z) DESC, event_id DESC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT s.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN ABS(s.z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(MAX(w.az), 6) AS max_abs_z,
           CAST(MAX(w.event_id) AS BIGINT) AS worst_event_id
    FROM scored s JOIN worst w USING (user_id)
    GROUP BY s.user_id
    ORDER BY s.user_id
    """,
    tags=("events", "window", "anomaly", "quality"),
    doc="Rolling z-score anomaly census over the event stream — the "
        "metric-outlier sweep an observability or fraud pipeline runs "
        "per entity: each event's value scores against the PRIOR 20 "
        "events' rolling mean/std (frame excludes the current row — no "
        "self-masking), warm-up below 10 priors and zero-variance "
        "windows are unscorable, and |z| > 3 flags the spike. "
        "Determinism: the rolling moments are window SUMs of 6-dp "
        "DECIMALs (exact, frame-defined — partition order can't shift a "
        "bit), the z division is one double op sequence identical on "
        "both engines, and the worst-event argmax orders (|z| DESC, "
        "event_id DESC). Scale: ONE hash exchange on user_id feeds the "
        "sort-window and the final per-user aggregate; the frame is "
        "constant-width so state is O(21) per partition cursor — the "
        "streaming twin is a transformWithState over the same frame.",
)
def q_event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    scored = anomaly_scored_events(events)
    return _anomaly_user_rollup(scored)


def anomaly_scored_events(events: DataFrame) -> DataFrame:
    """Per-event rolling z-scores (user_id, event_id, z) — the scoring
    relation behind q_event_anomaly_zscore, exported so the streaming
    twin (streaming/stateful.py streaming_anomaly_zscore) can be
    parity-tested bit for bit against the batch window.

    Declared null semantics (ADVICE r8): null-valued events are excluded
    BEFORE the window on both engines and in the stream, so a null never
    occupies a frame slot, never scores, and the twins stay bit-equal
    even on data with nulls (the COUNT(value)-skips/frame-row-counts
    split would otherwise let batch and stream diverge)."""
    events = events.filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v = F.col("value")
    win = events.select(
        "user_id", "event_id", "value",
        F.count("value").over(w).alias("cnt"),
        F.sum(F.round(v, 6).cast("decimal(18,6)")).over(w)
        .cast("double").alias("s1"),
        F.sum(F.round(v * v, 6).cast("decimal(18,6)")).over(w)
        .cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("cnt")
    std = F.sqrt(
        F.greatest(F.lit(0.0), F.col("s2") / F.col("cnt") - mean * mean)
    )
    return (
        win.filter((F.col("cnt") >= 10) & (std > 0))
        .select(
            "user_id", "event_id",
            ((v - mean) / std).alias("z"),
        )
    )


def _anomaly_user_rollup(scored: DataFrame) -> DataFrame:
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            F.sum(F.when(F.abs("z") > 3, 1).otherwise(0))
            .cast("long").alias("n_anomalies"),
            F.max(F.struct(F.abs("z").alias("a"),
                           F.col("event_id").alias("e"))).alias("w"),
        )
        .select(
            "user_id", "n_scored", "n_anomalies",
            F.round(F.col("w.a"), 6).alias("max_abs_z"),
            F.col("w.e").cast("long").alias("worst_event_id"),
        )
        .orderBy("user_id")
    )


@query(
    "q_rolling_tukey_outliers",
    oracle="""
    WITH win AS (
      SELECT user_id, event_id, value,
             COUNT(value) OVER w AS cnt,
             quantile_cont(value, 0.25) OVER w AS q1,
             quantile_cont(value, 0.75) OVER w AS q3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT user_id, event_id, value,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi,
             GREATEST(q1 - 1.5 * (q3 - q1) - value,
                      value - (q3 + 1.5 * (q3 - q1)), 0.0) AS excess
      FROM win WHERE cnt >= 10
    ),
    worst AS (
      SELECT user_id, event_id, excess FROM (
        SELECT user_id, event_id, excess,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY excess DESC, event_id DESC)
                 AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT s.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN s.value < s.lo OR s.value > s.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(MAX(w.excess), 6) AS max_fence_excess,
           CAST(MAX(w.event_id) AS BIGINT) AS worst_event_id
    FROM scored s JOIN worst w USING (user_id)
    GROUP BY s.user_id
    ORDER BY s.user_id
    """,
    tags=("events", "window", "anomaly", "robust", "quality"),
    doc="Rolling Tukey-fence outlier census — the ROBUST companion of "
        "q_event_anomaly_zscore (quartiles shrug off the very outliers "
        "that inflate a rolling std and mask their successors): each "
        "event tests against fences q1 -/+ 1.5*IQR of the PRIOR 20 "
        "events' exact interpolated quartiles, warm-up below 10 priors "
        "is unscorable, and the per-user report carries the outlier "
        "count plus the single worst fence excess. Determinism: with a "
        "<= 20-row frame the quantile position p*(n-1) is an exact "
        "binary fraction, so Spark's percentile() and DuckDB's "
        "quantile_cont interpolate IDENTICAL doubles (verified on "
        "shared frames); fences and excess are one identical "
        "expression tree. Scale: same single user_id exchange as the "
        "z-score — one sort-window (two quantile aggregates share the "
        "frame) + one map-side-combinable per-user rollup.",
)
def q_rolling_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v = F.col("value")
    win = events.select(
        "user_id", "event_id", "value",
        F.count("value").over(w).alias("cnt"),
        F.expr("percentile(value, 0.25)").over(w).alias("q1"),
        F.expr("percentile(value, 0.75)").over(w).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    scored = win.filter(F.col("cnt") >= 10).select(
        "user_id", "event_id", "value",
        lo.alias("lo"), hi.alias("hi"),
        F.greatest(lo - v, v - hi, F.lit(0.0)).alias("excess"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            F.sum(
                F.when((v < F.col("lo")) | (v > F.col("hi")), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.max(F.struct(F.col("excess").alias("x"),
                           F.col("event_id").alias("e"))).alias("w"),
        )
        .select(
            "user_id", "n_scored", "n_outliers",
            F.round(F.col("w.x"), 6).alias("max_fence_excess"),
            F.col("w.e").cast("long").alias("worst_event_id"),
        )
        .orderBy("user_id")
    )


_CMS_D = 4     # hash rows
_CMS_W = 1024  # counters per row
_CMS_TOPK = 10


def _cms_bucket_sql(col: str, i: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR) || '#r{i}'), 1, 8)"
        f" AS BIGINT) % {_CMS_W}"
    )


def _cms_bucket(col, i: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f"#r{i}"))), 1, 8
            ), 16, 10,
        ).cast("long")
        % _CMS_W
    )


@query(
    "q_heavy_hitters_countmin",
    oracle=f"""
    WITH rows_i AS (SELECT unnest([1, 2, 3, 4]) AS i),
    cms AS (
      SELECT i,
             CASE i WHEN 1 THEN {_cms_bucket_sql('user_id', 1)}
                    WHEN 2 THEN {_cms_bucket_sql('user_id', 2)}
                    WHEN 3 THEN {_cms_bucket_sql('user_id', 3)}
                    ELSE {_cms_bucket_sql('user_id', 4)} END AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events, rows_i GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT user_id, exact_cnt, i,
             CASE i WHEN 1 THEN {_cms_bucket_sql('user_id', 1)}
                    WHEN 2 THEN {_cms_bucket_sql('user_id', 2)}
                    WHEN 3 THEN {_cms_bucket_sql('user_id', 3)}
                    ELSE {_cms_bucket_sql('user_id', 4)} END AS b
      FROM exact, rows_i
    )
    SELECT p.user_id, p.exact_cnt,
           CAST(MIN(c.c) AS BIGINT) AS cms_estimate,
           CAST(MIN(c.c) - p.exact_cnt AS BIGINT) AS overestimate
    FROM probes p JOIN cms c ON p.i = c.i AND p.b = c.b
    GROUP BY p.user_id, p.exact_cnt
    ORDER BY p.exact_cnt DESC, p.user_id
    """,
    tags=("agg", "sketch", "heavy-hitters"),
    doc="Count-Min heavy-hitter audit: a deterministic CMS "
        f"({_CMS_D} salted md5 rows x {_CMS_W} counters) built over the "
        "event stream's user activity, probed at the exact top-"
        f"{_CMS_TOPK} users — estimate, exact count, and the "
        "overestimate (never negative by construction: CMS admits only "
        "one-sided error, which the driver hash re-proves on every "
        "row). The sketch table hash-matches the oracle because every "
        "lane is integer and the hash is replayed md5-prefix "
        "arithmetic. Scale: the CMS build collapses the corpus into a "
        f"bounded {_CMS_D}x{_CMS_W} map-side-combinable aggregate that "
        "merges across shards/streams — the frequency table you can "
        "keep when per-key exact counts need an unbounded shuffle; the "
        "probe side is a broadcast of top-k x d rows.",
)
def q_heavy_hitters_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    uid = F.col("user_id")
    bucket_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cms_bucket(uid, i).alias("b")
            )
            for i in range(1, _CMS_D + 1)
        ]
    )
    hashed = ev.select(F.explode(bucket_arr).alias("ib")).select(
        F.col("ib.i").alias("i"), F.col("ib.b").alias("b")
    )
    cms = hashed.groupBy("i", "b").agg(F.count("*").cast("long").alias("c"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "user_id", "exact_cnt", F.explode(bucket_arr.alias("x")).alias("ib")
    ).select(
        "user_id", "exact_cnt",
        F.col("ib.i").alias("i"), F.col("ib.b").alias("b"),
    )
    return (
        probes.join(cms, ["i", "b"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
        .withColumn(
            "overestimate", F.col("cms_estimate") - F.col("exact_cnt")
        )
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    )


@query(
    "q_time_weighted_average",
    oracle="""
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) AS ts_us,
             CAST(CAST(round(value, 6) AS DECIMAL(18,6)) * 1000000
                  AS BIGINT) AS v_micro,
             event_id
      FROM events
    ),
    gaps AS (
      SELECT user_id, ts_us, v_micro,
             (LEAD(ts_us) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) - ts_us)
               // 1000000 AS dur_s
      FROM e
    ),
    per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT)
               AS span_s,
             CAST(SUM(dur_s) AS BIGINT) AS sum_w,
             CAST(SUM(v_micro * dur_s) AS BIGINT) AS sum_wv
      FROM gaps GROUP BY user_id
    )
    SELECT user_id, n_events, span_s,
           sum_wv // sum_w AS twa_micro
    FROM per_user WHERE sum_w > 0
    ORDER BY user_id
    """,
    tags=("window", "timeseries", "agg"),
    doc="Time-weighted average for irregularly sampled telemetry — the "
        "correct mean when events arrive unevenly (a plain AVG "
        "overweights bursts; TWA holds each value until the next "
        "observation, the standard gauge-metric/sensor semantics): per "
        "user, each value is weighted by the whole seconds until that "
        "user's next event (the last observation carries no weight) "
        "and the weighted mean lands in exact integer micro-units. Sum "
        "magnitudes are bounded by value_max x observation SPAN (the "
        "durations telescope), so the integer lane never overflows "
        "regardless of event count. Users whose events all fall within "
        "one second carry no weight and are excluded (documented). "
        "Scale: ONE user_id exchange feeds the lead window and the "
        "aggregate — the same single-shuffle shape as the z-score and "
        "Tukey windows.",
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    e = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        (
            F.round(F.col("value"), 6).cast("decimal(18,6)")
            * F.lit(1000000)
        ).cast("long").alias("v_micro"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.withColumn(
        "dur_s", F.lead("ts_us").over(w) - F.col("ts_us")
    ).withColumn("dur_s", F.expr("dur_s div 1000000"))
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr("(max(ts_us) - min(ts_us)) div 1000000").cast("long")
        .alias("span_s"),
        F.sum("dur_s").cast("long").alias("sum_w"),
        F.sum(F.col("v_micro") * F.col("dur_s")).cast("long")
        .alias("sum_wv"),
    )
    return (
        per_user.filter(F.col("sum_w") > 0)
        .withColumn("twa_micro", F.expr("sum_wv div sum_w"))
        .select("user_id", "n_events", "span_s", "twa_micro")
        .orderBy("user_id")
    )


_PR_ITERS = 3
_PR_BASE = 1_000_000


def _pagerank_oracle() -> str:
    graph = """
    WITH seq AS (
      SELECT user_id,
             LEAD(user_id) OVER (ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    edges AS (
      SELECT user_id AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM seq WHERE nxt IS NOT NULL AND nxt <> user_id
      GROUP BY user_id, nxt
    ),
    nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    outdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout
               FROM edges GROUP BY src),
    r0 AS (
      SELECT node, CAST({base} // cnt.n AS BIGINT) AS rank
      FROM nodes, cnt
    )""".format(base=_PR_BASE)
    step = """,
    r{k} AS (
      SELECT nd.node,
             CAST((15 * {base}) // (100 * cnt.n)
                  + (85 * COALESCE(SUM((r.rank * e.w) // od.wout), 0))
                    // 100 AS BIGINT) AS rank
      FROM nodes nd
      CROSS JOIN cnt
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN r{p} r ON r.node = e.src
      LEFT JOIN outdeg od ON od.src = e.src
      GROUP BY nd.node, cnt.n
    )"""
    body = "".join(
        step.format(k=k, p=k - 1, base=_PR_BASE)
        for k in range(1, _PR_ITERS + 1)
    )
    return graph + body + f"""
    SELECT r.node AS user_id, r.rank AS rank_micro,
           CAST(COALESCE(outd.wout, 0) AS BIGINT) AS out_weight,
           CAST(COALESCE(ind.win, 0) AS BIGINT) AS in_weight
    FROM r{_PR_ITERS} r
    LEFT JOIN outdeg outd ON outd.src = r.node
    LEFT JOIN (SELECT dst, CAST(SUM(w) AS BIGINT) AS win
               FROM edges GROUP BY dst) ind ON ind.dst = r.node
    ORDER BY rank_micro DESC, user_id
    """


@query(
    "q_pagerank_handoff_graph",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "iterative"),
    doc="PageRank over the temporal handoff graph — the engine's graph "
        "lane: an edge u->v with weight w counts how often v produced "
        "the event immediately after u (the interaction-sequence graph "
        "mined from any event log), and three damped PageRank "
        "iterations (d=0.85) run as UNROLLED dataflow — each iteration "
        "is one broadcast join of the rank vector against the edge "
        "list plus a grouped sum, exactly how iterative graph "
        "algorithms compile onto a relational engine when the "
        "iteration count is fixed. Every lane is integer micro-units "
        "with engine-identical truncation order (per-edge share = "
        "rank*w div wout, then the damping blend), so all three "
        "iterations hash-match the oracle. Dangling-mass is dropped, "
        "not redistributed (the common SQL variant; ordering signal "
        "is preserved, documented). Scale: the edge BUILD range-shards "
        "the global (ts,event_id) order, leads within each shard, and "
        "stitches the one boundary row per shard against a broadcast "
        "shard-firsts relation (r10: no corpus-sized single-partition "
        "window — the only global window left runs over the <= "
        "shuffle-partition-count shard-firsts rows); iterations touch "
        "the |nodes|+|edges| graph "
        "relations only, broadcast when they fit and hash-partitioned "
        "when they don't.",
)
def q_pagerank_handoff_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # Edge build WITHOUT a global single-partition window: shard the
    # events by a TIME-DERIVED key monotone in the global (ts, event_id)
    # order (shard i's timestamps all precede shard i+1's — a plain hash
    # exchange on the computed shard, no range-partitioner sampling
    # scan, which the bench guard measured as the r10 rewrite's cost),
    # take the lead WITHIN each shard, then stitch the one boundary row
    # per shard against the next non-empty shard's first user — a
    # shard-count-sized relation. Same rows as a global lead, no
    # corpus-sized Exchange SinglePartition.
    n_shards = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 2)
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("__t0"),
        F.max(F.unix_micros("ts")).alias("__t1"),
    )
    sharded = (
        ev.select("user_id", "ts", "event_id")
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "shard",
            F.expr(
                f"cast(((unix_micros(ts) - __t0) * {n_shards})"
                " div (__t1 - __t0 + 1) as int)"
            ),
        )
        .drop("__t0", "__t1")
    )
    w_shard = Window.partitionBy("shard").orderBy("ts", "event_id")
    seq = sharded.select(
        "user_id", "shard", "ts", "event_id",
        F.lead("user_id").over(w_shard).alias("nxt_in_shard"),
    )
    # first row of each non-empty shard, in shard (== global) order;
    # bounded by construction: one row per shard (<= shuffle partitions)
    firsts = sharded.groupBy("shard").agg(
        F.min_by("user_id", F.struct("ts", "event_id")).alias("first_user")
    )
    w_firsts = Window.orderBy("shard")  # over <= n_shards rows
    stitch = firsts.select(
        "shard", F.lead("first_user").over(w_firsts).alias("next_first")
    )
    seq = (
        seq.join(F.broadcast(stitch), "shard", "left")
        .select(
            "user_id",
            F.coalesce("nxt_in_shard", "next_first").alias("nxt"),
            # only the shard's LAST row may borrow next_first; rows with
            # an in-shard lead keep it (coalesce picks in-shard first)
        )
    )
    edges = (
        seq.filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id")))
        .groupBy(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
        # the unrolled iterations repeat this subtree once per consumer
        # in the plan tree, but AQE's ReusedExchange dedups the actual
        # work — measured FASTER than localCheckpoint pinning (1.9s vs
        # 2.2s at sf0.1), so no checkpoint here
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    cnt = nodes.agg(F.count("*").cast("long").alias("n"))
    outdeg = edges.groupBy("src").agg(
        F.sum("w").cast("long").alias("wout")
    )
    # iteration 0: uniform mass
    r = nodes.crossJoin(cnt).select(
        "node", F.expr(f"{_PR_BASE} div n").cast("long").alias("rank")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * w) div wout").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").cast("long").alias("incoming"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .crossJoin(cnt)
            .select(
                "node",
                (
                    F.expr(f"(15 * {_PR_BASE}) div (100 * n)")
                    + F.expr(
                        "(85 * coalesce(incoming, 0)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
    ind = edges.groupBy("dst").agg(F.sum("w").cast("long").alias("win"))
    return (
        r.join(outdeg, r.node == outdeg.src, "left")
        .join(ind, r.node == ind.dst, "left")
        .select(
            F.col("node").alias("user_id"),
            F.col("rank").alias("rank_micro"),
            F.coalesce("wout", F.lit(0)).cast("long").alias("out_weight"),
            F.coalesce("win", F.lit(0)).cast("long").alias("in_weight"),
        )
        .orderBy(F.desc("rank_micro"), F.asc("user_id"))
    )


_WF_WINDOW_S = 3600  # windowFunnel window


@query(
    "q_clickhouse_window_funnel",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
        AND epoch_us(e.ts) <= t1.t1 + {_WF_WINDOW_S * 1000000}
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e
      JOIN t1 ON t1.user_id = e.user_id
      JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
        AND epoch_us(e.ts) <= t1.t1 + {_WF_WINDOW_S * 1000000}
      GROUP BY e.user_id
    ),
    levels AS (
      SELECT u.user_id,
             CASE WHEN t3.t3 IS NOT NULL THEN 3
                  WHEN t2.t2 IS NOT NULL THEN 2
                  WHEN t1.t1 IS NOT NULL THEN 1
                  ELSE 0 END AS level,
             t3.t3 - t1.t1 AS complete_us
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN t1 ON t1.user_id = u.user_id
      LEFT JOIN t2 ON t2.user_id = u.user_id
      LEFT JOIN t3 ON t3.user_id = u.user_id
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COALESCE(MAX(complete_us) // 1000000, 0) AS BIGINT)
             AS max_complete_s
    FROM levels GROUP BY level ORDER BY level
    """,
    tags=("analytics", "funnel", "clickhouse-parity"),
    doc="ClickHouse windowFunnel parity — the reference replicates INTO "
        "ClickHouse precisely so users can run its parametric analytics "
        "functions; this is windowFunnel(3600)(ts, view, click, "
        "purchase) re-expressed as Spark dataflow: per user, the "
        "longest strictly-ordered prefix of the condition chain whose "
        "every step lands within the window opened by the FIRST step "
        "(q_funnel_conversion is the unwindowed cousin; the deadline "
        "anchored at t1 is the ClickHouse-specific semantics), "
        "aggregated into the level histogram with the worst completion "
        "time. Exact epoch-microsecond lanes. Scale: three per-user "
        "conditional minima (users << events, map-side combinable) and "
        "user-cardinality joins — never event x event.",
)
def q_clickhouse_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    win = _WF_WINDOW_S * 1_000_000
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("us").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("us") > F.col("t1")) & (F.col("us") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t1, "user_id").join(t2, "user_id")
        .filter((F.col("us") > F.col("t2")) & (F.col("us") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("us").alias("t3"))
    )
    levels = (
        ev.select("user_id").distinct()
        .join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0).cast("long").alias("level"),
            (F.col("t3") - F.col("t1")).alias("complete_us"),
        )
    )
    return (
        levels.groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.coalesce(
                F.expr("max(complete_us) div 1000000"), F.lit(0)
            ).cast("long").alias("max_complete_s"),
        )
        .orderBy("level")
    )


@query(
    "q_clickhouse_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0 FROM events
      GROUP BY user_id
    ),
    flags AS (
      SELECT f.user_id,
             MAX(CASE WHEN CAST(e.ts AS DATE) = f.d0
                      THEN 1 ELSE 0 END) AS r0,
             MAX(CASE WHEN CAST(e.ts AS DATE) = f.d0 + 1
                      THEN 1 ELSE 0 END) AS r1,
             MAX(CASE WHEN CAST(e.ts AS DATE) = f.d0 + 7
                      THEN 1 ELSE 0 END) AS r7
      FROM events e JOIN f ON f.user_id = e.user_id
      GROUP BY f.user_id
    )
    SELECT CAST(SUM(r0) AS BIGINT) AS day0,
           CAST(SUM(r0 * r1) AS BIGINT) AS day0_and_1,
           CAST(SUM(r0 * r7) AS BIGINT) AS day0_and_7,
           CAST(SUM(r0 * r1) * 1000 // SUM(r0) AS BIGINT)
             AS d1_retention_per_mille,
           CAST(SUM(r0 * r7) * 1000 // SUM(r0) AS BIGINT)
             AS d7_retention_per_mille
    FROM flags
    """,
    tags=("analytics", "retention", "clickhouse-parity"),
    doc="ClickHouse retention() parity — retention(date = d0, date = "
        "d0+1, date = d0+7) over each user's first-seen day: the "
        "canonical D1/D7 product-retention numbers as conditional "
        "per-user flags ANDed against the baseline condition (the "
        "ClickHouse semantics: later conditions only count where the "
        "first holds), then one global rollup with per-mille rates. "
        "q_cohort_retention is the full (cohort x offset) matrix; this "
        "is the CH-function-shaped scalar summary. Scale: one per-user "
        "flag aggregate (map-side combinable) + a 1-row rollup.",
)
def q_clickhouse_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    f = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    flags = (
        ev.join(f, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("d") == F.col("d0"), 1).otherwise(0))
            .alias("r0"),
            F.max(
                F.when(F.col("d") == F.date_add(F.col("d0"), 1), 1)
                .otherwise(0)
            ).alias("r1"),
            F.max(
                F.when(F.col("d") == F.date_add(F.col("d0"), 7), 1)
                .otherwise(0)
            ).alias("r7"),
        )
    )
    return flags.agg(
        F.sum("r0").cast("long").alias("day0"),
        F.sum(F.col("r0") * F.col("r1")).cast("long").alias("day0_and_1"),
        F.sum(F.col("r0") * F.col("r7")).cast("long").alias("day0_and_7"),
    ).select(
        "day0", "day0_and_1", "day0_and_7",
        F.expr("(day0_and_1 * 1000) div day0").cast("long")
        .alias("d1_retention_per_mille"),
        F.expr("(day0_and_7 * 1000) div day0").cast("long")
        .alias("d7_retention_per_mille"),
    )


_PATH_K = 5  # journey prefix length


@query(
    "q_event_path_topk",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path,
             CAST(COUNT(*) AS INT) AS path_len
      FROM r WHERE rn <= {_PATH_K} GROUP BY user_id
    )
    SELECT path, CAST(MAX(path_len) AS INT) AS path_len,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path ORDER BY n_users DESC, path
    """,
    tags=("analytics", "paths", "journey", "clickhouse-parity"),
    doc="User-journey path census — ClickHouse's sequence-analytics "
        "staple (the ordered groupArray -> arrayStringConcat shape that "
        "powers 'top paths to conversion' dashboards over a replicated "
        "event stream; the reference delegates exactly this class of "
        "query to ClickHouse, reference clickhouse/connect.py:25-26): "
        "each user's FIRST K=5 events in (ts, event_id) order collapse "
        "into a '>'-joined path string, and paths aggregate into a "
        "frequency table. Exact string lanes; per-user order comes from "
        "a user-partitioned row_number (one key shuffle), never a "
        "global sort. Scale: the path aggregate's exchange is bounded "
        "by |event_types|^K distinct paths regardless of user count; "
        "per-user state is K rows. The collect_list rides the same "
        "user-partitioned exchange the window already paid for.",
)
def q_event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firstk = (
        ev.select(
            "user_id", "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _PATH_K)
    )
    per_user = firstk.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count("*").cast("int").alias("path_len"),
    )
    return (
        per_user.groupBy("path")
        .agg(
            F.max("path_len").cast("int").alias("path_len"),
            F.count("*").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_users"), F.asc("path"))
    )


@query(
    "q_bitmap_segment_census",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
    c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_and
      FROM p a JOIN p b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT pr.type_a, pr.type_b, ca.n AS n_a, cb.n AS n_b, pr.n_and,
           ca.n + cb.n - pr.n_and AS n_or,
           ca.n + cb.n - 2 * pr.n_and AS n_xor,
           (pr.n_and * 1000) // (ca.n + cb.n - pr.n_and)
             AS jaccard_per_mille
    FROM pairs pr
    JOIN c ca ON ca.event_type = pr.type_a
    JOIN c cb ON cb.event_type = pr.type_b
    ORDER BY type_a, type_b
    """,
    tags=("analytics", "bitmap", "segments", "clickhouse-parity"),
    doc="Audience-segment overlap census — ClickHouse groupBitmapAnd/"
        "Or/Xor parity (the bitmap-intersection functions a replica "
        "user runs to size 'users who did A and B' segments; the "
        "reference's whole purpose is feeding ClickHouse exactly these, "
        "reference clickhouse/connect.py:25-26): per event-type pair, "
        "the exact AND / OR / XOR user cardinalities plus the Jaccard "
        "per-mille. The bitmap semantics compile to relational algebra: "
        "one DISTINCT (user, type) projection (|users| x |types| rows, "
        "users << events), a user-keyed hash self-join for AND, and "
        "inclusion-exclusion for OR/XOR — never bitmap blobs shipped "
        "around, never event x event. Scale: every join key is user_id "
        "or the |types|-bounded census row; map-side combinable "
        "throughout.",
)
def q_bitmap_segment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    p = ev.select("user_id", "event_type").distinct()
    c = p.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = p.select("user_id", F.col("event_type").alias("type_a"))
    b = p.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_and"))
    )
    ca = c.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = c.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_and",
            (F.col("n_a") + F.col("n_b") - F.col("n_and")).alias("n_or"),
            (F.col("n_a") + F.col("n_b") - 2 * F.col("n_and")).alias("n_xor"),
            F.expr("(n_and * 1000) div (n_a + n_b - n_and)")
            .alias("jaccard_per_mille"),
        )
        .orderBy("type_a", "type_b")
    )


# sequence-count state encoding: stage * 1_000_000 + count (events per
# user are far below 1e6, so the lanes never collide)
_SEQ_M = 1_000_000


@query(
    "q_clickhouse_sequence_count",
    oracle="""
    WITH RECURSIVE seqd AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    nmax AS (
      SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events
      FROM seqd GROUP BY user_id
    ),
    walk AS (
      SELECT user_id, 0 AS rn,
             0 AS st_vc, 0 AS cnt_vc, 0 AS st_vcp, 0 AS cnt_vcp
      FROM nmax
      UNION ALL
      SELECT w.user_id, w.rn + 1,
             CASE WHEN s.event_type = 'view' THEN 1
                  WHEN s.event_type = 'click' AND w.st_vc = 1 THEN 0
                  ELSE w.st_vc END,
             w.cnt_vc + CASE WHEN s.event_type = 'click'
                              AND w.st_vc = 1 THEN 1 ELSE 0 END,
             CASE WHEN s.event_type = 'view' AND w.st_vcp = 0 THEN 1
                  WHEN s.event_type = 'click' AND w.st_vcp = 1 THEN 2
                  WHEN s.event_type = 'purchase' AND w.st_vcp = 2 THEN 0
                  ELSE w.st_vcp END,
             w.cnt_vcp + CASE WHEN s.event_type = 'purchase'
                               AND w.st_vcp = 2 THEN 1 ELSE 0 END
      FROM walk w
      JOIN seqd s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT w.user_id, n.n_events,
           CAST(w.cnt_vc AS BIGINT) AS seq_count_vc,
           CAST(w.cnt_vcp AS BIGINT) AS seq_count_vcp
    FROM walk w JOIN nmax n
      ON n.user_id = w.user_id AND w.rn = n.n_events
    """,
    # The oracle walks the state machine with a recursive CTE rather
    # than list_reduce: DuckDB 1.0.0 mis-evaluates this branching fold
    # over the real per-user lists at full-table row counts (user 17
    # folds to the spec value 6 when queried alone or in small subsets,
    # 7 over all 150 groups — the ordered lists themselves are
    # identical, so the fold executor is at fault; the repo's green
    # sum-shaped list_reduce lanes are unaffected).
    # tests/test_round10_ops.py pins the fold semantics against a
    # hand-run state machine.
    tags=("analytics", "sequence", "clickhouse-parity"),
    doc="ClickHouse sequenceCount parity — the greedy non-overlapping "
        "ordered-pattern counter (sequenceCount('(?1).*(?2)')(ts, "
        "view, click) and the 3-step view->click->purchase variant), "
        "the third leg of the CH parametric sequence-analytics trio "
        "beside windowFunnel and retention: per user, a left fold of "
        "the (ts, event_id)-ordered event codes through an integer "
        "state machine (stage * 1e6 + count — greedy scan: advance on "
        "the expected step, count and reset on completion, skip "
        "everything else) via F.aggregate. The oracle replays the "
        "identical machine as a recursive CTE (see the list_reduce "
        "note above). Scale: per-user state is one long; the "
        "collect_list is bounded by per-user activity on the same "
        "user-keyed exchange every per-user query pays — never a "
        "global order.",
)
def q_clickhouse_sequence_count(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(0)
    )
    ord_ = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", code.alias("a")))
            ),
            lambda s: s["a"].cast("long"),
        ).alias("codes"),
        F.count("*").cast("long").alias("n_events"),
    )
    m = F.lit(_SEQ_M).cast("long")

    def fold_vc(acc, a):
        return (
            F.when((a == 1) & (acc < m), acc + m)
            .when((a == 2) & (acc >= m), acc - m + 1)
            .otherwise(acc)
        )

    def fold_vcp(acc, a):
        return (
            F.when((a == 1) & (acc < m), acc + m)
            .when((a == 2) & (acc >= m) & (acc < 2 * m), acc + m)
            .when((a == 3) & (acc >= 2 * m), acc - 2 * m + 1)
            .otherwise(acc)
        )

    zero = F.lit(0).cast("long")
    return ord_.select(
        "user_id", "n_events",
        (F.aggregate("codes", zero, fold_vc) % m).cast("long")
        .alias("seq_count_vc"),
        (F.aggregate("codes", zero, fold_vcp) % m).cast("long")
        .alias("seq_count_vcp"),
    ).orderBy("user_id")


@query(
    "q_event_rate_cusum",
    oracle="""
    WITH RECURSIVE hourly AS (
      SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT hour_us, n_events,
             ROW_NUMBER() OVER (ORDER BY hour_us) AS rn
      FROM hourly
    ),
    stats AS (
      SELECT CAST(SUM(n_events) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
             CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM hourly
    ),
    walk AS (
      SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS s
      UNION ALL
      SELECT w.rn + 1,
             GREATEST(0, w.s + i.n_events * 1000
                          - st.mean_milli - st.mean_milli // 10)
      FROM walk w
      JOIN idx i ON i.rn = w.rn + 1
      CROSS JOIN stats st
    )
    SELECT i.hour_us, i.n_events,
           w.s AS cusum_milli,
           CAST(w.s > 5 * st.mean_milli AS BOOLEAN) AS alarm
    FROM idx i
    JOIN walk w ON w.rn = i.rn
    CROSS JOIN stats st
    ORDER BY i.hour_us
    """,
    tags=("analytics", "anomaly", "changepoint", "streaming-shape"),
    doc="CUSUM changepoint detection over the hourly event rate — the "
        "Page (1954) cumulative-sum control chart, the standard "
        "sustained-rate-shift detector that complements "
        "q_event_anomaly_zscore's single-spike flags (a 20% rate creep "
        "never trips a z-score but accumulates in the CUSUM): "
        "S_t = max(0, S_{t-1} + (x_t - mean - k)) in exact integer "
        "milli-units with slack k = mean/10, alarming at 5x mean. The "
        "recursion folds over the CALENDAR-BOUNDED hourly series "
        "(hours in the retention window, never event-cardinality) via "
        "one F.aggregate scan whose accumulator carries the full S "
        "prefix; the oracle replays it as a recursive CTE (exact "
        "integer lanes, engine-identical max/trunc-div). Scale: the "
        "per-hour counts are ONE map-side-combinable aggregate over "
        "any event volume; everything after runs on |hours| rows in a "
        "single bounded task.",
)
def q_event_rate_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.select(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us")
        )
        .groupBy("hour_us")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    one = hourly.agg(
        F.sort_array(F.collect_list(F.struct("hour_us", "n_events")))
        .alias("series")
    )
    mean_milli = F.expr(
        "aggregate(series, 0L, (a, x) -> a + x.n_events) * 1000"
        " div size(series)"
    )
    prefixed = one.select(
        "series", mean_milli.alias("mean_milli")
    ).select(
        "series", "mean_milli",
        F.expr(
            "aggregate(series,"
            " struct(cast(0 as bigint) as s,"
            "        cast(array() as array<bigint>) as acc),"
            " (a, x) -> struct("
            "   greatest(0L, a.s + x.n_events * 1000"
            "            - mean_milli - mean_milli div 10) as s,"
            "   concat(a.acc, array(greatest(0L,"
            "     a.s + x.n_events * 1000"
            "     - mean_milli - mean_milli div 10))) as acc),"
            " a -> a.acc)"
        ).alias("cusum"),
    )
    return (
        prefixed.select(
            "mean_milli",
            F.explode(F.arrays_zip("series", "cusum")).alias("z"),
        )
        .select(
            F.col("z.series.hour_us").alias("hour_us"),
            F.col("z.series.n_events").alias("n_events"),
            F.col("z.cusum").alias("cusum_milli"),
            (F.col("z.cusum") > 5 * F.col("mean_milli")).alias("alarm"),
        )
        .orderBy("hour_us")
    )


@query(
    "q_window_funnel_strict",
    oracle=f"""
    WITH RECURSIVE seqd AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    nmax AS (
      SELECT user_id, MAX(rn) AS mx FROM seqd GROUP BY user_id
    ),
    walk AS (
      SELECT user_id, 0 AS rn, 0 AS best, 0 AS lvl,
             CAST(0 AS BIGINT) AS t1
      FROM nmax
      UNION ALL
      SELECT w.user_id, w.rn + 1,
             GREATEST(w.best, nxt.lvl2), nxt.lvl2, nxt.t12
      FROM walk w
      JOIN seqd s ON s.user_id = w.user_id AND s.rn = w.rn + 1
      CROSS JOIN LATERAL (
        SELECT CASE
            WHEN s.event_type = 'view' THEN 1
            WHEN w.lvl = 1 AND s.event_type = 'click'
                 AND s.t_us <= w.t1 + {_WF_WINDOW_S * 1_000_000} THEN 2
            WHEN w.lvl = 2 AND s.event_type = 'purchase'
                 AND s.t_us <= w.t1 + {_WF_WINDOW_S * 1_000_000} THEN 3
            ELSE 0 END AS lvl2,
          CASE WHEN s.event_type = 'view' THEN s.t_us
               WHEN (w.lvl = 1 AND s.event_type = 'click'
                     AND s.t_us <= w.t1 + {_WF_WINDOW_S * 1_000_000})
                 OR (w.lvl = 2 AND s.event_type = 'purchase'
                     AND s.t_us <= w.t1 + {_WF_WINDOW_S * 1_000_000})
               THEN w.t1 ELSE CAST(0 AS BIGINT) END AS t12
      ) nxt
    ),
    final AS (
      SELECT w.user_id, GREATEST(w.best, w.lvl) AS level
      FROM walk w JOIN nmax n
        ON n.user_id = w.user_id AND w.rn = n.mx
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM final GROUP BY level ORDER BY level
    """,
    tags=("analytics", "funnel", "sequence", "clickhouse-parity"),
    doc="windowFunnel STRICT_ORDER mode — the ClickHouse variant where "
        "any interleaving event ABORTS the chain (windowFunnel(3600, "
        "'strict_order')(ts, view, click, purchase)): a per-user scan "
        "where a view always (re)opens a chain anchored at its "
        "timestamp, the expected next step within the window advances "
        "it, and ANY other event kills it (the non-strict cousin "
        "q_clickhouse_window_funnel skips interlopers instead); the "
        "histogram reports each user's best level. Exact integer "
        "lanes; Spark folds the per-user ordered stream through a "
        "(best, lvl, t1) struct accumulator via F.aggregate, the "
        "oracle replays the identical machine as a recursive CTE "
        "(never list_reduce — see q_clickhouse_sequence_count's note). "
        "Scale: per-user state is three ints on the user-keyed "
        "exchange; the histogram is a |levels|-row aggregate.",
)
def q_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    win = _WF_WINDOW_S * 1_000_000
    ord_ = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t_us"),
                        "event_id",
                        F.col("event_type").alias("et"),
                    )
                )
            ),
            lambda s: F.struct(
                s["t_us"].alias("t_us"), s["et"].alias("et")
            ),
        ).alias("evs")
    )
    init = F.expr(
        "struct(0 as best, 0 as lvl, cast(0 as bigint) as t1)"
    )
    step = (
        "(a, x) -> struct("
        " greatest(a.best, CASE"
        "   WHEN x.et = 'view' THEN 1"
        f"  WHEN a.lvl = 1 AND x.et = 'click' AND x.t_us <= a.t1 + {win}"
        "     THEN 2"
        f"  WHEN a.lvl = 2 AND x.et = 'purchase' AND x.t_us <= a.t1 + {win}"
        "     THEN 3"
        "   ELSE 0 END) as best,"
        " CASE"
        "   WHEN x.et = 'view' THEN 1"
        f"  WHEN a.lvl = 1 AND x.et = 'click' AND x.t_us <= a.t1 + {win}"
        "     THEN 2"
        f"  WHEN a.lvl = 2 AND x.et = 'purchase' AND x.t_us <= a.t1 + {win}"
        "     THEN 3"
        "   ELSE 0 END as lvl,"
        " CASE WHEN x.et = 'view' THEN x.t_us"
        f"      WHEN (a.lvl = 1 AND x.et = 'click' AND x.t_us <= a.t1 + {win})"
        f"        OR (a.lvl = 2 AND x.et = 'purchase'"
        f"            AND x.t_us <= a.t1 + {win})"
        "       THEN a.t1 ELSE cast(0 as bigint) END as t1)"
    )
    folded = ord_.select(
        F.expr(
            "aggregate(evs, struct(0 as best, 0 as lvl,"
            " cast(0 as bigint) as t1), "
            + step
            + ", a -> greatest(a.best, a.lvl))"
        ).alias("level")
    )
    return (
        folded.groupBy("level")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(F.col("level").cast("long").alias("level"), "n_users")
        .orderBy("level")
    )


@query(
    "q_funnel_latency_histogram",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
        AND epoch_us(e.ts) <= t1.t1 + {_WF_WINDOW_S * 1_000_000}
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e
      JOIN t1 ON t1.user_id = e.user_id
      JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
        AND epoch_us(e.ts) <= t1.t1 + {_WF_WINDOW_S * 1_000_000}
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT t3.user_id,
             GREATEST((t3.t3 - t1.t1) // 1000000, 1) AS secs
      FROM t3 JOIN t1 ON t1.user_id = t3.user_id
    ),
    binned AS (
      SELECT user_id, length(bin(secs)) - 1 AS log2_bin, secs FROM lat
    )
    SELECT CAST(log2_bin AS BIGINT) AS log2_secs_bin,
           CAST(1 << CAST(log2_bin AS INT) AS BIGINT) AS bin_floor_s,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(secs) AS BIGINT) AS min_s,
           CAST(MAX(secs) AS BIGINT) AS max_s
    FROM binned GROUP BY log2_bin ORDER BY log2_secs_bin
    """,
    tags=("analytics", "funnel", "latency", "clickhouse-parity"),
    doc="Funnel conversion-latency histogram — the time axis the level "
        "histogram (q_clickhouse_window_funnel) hides: for every user "
        "who completes view->click->purchase inside the window, the "
        "view-to-purchase latency lands in an exact log2-second bin "
        "(floor(log2(s)) via binary string length — the repo's "
        "transcendental-free log lane), with per-bin min/max seconds. "
        "Sub-second conversions clamp to the 1s bin so the bin index "
        "is always defined. Same per-user minima chain as the funnel "
        "(users << events, map-side combinable); the histogram is a "
        "|bins|-row aggregate — at 100 TB the exchange carries "
        "partitions x ~20 bins rows.",
)
def q_funnel_latency_histogram(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    win = _WF_WINDOW_S * 1_000_000
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("us").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("us") > F.col("t1"))
                & (F.col("us") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t1, "user_id").join(t2, "user_id")
        .filter((F.col("us") > F.col("t2"))
                & (F.col("us") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("us").alias("t3"))
    )
    lat = t3.join(t1, "user_id").select(
        "user_id",
        F.greatest(F.expr("(t3 - t1) div 1000000"), F.lit(1).cast("long"))
        .alias("secs"),
    )
    binned = lat.select(
        "secs", (F.length(F.bin("secs")) - 1).cast("long").alias("b")
    )
    return (
        binned.groupBy("b")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.min("secs").cast("long").alias("min_s"),
            F.max("secs").cast("long").alias("max_s"),
        )
        .select(
            F.col("b").alias("log2_secs_bin"),
            F.expr("shiftleft(1L, cast(b as int))").cast("long")
            .alias("bin_floor_s"),
            "n_users", "min_s", "max_s",
        )
        .orderBy("log2_secs_bin")
    )


@query(
    "q_clickhouse_summap_parity",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT))
                  AS BIGINT) AS v_milli,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(v_milli) AS BIGINT) AS total_milli,
           string_agg(event_type || ':' || CAST(v_milli AS STRING)
                      || ':' || CAST(n AS STRING),
                      ',' ORDER BY event_type) AS summap
    FROM s GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "clickhouse-parity", "map-aggregate"),
    doc="sumMap()/countMap parity (r11) — ClickHouse's map-valued "
        "aggregate (sumMap(key, value) returns the per-key sums as one "
        "map cell; the replica's users aggregate metric maps per entity "
        "this way rather than pivoting unknown key sets into columns): "
        "per user, every event type's exact milli-unit value sum and "
        "count, rendered as the canonical 'k:v:n' map string sorted by "
        "key — character-identical on both engines, so the whole map "
        "CELL is value-hashed, not just its scalars. Value lane: "
        "floor(value*1000) exact integer milli-units (the repo's "
        "established JSON/event money lane). Scale: two map-side-"
        "combinable hash aggregates ((user, type) then user) — the map "
        "cardinality per user is bounded by |event types|, the classic "
        "sumMap contract; no joins, no windows.",
)
def q_clickhouse_summap_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v_milli = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
    s = ev.groupBy("user_id", "event_type").agg(
        F.sum(v_milli.cast("long")).cast("long").alias("v_milli"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_types"),
            F.sum("v_milli").cast("long").alias("total_milli"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("event_type", "v_milli", "n"))
                    ),
                    lambda x: F.concat_ws(
                        ":", x["event_type"],
                        x["v_milli"].cast("string"), x["n"].cast("string"),
                    ),
                ),
            ).alias("summap"),
        )
        .orderBy("user_id")
    )


@query(
    "q_clickhouse_quantile_weighted_parity",
    oracle="""
    WITH w AS (
      SELECT event_type,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v,
             CAST(1 + user_id % 3 AS BIGINT) AS wt
      FROM events
    ),
    hist AS (
      SELECT event_type, v, CAST(SUM(wt) AS BIGINT) AS w
      FROM w GROUP BY event_type, v
    ),
    cum AS (
      SELECT event_type, v, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY v) AS c,
             SUM(w) OVER (PARTITION BY event_type) AS wtot
      FROM hist
    )
    SELECT event_type,
           CAST(MAX(wtot) AS BIGINT) AS w_total,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_values,
           CAST(MIN(CASE WHEN c >= (wtot + 1) // 2 THEN v END) AS BIGINT)
             AS p50_milli,
           CAST(MIN(CASE WHEN c >= (9 * wtot + 9) // 10 THEN v END)
                AS BIGINT) AS p90_milli,
           CAST(MIN(CASE WHEN c >= (99 * wtot + 99) // 100 THEN v END)
                AS BIGINT) AS p99_milli
    FROM cum GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "clickhouse-parity", "quantile"),
    doc="quantileExactWeighted parity (r11) — ClickHouse's exact "
        "weighted quantile (the replica's users size latency/value SLOs "
        "with quantileExactWeighted(0.5, 0.9, 0.99)(v, w)): per event "
        "type, the type-1 weighted quantile — the smallest value whose "
        "cumulative weight reaches ceil(q * W) — over exact milli-unit "
        "values with weight 1 + user_id % 3. Computed on the HISTOGRAM, "
        "not the rows: a (type, value) hash aggregate collapses the "
        "corpus map-side-combinably first, so the per-type cumulative "
        "window runs over |distinct quantized values| rows (bounded by "
        "the milli-unit value domain, NOT the row count — the shape "
        "that keeps exact weighted quantiles viable at 100 TB where a "
        "row-ranked window would sort the corpus). All-integer lanes; "
        "ceil via (q_num * W + q_den - 1-free) integer arithmetic "
        "identical on both engines.",
)
def q_clickhouse_quantile_weighted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    hist = (
        ev.select(
            "event_type",
            F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
            .cast("long").alias("v"),
            (1 + F.col("user_id") % 3).cast("long").alias("wt"),
        )
        .groupBy("event_type", "v")
        .agg(F.sum("wt").cast("long").alias("w"))
    )
    w_cum = Window.partitionBy("event_type").orderBy("v")
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type", "v", "w",
        F.sum("w").over(w_cum).alias("c"),
        F.sum("w").over(w_all).alias("wtot"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("wtot").cast("long").alias("w_total"),
            F.count("*").cast("long").alias("n_distinct_values"),
            F.min(
                F.when(F.col("c") >= F.expr("(wtot + 1) div 2"), F.col("v"))
            ).cast("long").alias("p50_milli"),
            F.min(
                F.when(F.col("c") >= F.expr("(9 * wtot + 9) div 10"),
                       F.col("v"))
            ).cast("long").alias("p90_milli"),
            F.min(
                F.when(F.col("c") >= F.expr("(99 * wtot + 99) div 100"),
                       F.col("v"))
            ).cast("long").alias("p99_milli"),
        )
        .orderBy("event_type")
    )


@query(
    "q_event_sessionize_gap",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                  WHEN CAST(date_diff('second', LAG(ts) OVER w, ts)
                       AS BIGINT) > 1800 THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sess_id
      FROM seq
    ),
    per_sess AS (
      SELECT user_id, sess_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
               AS span_s
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(MAX(span_s) AS BIGINT) AS max_session_span_s,
           CAST(SUM(n_events) AS BIGINT) AS n_events_total
    FROM per_sess GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "sessionization", "clickhouse-parity"),
    doc="Gap-based sessionization (r11) — the classic inactivity-cut "
        "session assignment (a new session starts after a 30-minute "
        "silence; ClickHouse users build this with runningDifference/"
        "window funnels, web analytics defines sessions exactly this "
        "way — it complements q_session_windows_5m's event-time window "
        "sessions with the LAG-gap + running-sum formulation): per "
        "user, LAG gap > 1800 s flags a session start, the running sum "
        "of flags is the session id, and the census reports session "
        "counts, the busiest session, and the longest span. Exact "
        "integer second lanes; (ts, event_id) ordering makes ties "
        "deterministic. Scale: ONE hash exchange on user_id feeds both "
        "windows and the aggregates (per-user partitions, bounded by "
        "per-user activity); no joins.",
)
def q_event_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    new_sess = F.when(
        F.lag("ts").over(w).isNull() | (gap_s > 1800), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id", "ts",
        F.sum(new_sess).over(w).alias("sess_id"),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("long").alias("span_s"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.max("n_events").cast("long").alias("max_session_events"),
            F.max("span_s").cast("long").alias("max_session_span_s"),
            F.sum("n_events").cast("long").alias("n_events_total"),
        )
        .orderBy("user_id")
    )


@query(
    "q_sample_by_hash_parity",
    oracle="""
    WITH s AS (
      SELECT event_type, user_id,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v
      FROM events
      WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) IN ('0', '1')
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_sampled,
           CAST(SUM(v) AS BIGINT) AS v_milli_sampled,
           CAST(COUNT(*) * 8 AS BIGINT) AS n_scaled,
           CAST(SUM(v) * 8 AS BIGINT) AS v_milli_scaled
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "clickhouse-parity", "sampling"),
    doc="SAMPLE-clause parity (r11) — ClickHouse tables declare "
        "`SAMPLE BY intHash32(UserID)` and queries add `SAMPLE 1/8` to "
        "read a deterministic, user-coherent subset plus a scale-up "
        "factor; the replica's users run their heaviest dashboards "
        "sampled. Same contract here: the sampling key is a hash of the "
        "ENTITY (user_id), so a sampled user's events are all in or all "
        "out (per-user funnels/sessions stay intact), and the sample is "
        "identical on every engine — membership is substr(md5(user_id), "
        "1, 1) IN ('0','1'), a 2/16 = 1/8 slice of a uniform hex digit. "
        "Emits exact sampled aggregates and the x8 scale-up estimates "
        "per event type. Scale: the hash filter is a scan-level "
        "predicate (no shuffle to decide membership — contrast reservoir "
        "sampling's global state); the agg is map-side combinable; at "
        "100 TB the sample IS the 12.5%% scan the user asked to pay for.",
)
def q_sample_by_hash_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sampled = ev.filter(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
        .isin("0", "1")
    ).select(
        "event_type", "user_id",
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
        .cast("long").alias("v"),
    )
    return (
        sampled.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.countDistinct("user_id").cast("long").alias("n_users_sampled"),
            F.sum("v").cast("long").alias("v_milli_sampled"),
            (F.count("*") * 8).cast("long").alias("n_scaled"),
            (F.sum("v") * 8).cast("long").alias("v_milli_scaled"),
        )
        .orderBy("event_type")
    )


@query(
    "q_counter_rate_resets",
    oracle="""
    WITH v AS (
      SELECT user_id,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v,
             LAG(CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND v < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
           CAST(SUM(CASE WHEN prev IS NULL THEN 0
                         WHEN v >= prev THEN v - prev
                         ELSE v END) AS BIGINT) AS increase_milli
    FROM v GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "clickhouse-parity", "window"),
    doc="deltaSum / counter-reset parity (r11) — ClickHouse's "
        "deltaSum() and Prometheus's increase() both sum the positive "
        "deltas of a monotone counter, treating a drop as a process "
        "restart (the counter restarts from the new value, which is "
        "then counted in full — the PromQL reset rule). Per user over "
        "events ordered by (ts, event_id): exact milli-unit increase, "
        "reset count, sample count. The deterministic tiebreak "
        "(event_id) makes LAG identical on both engines. Scale: the "
        "window partitions by user_id — per-user event counts are "
        "bounded and hash-distributed, never a corpus-wide sort; output "
        "is |users| rows, metadata-sized next to the event log.",
)
def q_counter_rate_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id",
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
        .cast("long").alias("v"),
        "ts", "event_id",
    ).withColumn("prev", F.lag("v").over(w))
    return (
        v.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.sum(
                F.when(F.col("prev").isNotNull()
                       & (F.col("v") < F.col("prev")), 1).otherwise(0)
            ).cast("long").alias("n_resets"),
            F.sum(
                F.when(F.col("prev").isNull(), 0)
                .when(F.col("v") >= F.col("prev"),
                      F.col("v") - F.col("prev"))
                .otherwise(F.col("v"))
            ).cast("long").alias("increase_milli"),
        )
        .orderBy("user_id")
    )


@query(
    "q_clickhouse_combinators_parity",
    oracle="""
    WITH s AS (
      SELECT event_type, user_id,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN v >= 50000 THEN 1 ELSE 0 END) AS BIGINT)
             AS count_if_high,
           CAST(SUM(CASE WHEN v >= 50000 THEN v ELSE 0 END) AS BIGINT)
             AS sum_if_high_milli,
           ROUND(CAST(SUM(CASE WHEN v >= 50000 THEN v ELSE 0 END)
                      AS DOUBLE)
                 / CAST(GREATEST(SUM(CASE WHEN v >= 50000 THEN 1
                                          ELSE 0 END), 1) AS DOUBLE), 6)
             AS avg_if_high_milli,
           CAST(COUNT(DISTINCT CASE WHEN v >= 50000 THEN user_id END)
                AS BIGINT) AS uniq_if_high_users,
           CAST(MAX(CASE WHEN v < 50000 THEN v END) AS BIGINT)
             AS max_if_low_milli,
           CAST(MIN(CASE WHEN v >= 50000 THEN v END) AS BIGINT)
             AS min_if_high_milli
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "clickhouse-parity", "aggregate"),
    doc="aggregate-combinator parity (r11) — ClickHouse's -If "
        "combinator family (countIf, sumIf, avgIf, uniqExactIf, maxIf, "
        "minIf) lets one scan compute many conditionally-masked "
        "aggregates; the replica's users lean on it for one-pass KPI "
        "rows. Spark expresses each as the canonical conditional "
        "aggregate (SUM/MAX/MIN over CASE masks, COUNT DISTINCT over a "
        "NULL-masked key) — one hash aggregate, one scan, no self-joins. "
        "avgIf rides the exact-sums lane: round(sum/count, 6) where "
        "both operands are exact integers and the division is a single "
        "correctly-rounded IEEE op, identical on both engines. Scale: "
        "one map-side-combinable aggregate regardless of how many "
        "combinators the row carries; this is the shape that replaces N "
        "filtered subqueries with 1 scan at 100 TB.",
)
def q_clickhouse_combinators_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    s = ev.select(
        "event_type", "user_id",
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
        .cast("long").alias("v"),
    )
    high = F.col("v") >= 50000
    return (
        s.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("count_if_high"),
            F.sum(F.when(high, F.col("v")).otherwise(0)).cast("long")
            .alias("sum_if_high_milli"),
            F.round(
                F.sum(F.when(high, F.col("v")).otherwise(0))
                .cast("double")
                / F.greatest(
                    F.sum(F.when(high, 1).otherwise(0)), F.lit(1)
                ).cast("double"),
                6,
            ).alias("avg_if_high_milli"),
            F.countDistinct(F.when(high, F.col("user_id"))).cast("long")
            .alias("uniq_if_high_users"),
            F.max(F.when(~high, F.col("v"))).cast("long")
            .alias("max_if_low_milli"),
            F.min(F.when(high, F.col("v"))).cast("long")
            .alias("min_if_high_milli"),
        )
        .orderBy("event_type")
    )


@query(
    "q_simple_linreg_by_segment",
    oracle="""
    WITH xy AS (
      SELECT c.c_mktsegment AS segment,
             CAST(datediff('day', DATE '1992-01-01',
                           CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(FLOOR(o.o_totalprice * 1000) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    sums AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                  AS DOUBLE) AS sxx
      FROM xy GROUP BY segment
    )
    SELECT segment, n AS n_orders,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)
             AS slope_milli_per_day,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept_milli
    FROM sums ORDER BY segment
    """,
    tags=("analytics", "clickhouse-parity", "regression"),
    doc="simpleLinearRegression parity (r11) — ClickHouse's one-pass "
        "least-squares aggregate (slope, intercept) over (x, y) pairs; "
        "the replica's users trend order value over time per market "
        "segment. Exactness lineage: x (days since 1992-01-01) and y "
        "(exact milli-price) are integers; the five sufficient "
        "statistics (n, Σx, Σy, Σxy, Σx²) accumulate as DECIMAL(38,0)/"
        "HUGEINT — exact and order-independent; slope and intercept are "
        "then a fixed tree of correctly-rounded IEEE ops (convert, "
        "multiply, subtract, divide) over those exact sums, rounded to "
        "6 dp — bit-identical cross-engine with no transcendental "
        "anywhere (the rounded-lane defense, docs/TRANSCENDENTALS.md). "
        "Scale: a broadcast-joined dim (customer at 1/10 the fact "
        "rows... broadcast by AQE at test SF; hash join on o_custkey at "
        "100 TB) into one map-side-combinable aggregate of 5 sums — the "
        "textbook distributed-regression shape; no windows, no "
        "second pass.",
)
def q_simple_linreg_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    xy = (
        orders.join(customer,
                    orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date"))
            .cast("long").alias("x"),
            F.floor(F.col("o_totalprice") * 1000).cast("long").alias("y"),
        )
    )
    dec = "decimal(28,0)"
    sums = xy.groupBy("segment").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))
        .cast("double").alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
        .cast("double").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    slope = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "segment",
        F.col("n").alias("n_orders"),
        F.round(slope, 6).alias("slope_milli_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / n_d, 6)
        .alias("intercept_milli"),
    ).orderBy("segment")


@query(
    "q_array_hof_parity",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT)
                  ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n,
           CAST(len(list_filter(vs, x -> x >= 50000)) AS BIGINT)
             AS n_high,
           CAST(list_sum(list_transform(vs, x -> x * 2 + 1)) AS BIGINT)
             AS mapped_sum,
           CAST(list_sum(list_transform(
                  list_zip(vs[1:len(vs) - 1], vs[2:len(vs)]),
                  p -> CASE WHEN p[2] > p[1] THEN 1 ELSE 0 END))
                AS BIGINT) AS n_ascents,
           COALESCE(array_to_string(list_transform(
             list_filter(vs, x -> x % 7 = 0), x -> CAST(x AS STRING)),
             ','), '') AS sevens_csv
    FROM seq ORDER BY user_id
    """,
    tags=("analytics", "clickhouse-parity", "higher-order"),
    doc="Higher-order array-function parity (r11) — ClickHouse's "
        "arrayFilter/arrayMap/arraySum/arrayZip lambda family (the "
        "replica's users post-process groupArray sequences with them "
        "constantly). Per user, the (ts, event_id)-ordered milli-value "
        "sequence is built once (array_sort over collect_list of "
        "structs — deterministic total order), then: filtered count, "
        "mapped-sum (x*2+1), pairwise-ascent count via zip_with on the "
        "shifted array (arrayDifference's shape), and a filtered "
        "projection serialized as the canonical CSV so the ARRAY lane "
        "itself is value-hashed (never emitted as a raw array — the "
        "driver contract). Every lambda runs JVM-side inside Catalyst "
        "(no Python in the row path). Scale: one user-keyed hash "
        "aggregate; per-user arrays are bounded by per-entity event "
        "counts, the groupArray contract.",
)
def q_array_hof_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    seq = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id",
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
                .cast("long").alias("v"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda x: x["v"]
            ).alias("vs")
        )
    )
    vs = F.col("vs")
    return seq.select(
        "user_id",
        F.size(vs).cast("long").alias("n"),
        F.size(F.filter(vs, lambda x: x >= 50000)).cast("long")
        .alias("n_high"),
        F.aggregate(
            F.transform(vs, lambda x: x * 2 + 1),
            F.lit(0).cast("long"), lambda a, x: a + x,
        ).cast("long").alias("mapped_sum"),
        F.aggregate(
            F.zip_with(
                F.slice(vs, 1, F.size(vs) - 1),
                F.slice(vs, 2, F.size(vs) - 1),
                lambda a, b: F.when(b > a, 1).otherwise(0),
            ),
            F.lit(0).cast("long"), lambda a, x: a + x,
        ).cast("long").alias("n_ascents"),
        F.concat_ws(
            ",",
            F.transform(
                F.filter(vs, lambda x: x % 7 == 0),
                lambda x: x.cast("string"),
            ),
        ).alias("sevens_csv"),
    ).orderBy("user_id")


@query(
    "q_clickhouse_minmap_maxmap_parity",
    oracle="""
    WITH day AS (
      SELECT user_id, event_type, CAST(ts AS DATE) AS d,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v
      FROM events
    ),
    daily AS (  -- the per-insert-block map cells minMap/maxMap would see
      SELECT user_id, event_type, d,
             CAST(MIN(v) AS BIGINT) AS mn, CAST(MAX(v) AS BIGINT) AS mx
      FROM day GROUP BY user_id, event_type, d
    ),
    merged AS (  -- the -Merge fold across blocks
      SELECT user_id, event_type,
             CAST(MIN(mn) AS BIGINT) AS mn, CAST(MAX(mx) AS BIGINT) AS mx
      FROM daily GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           string_agg(event_type || ':' || CAST(mn AS STRING), ','
                      ORDER BY event_type) AS minmap,
           string_agg(event_type || ':' || CAST(mx AS STRING), ','
                      ORDER BY event_type) AS maxmap
    FROM merged GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "clickhouse-parity", "map-aggregate", "merge"),
    doc="minMap()/maxMap() parity (r12) — the extremum siblings of "
        "q_clickhouse_summap_parity, INCLUDING their merge algebra: the "
        "per-(user, type) min/max milli-values are first aggregated per "
        "DAY (the map cells each insert block's state would hold) and "
        "then folded across days (min-of-mins / max-of-maxes — the "
        "associative -Merge combine), proving the two-level fold equals "
        "the direct aggregate the oracle could also take. Maps render "
        "as the canonical sorted 'k:v' CSV cell so the whole map is "
        "value-hashed. Scale: two map-side-combinable hash aggregates "
        "into a |users| x |types| relation, then the per-user roll-up; "
        "map cardinality bounded by the type taxonomy.",
)
def q_clickhouse_minmap_maxmap_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000).cast("long")
    daily = (
        ev.select(
            "user_id", "event_type",
            F.col("ts").cast("date").alias("d"), v.alias("v"),
        )
        .groupBy("user_id", "event_type", "d")
        .agg(F.min("v").cast("long").alias("mn"),
             F.max("v").cast("long").alias("mx"))
    )
    merged = daily.groupBy("user_id", "event_type").agg(
        F.min("mn").cast("long").alias("mn"),
        F.max("mx").cast("long").alias("mx"),
    )

    def _csv(field: str):
        return F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_type", F.col(field)))
                ),
                lambda x: F.concat_ws(
                    ":", x["event_type"], x[field].cast("string")
                ),
            ),
        )

    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_types"),
            _csv("mn").alias("minmap"),
            _csv("mx").alias("maxmap"),
        )
        .orderBy("user_id")
    )


@query(
    "q_clickhouse_moving_sum_parity",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             CAST(SUM(CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT))
                  AS BIGINT) AS v
      FROM events GROUP BY event_type, CAST(CAST(ts AS DATE) AS VARCHAR)
    )
    SELECT event_type, d, v,
           CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS mv3,
           CAST(MAX(v) OVER (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS mvmax3
    FROM daily ORDER BY event_type, d
    """,
    tags=("analytics", "clickhouse-parity", "window"),
    doc="groupArrayMovingSum(3) / groupArrayMovingMax(3) parity (r12) — "
        "ClickHouse's moving-window array aggregates, re-expressed as "
        "the rows-frame window over the per-day totals (each output ROW "
        "is one element of the array cell the CH function would emit, "
        "so the hash covers the identical values). Exact milli lane "
        "end-to-end. Scale: one map-side-combinable daily aggregate, "
        "then a window over the |types| x |days| relation — bounded by "
        "the calendar, never the event volume.",
)
def q_clickhouse_moving_sum_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    v = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000).cast("long")
    daily = (
        ev.select("event_type",
                  F.col("ts").cast("date").cast("string").alias("d"),
                  v.alias("v0"))
        .groupBy("event_type", "d")
        .agg(F.sum("v0").cast("long").alias("v"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(-2, Window.currentRow)
    )
    return daily.select(
        "event_type", "d", "v",
        F.sum("v").over(w).cast("long").alias("mv3"),
        F.max("v").over(w).cast("long").alias("mvmax3"),
    ).orderBy("event_type", "d")


@query(
    "q_clickhouse_bitmap_ops_parity",
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    card AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM m
      GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_and
      FROM m a JOIN m b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT ca.event_type AS type_a, cb.event_type AS type_b,
           COALESCE(i.n_and, 0) AS n_and,
           ca.n + cb.n - COALESCE(i.n_and, 0) AS n_or,
           ca.n + cb.n - 2 * COALESCE(i.n_and, 0) AS n_xor,
           (COALESCE(i.n_and, 0) * 1000)
             // (ca.n + cb.n - COALESCE(i.n_and, 0)) AS jaccard_per_mille
    FROM card ca JOIN card cb ON ca.event_type < cb.event_type
    LEFT JOIN inter i
      ON i.type_a = ca.event_type AND i.type_b = cb.event_type
    ORDER BY type_a, type_b
    """,
    tags=("analytics", "clickhouse-parity", "bitmap", "setop"),
    doc="groupBitmapAnd/Or/Xor parity (r12) — ClickHouse's bitmap "
        "set-algebra over audience segments (each event type's distinct "
        "user set is the bitmap; q_bitmap_segment_census holds the "
        "membership census, this adds the PAIRWISE algebra): for every "
        "type pair, exact AND via one distinct-membership self-join, "
        "then OR and XOR by inclusion-exclusion on the per-type "
        "cardinalities — never materializing the union. Integer Jaccard "
        "per-mille rides the exact div lane. Scale: the membership "
        "relation is |types| x |users| at most (distinct, map-side "
        "combinable); the pair join fans each user by their type count "
        "(bounded by the taxonomy); output is |types|^2 rows. At 100 TB "
        "the per-type sets would persist as roaring bitmaps / KMV "
        "sketches (q_distinct_sketch_merge proves the sketch fold) — "
        "the exact lane here is the calibration truth.",
)
def q_clickhouse_bitmap_ops_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # m feeds the cardinalities AND both sides of the intersection
    # self-join — materialize the distinct once (guide §2.4).
    m = (
        ev.select("event_type", "user_id").distinct()
        .localCheckpoint(eager=True)
    )
    card = m.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a, b = m.alias("a"), m.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_and"))
    )
    ca, cb = card.alias("ca"), card.alias("cb")
    pairs = ca.join(
        cb, F.col("ca.event_type") < F.col("cb.event_type")
    ).select(
        F.col("ca.event_type").alias("type_a"),
        F.col("cb.event_type").alias("type_b"),
        F.col("ca.n").alias("na"),
        F.col("cb.n").alias("nb"),
    )
    return (
        pairs.join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b",
            F.coalesce(F.col("n_and"), F.lit(0)).cast("long").alias("n_and"),
            (F.col("na") + F.col("nb")
             - F.coalesce(F.col("n_and"), F.lit(0))).cast("long")
            .alias("n_or"),
            (F.col("na") + F.col("nb")
             - 2 * F.coalesce(F.col("n_and"), F.lit(0))).cast("long")
            .alias("n_xor"),
            F.expr(
                "(coalesce(n_and, 0) * 1000)"
                " div (na + nb - coalesce(n_and, 0))"
            ).cast("long").alias("jaccard_per_mille"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_clickhouse_grouparray_sorted_parity",
    oracle="""
    WITH v AS (
      SELECT user_id,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v,
             event_id
      FROM events
    ),
    ranked AS (
      SELECT user_id, v,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY v, event_id) AS rn
      FROM v
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(CAST(v AS STRING), ',' ORDER BY rn) AS smallest5
    FROM ranked WHERE rn <= 5
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "clickhouse-parity", "array-aggregate"),
    doc="groupArraySorted(5) parity (r12) — ClickHouse's bounded sorted-"
        "array aggregate (the per-entity 'N smallest readings' cell): "
        "per user, the five smallest milli-values in order, rendered as "
        "the canonical CSV cell. Ties break on event_id so the kept "
        "five are deterministic. Spark side is the aggregate form — "
        "sort_array over a min-struct collect then slice — NOT a global "
        "window; the per-group array is bounded by construction before "
        "serialization. Exact milli lane. Scale: one hash aggregate "
        "keyed by user; per-group state is the collected list, bounded "
        "in the output by the slice — at true scale the collect is "
        "replaced by the per-partition top-N fold the ANN lanes use; "
        "the CSV cell hash proves element-exact parity either way.",
)
def q_clickhouse_grouparray_sorted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000).cast("long")
    return (
        ev.select("user_id", v.alias("v"), "event_id")
        .groupBy("user_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("v", "event_id"))),
                1, 5,
            ).alias("top"),
        )
        .select(
            "user_id",
            F.size("top").cast("long").alias("n_kept"),
            F.concat_ws(
                ",", F.transform("top", lambda x: x["v"].cast("string"))
            ).alias("smallest5"),
        )
        .orderBy("user_id")
    )


@query(
    "q_sample_offset_parity",
    oracle="""
    WITH lanes AS (
      SELECT event_type, user_id,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000) AS BIGINT) AS v,
             strpos('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1
               AS bucket
      FROM events
    ),
    sliced AS (
      SELECT CASE WHEN bucket BETWEEN 0 AND 3 THEN 'worker_0'
                  WHEN bucket BETWEEN 4 AND 7 THEN 'worker_1'
                  WHEN bucket BETWEEN 8 AND 11 THEN 'worker_2'
                  ELSE 'worker_3' END AS worker,
             event_type, user_id, v
      FROM lanes
    )
    SELECT worker, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(v) AS BIGINT) AS v_milli
    FROM sliced GROUP BY worker, event_type
    ORDER BY worker, event_type
    """,
    tags=("analytics", "clickhouse-parity", "sampling"),
    doc="SAMPLE x OFFSET y parity (r12) — the clause that lets N "
        "workers split a table into DISJOINT deterministic slices "
        "(worker k reads SAMPLE 1/4 OFFSET k/4): the same entity-"
        "coherent md5 sampling key as q_sample_by_hash_parity, but "
        "partitioned into four contiguous hash-digit ranges covering "
        "the full keyspace, each worker's per-type census reported side "
        "by side. The output proves the slices are a PARTITION — "
        "disjoint and exhaustive (their counts sum to the table; a "
        "user_id never appears under two workers because membership is "
        "a function of its hash digit). Scale: membership is a "
        "scan-level predicate per worker (no shuffle to coordinate the "
        "split — the property that makes OFFSET the standard parallel "
        "backfill idiom); one map-side-combinable census.",
)
def q_sample_offset_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        ) - 1
    )
    sliced = ev.select(
        F.when(bucket <= 3, "worker_0")
        .when(bucket <= 7, "worker_1")
        .when(bucket <= 11, "worker_2")
        .otherwise("worker_3").alias("worker"),
        "event_type", "user_id",
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
        .cast("long").alias("v"),
    )
    return (
        sliced.groupBy("worker", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("v").cast("long").alias("v_milli"),
        )
        .orderBy("worker", "event_type")
    )


_UNIQ_UPTO_N = 50        # uniqUpTo(50): exact to 50, saturates at 51
_UNIQ_UPTO_PARTS = 3     # deterministic insert-block split


@query(
    "q_clickhouse_uniq_upto_parity",
    oracle=f"""
    SELECT event_type, CAST(event_id % 16 AS BIGINT) AS grp,
           CAST(LEAST(COUNT(DISTINCT user_id), {_UNIQ_UPTO_N + 1})
                AS BIGINT) AS uniq_upto,
           CAST(CASE WHEN COUNT(DISTINCT user_id) > {_UNIQ_UPTO_N}
                     THEN 1 ELSE 0 END AS BIGINT) AS saturated
    FROM events
    GROUP BY event_type, event_id % 16
    ORDER BY event_type, grp
    """,
    tags=("analytics", "clickhouse-parity", "agg-state", "uniq"),
    doc="uniqUpTo(N) combinator parity (r13) — ClickHouse's "
        "exact-to-a-point distinct counter: the answer is exact while "
        "the group has <= N={n} distinct values and saturates at N+1 "
        "beyond (the 'is this column low-cardinality enough' probe the "
        "codec advisor family consumes). The Spark side proves the "
        "MERGEABLE-STATE form: per (key, insert block) the state is the "
        "<= N+1 SMALLEST distinct values (a bounded sorted slice — the "
        "k-smallest merge property makes union-then-recap equal "
        "cap-of-union), blocks merge by union + distinct + recap, and "
        "the finalize counts the merged state. The oracle computes "
        "LEAST(COUNT(DISTINCT), N+1) directly, so the hash match is "
        "the state-fold == direct proof. Scale: per-block state is "
        "bounded at N+1 rows per key BEFORE the merge shuffle (the "
        "rank window runs per (key, block) partition); no unbounded "
        "collect anywhere.",
)
def q_clickhouse_uniq_upto_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.col("event_id") % 16).cast("long").alias("grp"),
        (F.col("event_id") % _UNIQ_UPTO_PARTS).alias("part"),
        "user_id",
    )
    # -State: per (key, block), the N+1 smallest distinct values
    per_part = ev.select("event_type", "grp", "part", "user_id").distinct()
    w_part = Window.partitionBy("event_type", "grp", "part").orderBy(
        "user_id"
    )
    state = (
        per_part.withColumn("rn", F.row_number().over(w_part))
        .filter(F.col("rn") <= _UNIQ_UPTO_N + 1)
        .drop("rn")
    )
    # -Merge: union of block states, recapped
    merged = state.select("event_type", "grp", "user_id").distinct()
    w_key = Window.partitionBy("event_type", "grp").orderBy("user_id")
    recapped = (
        merged.withColumn("rn", F.row_number().over(w_key))
        .filter(F.col("rn") <= _UNIQ_UPTO_N + 1)
    )
    return (
        recapped.groupBy("event_type", "grp")
        .agg(F.count("*").cast("long").alias("uniq_upto"))
        .select(
            "event_type", "grp", "uniq_upto",
            (F.col("uniq_upto") > _UNIQ_UPTO_N).cast("long")
            .alias("saturated"),
        )
        .orderBy("event_type", "grp")
    )


@query(
    "q_clickhouse_topk_weighted_parity",
    oracle="""
    WITH weighted AS (
      SELECT event_type, user_id,
             SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS w
      FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, user_id, w,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY w DESC, user_id) AS rn
      FROM weighted
    )
    SELECT event_type,
           string_agg(CAST(user_id AS VARCHAR) || ':' || CAST(w AS VARCHAR),
                      ',' ORDER BY rn) AS topk_csv,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM ranked WHERE rn <= 5
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("analytics", "clickhouse-parity", "topk"),
    doc="topKWeighted(5)(user_id, v_milli) parity (r13) — the "
        "weight-aware heavy-hitter list beside q_heavy_hitters_countmin "
        "(frequency sketch) and q_clickhouse_grouparray_sorted_parity "
        "(bounded sorted cell): per event_type, the 5 users with the "
        "largest exact total weight on the integer milli lane, rendered "
        "as the ordered 'user:weight' CSV cell with (weight DESC, user "
        "ASC) determinism. The exact integer weight sum is "
        "order-insensitive, the rank window runs per key over the "
        "ALREADY-AGGREGATED (key, user) relation (one row per user, "
        "never the raw stream), and the CSV render is integer-only so "
        "both engines serialize identical bytes. Scale: one map-side-"
        "combinable weight aggregate, one per-key window over |users| "
        "rows, 5-row cells out.",
)
def q_clickhouse_topk_weighted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    weighted = (
        ev.select(
            "event_type", "user_id",
            F.floor(F.col("value") * 1000).cast("long").alias("v"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.sum("v").cast("long").alias("w"))
    )
    w_key = Window.partitionBy("event_type").orderBy(
        F.desc("w"), F.asc("user_id")
    )
    ranked = weighted.withColumn("rn", F.row_number().over(w_key)).filter(
        F.col("rn") <= 5
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "user_id", "w"))
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["user_id"].cast("string"),
                        s["w"].cast("string"),
                    ),
                ),
            ).alias("topk_csv"),
            F.count("*").cast("long").alias("k"),
        )
        .orderBy("event_type")
    )


@query(
    "q_clickhouse_max_intersections_parity",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts)
               + (60 + CAST(floor(value) AS BIGINT) % 3600) * 1000000
               AS e_us
      FROM events
    ),
    pts AS (
      SELECT user_id, s_us AS t, 1 AS d, event_id FROM iv
      UNION ALL
      SELECT user_id, e_us AS t, -1 AS d, event_id FROM iv
    ),
    run AS (
      SELECT user_id, t,
             SUM(d) OVER (PARTITION BY user_id ORDER BY t, d, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running
      FROM pts
    ),
    mx AS (
      SELECT user_id,
             CAST(MAX(running) AS BIGINT) AS max_intersections,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
      FROM run GROUP BY user_id
    )
    SELECT m.user_id,
           m.max_intersections,
           CAST(MIN(CASE WHEN r.running = m.max_intersections
                         THEN r.t END) // 1000000 AS BIGINT) AS position_s,
           m.n_intervals
    FROM run r JOIN mx m ON r.user_id = m.user_id
    GROUP BY m.user_id, m.max_intersections, m.n_intervals
    ORDER BY m.user_id
    """,
    tags=("analytics", "clickhouse-parity", "intervals", "sweep-line"),
    doc="maxIntersections / maxIntersectionsPosition parity (r14): the "
        "maximum number of simultaneously-open activity intervals per "
        "user and the earliest instant it is reached. Intervals are "
        "half-open [s, e) and an end sorts BEFORE a start at the same "
        "instant (d=-1 < d=+1 in the sweep order), so touching "
        "intervals do not intersect — the documented deterministic "
        "semantic. The sweep is the classic +1/-1 point explosion with "
        "ONE running-sum window per user; the max is order-insensitive "
        "within equal (t, d) groups (all deltas same-signed, so the "
        "extreme sits at the group boundary), which is what makes the "
        "cross-engine hash stable. Scale: 2 rows per interval, one "
        "user_id key shuffle, two aggregates — no self-join, no range "
        "join; the naive overlap-count self-join this replaces is "
        "quadratic.",
)
def q_clickhouse_max_intersections_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    s_us = F.unix_micros("ts")
    dur_us = (60 + F.floor("value").cast("long") % 3600) * F.lit(1000000)
    iv = ev.select(
        "user_id", "event_id",
        s_us.alias("s_us"), (s_us + dur_us).alias("e_us"),
    )
    pts = iv.select(
        "user_id", F.col("s_us").alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionAll(
        iv.select(
            "user_id", F.col("e_us").alias("t"), F.lit(-1).alias("d"),
            "event_id",
        )
    )
    w_run = (
        Window.partitionBy("user_id").orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "user_id", "t", F.sum("d").over(w_run).alias("running")
    )
    w_u = Window.partitionBy("user_id")
    return (
        run.withColumn("mx", F.max("running").over(w_u))
        .groupBy("user_id")
        .agg(
            F.max("running").cast("long").alias("max_intersections"),
            F.expr(
                "cast(min(case when running = mx then t end) div 1000000 "
                "as bigint)"
            ).alias("position_s"),
            (F.count("*") / 2).cast("long").alias("n_intervals"),
        )
        .orderBy("user_id")
    )
