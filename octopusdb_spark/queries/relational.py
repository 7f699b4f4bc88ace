"""Relational query surface (SURVEY.md §2 Part B): joins, aggregations,
windows, sorts/top-k, set ops, scalar functions, date/JSON handling — the
DataFrame capabilities the engine exposes over external tables, phrased as
TPC-H-style named queries on the driver's star schema.

Scale notes: only fixed-size dimensions (region=5 rows, nation=25 rows)
carry a forced `F.broadcast` hint. Customer/supplier/part scale linearly
with SF (billions of rows at the 100 TB design point), so those joins are
left to AQE — broadcast at runtime when small, shuffled when not.
Aggregates do map-side partial aggregation for free; every top-k is a
window/limit with a unique tie-break. Decimal-accumulated sums keep results
bit-identical to the oracle (see common.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from octopusdb_spark.queries.common import dsum, dsum_sql, t


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-agg over lineitem. One pass, partial aggs
    map-side; only 7 columns read (column pruning)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective 3-way join + agg + deterministic top-10.
    The segment-filtered customer side is SF-scaled, so its join strategy
    is AQE's call; orders⋈lineitem shuffles on orderkey only."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join + per-nation revenue. Fixed-size
    nation/region are hinted; SF-scaled supplier/customer are AQE's call."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_top_customers_per_nation(spark, sf_dir):
    """Window rank: top-3 customers by total order value within each nation."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    totals = (
        orders.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spend"), F.count("*").alias("n_orders"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("total_spend"), F.asc("o_custkey"))
    return (
        totals.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select("n_name", F.col("o_custkey").alias("custkey"), "total_spend", "n_orders", "rank_in_nation")
        .orderBy("n_name", "rank_in_nation")
    )


def q_rollup_acctbal(spark, sf_dir):
    """ROLLUP aggregation: customer balance totals by region → nation → all."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(dsum("c_acctbal", "total_acctbal"), F.count("*").alias("n_customers"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


def q_set_ops(spark, sf_dir):
    """Set operators: customers that placed an order (semi) minus BUILDING
    segment (except), intersected with positive-balance customers."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey"
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positive = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    return with_orders.exceptAll(building).intersect(positive).orderBy("c_custkey")


def q_scalar_functions(spark, sf_dir):
    """Scalar-function surface: string/math/conditional builtins (stay inside
    whole-stage codegen — no UDFs)."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.when(F.col("p_size") > 25, "large").otherwise("small").alias("size_class"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_from_1000"),
    ).orderBy("p_partkey")


def q_orders_by_month(spark, sf_dir):
    """Date handling: per-month order counts and revenue."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
        .orderBy("month")
    )


def q_json_extract(spark, sf_dir):
    """JSON extraction from the events props payload + agg over the value."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.col("value"),
        )
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .orderBy("k_bucket")
    )


def q_running_totals(spark, sf_dir):
    """Ordered analytic window: per-user running event-value total and
    row index. Sequential in-order accumulation is deterministic."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("event_idx"),
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    ).orderBy("user_id", "event_id")


def q_sessionize(spark, sf_dir):
    """Sessionization: a new session starts after a >= 30-minute gap; counts
    sessions and events per user. Gap detection = lag + cumulative sum —
    the standard scalable sessionizer (no state loops)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_us").isNull()
                | ((F.col("ts_us") - F.col("prev_us")) >= 1_800_000_000)  # µs, integer-exact
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def q_session_window(spark, sf_dir):
    """Sessionization via Spark's NATIVE session_window operator (dynamic
    gap-merging windows) — the built-in alternative to the lag+cumsum
    sessionizer above. Boundary semantics differ by design: session_window
    merges an event landing exactly at last_ts + gap (new session only
    when the gap is EXCEEDED), so the oracle uses the matching strict->
    rule. One shuffle by (user, merged window); state is
    O(open sessions)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("ts", F.timestamp_micros("ts_us"))
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("ev"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("ev").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


def q_avg_order_gap(spark, sf_dir):
    """Window lag over dates: average days between consecutive orders per
    customer, for customers with >= 5 orders."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.withColumn("prev_date", F.lag("o_orderdate").over(w)).withColumn(
        "gap_days", F.datediff("o_orderdate", "prev_date")  # integer days, exact
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.coalesce(F.col("gap_days"), F.lit(0))).alias("total_gap_days"),
        )
        .filter(F.col("n_orders") >= 5)
        .withColumn(
            "avg_gap_days",
            F.round(F.col("total_gap_days").cast("double") / (F.col("n_orders") - 1), 6),
        )
        .select("o_custkey", "n_orders", "avg_gap_days")
        .orderBy("o_custkey")
    )


def q_event_time_windows(spark, sf_dir):
    """Batch analog of the streaming tumbling-window rollup: hourly
    event-time buckets per type (F.window is the same operator Structured
    Streaming uses; ts reconstructed from integer µs for oracle parity)."""
    ev = t(spark, sf_dir, "events")
    win = F.window(F.timestamp_micros(F.col("ts_us")), "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def q_funnel(spark, sf_dir):
    """Ordered funnel: users whose first view precedes their first
    subsequent click precedes their first subsequent purchase. Three
    conditional-min aggregations over one pass (no self-joins): stage k's
    timestamp is min(ts) among events after stage k-1 — the standard
    scalable funnel (shuffle = one hash agg by user)."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    v = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias("t_view")
    stage = ev.groupBy("user_id").agg(v)
    ev2 = ev.join(stage, "user_id")
    c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t_view")),
            F.col("ts_us"),
        )
    ).alias("t_click")
    stage2 = ev2.groupBy("user_id", "t_view").agg(c)
    ev3 = ev.join(stage2, "user_id")
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t_click")),
            F.col("ts_us"),
        )
    ).alias("t_purchase")
    funnel = ev3.groupBy("user_id", "t_view", "t_click").agg(p)
    return funnel.select(
        "user_id",
        F.col("t_view").isNotNull().alias("did_view"),
        F.col("t_click").isNotNull().alias("did_click"),
        F.col("t_purchase").isNotNull().alias("did_purchase"),
    ).orderBy("user_id")


def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds 200, joined back
    to their customer — aggregate-then-filter (HAVING) feeding the customer
    join (strategy left to AQE; customer is SF-scaled); the lineitem scan
    aggregates before anything is joined, so the join input is
    orders-not-lineitems sized."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", F.col("o_orderkey").alias("orderkey"), "o_totalprice", "sum_qty")
        .orderBy(F.desc("sum_qty"), "orderkey")
        .limit(100)
    )


def q_cohort_retention(spark, sf_dir):
    """Cohort retention over the event stream: users bucketed by first-seen
    day, counted per days-since-cohort offset — the classic retention
    triangle. Two aggregations (first-seen per user, then cohort x offset
    distinct users); integer-day math keeps it engine-exact."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")  # integer div, exact
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_active_users"))
        .filter(F.col("day_offset") <= 3)
        .orderBy("cohort_day", "day_offset")
    )


def q_moving_avg(spark, sf_dir):
    """Sliding window frame: 3-month moving average of monthly revenue per
    order priority (rowsBetween(-2, 0)). The frame sums at most 3 exact
    doubles in frame order — deterministic in both engines; monthly totals
    themselves are decimal-accumulated."""
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
    ).agg(dsum("o_totalprice", "revenue"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        monthly.withColumn("mov_avg_3m", F.round(F.avg("revenue").over(w), 6))
        .select("o_orderpriority", "month", "revenue", "mov_avg_3m")
        .orderBy("o_orderpriority", "month")
    )


def q_mode_event_type(spark, sf_dir):
    """Per-user mode (most frequent event type), ties broken by type desc —
    deterministic in both engines via an explicit rank, since native mode()
    functions leave ties unspecified. Count-then-rank: the shuffle carries
    one row per (user, type), not per event."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.desc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), F.col("cnt").alias("n"))
        .orderBy("user_id")
    )


ORACLES = {
    "q_cohort_retention": """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day
          FROM events
        ), first_seen AS (
          SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
        )
        SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
               count(DISTINCT e.user_id) AS n_active_users
        FROM ev e JOIN first_seen f USING (user_id)
        GROUP BY 1, 2 HAVING day_offset <= 3
        ORDER BY 1, 2""",
    "q_moving_avg": f"""
        WITH monthly AS (
          SELECT o_orderpriority,
                 CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                 {dsum_sql("o_totalprice", "revenue")}
          FROM orders GROUP BY 1, 2
        )
        SELECT o_orderpriority, month, revenue,
               round(avg(revenue) OVER (
                 PARTITION BY o_orderpriority ORDER BY month
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg_3m
        FROM monthly ORDER BY o_orderpriority, month""",
    "q_mode_event_type": """
        WITH counts AS (
          SELECT user_id, event_type, count(*) AS cnt
          FROM events GROUP BY user_id, event_type
        ), ranked AS (
          SELECT user_id, event_type, cnt,
                 row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type DESC) AS rn
          FROM counts
        )
        SELECT user_id, event_type AS mode_event_type, cnt AS n
        FROM ranked WHERE rn = 1 ORDER BY user_id""",
    "q18_large_volume": f"""
        WITH big AS (
          SELECT l_orderkey, {dsum_sql("l_quantity", "sum_qty")}
          FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 200
        )
        SELECT c_name, o_orderkey AS orderkey, o_totalprice, sum_qty
        FROM big JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY sum_qty DESC, orderkey LIMIT 100""",
    "q_funnel": """
        WITH s1 AS (
          SELECT user_id, min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view
          FROM events GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, s1.t_view,
                 min(CASE WHEN e.event_type = 'click' AND epoch_us(e.ts) > s1.t_view
                     THEN epoch_us(e.ts) END) AS t_click
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          GROUP BY e.user_id, s1.t_view
        ), s3 AS (
          SELECT e.user_id, s2.t_view, s2.t_click,
                 min(CASE WHEN e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t_click
                     THEN epoch_us(e.ts) END) AS t_purchase
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          GROUP BY e.user_id, s2.t_view, s2.t_click
        )
        SELECT user_id,
               t_view IS NOT NULL AS did_view,
               t_click IS NOT NULL AS did_click,
               t_purchase IS NOT NULL AS did_purchase
        FROM s3 ORDER BY user_id""",
    "q_event_time_windows": """
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(SUM(CAST("value" AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql("l_quantity", "sum_qty")},
               {dsum_sql("l_extendedprice", "sum_base_price")},
               {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
               {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
               count(*) AS count_order,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10""",
    "q5_local_supplier_volume": f"""
        SELECT n_name, {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""",
    "q_top_customers_per_nation": """
        WITH totals AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend,
                 count(*) AS n_orders
          FROM orders GROUP BY o_custkey
        ), ranked AS (
          SELECT n_name, o_custkey AS custkey, total_spend, n_orders,
                 row_number() OVER (PARTITION BY n_name ORDER BY total_spend DESC, o_custkey ASC)
                   AS rank_in_nation
          FROM totals
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT * FROM ranked WHERE rank_in_nation <= 3
        ORDER BY n_name, rank_in_nation""",
    "q_rollup_acctbal": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal,
               count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q_set_ops": """
        WITH with_orders AS (
          SELECT c_custkey FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM orders)
        ), building AS (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ), positive AS (
          SELECT c_custkey FROM customer WHERE c_acctbal > 0
        )
        SELECT c_custkey FROM (
          SELECT c_custkey FROM with_orders
          EXCEPT ALL
          SELECT c_custkey FROM building
        )
        INTERSECT
        SELECT c_custkey FROM positive
        ORDER BY c_custkey""",
    "q_scalar_functions": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               length(p_name) AS name_len,
               substring(p_brand, 1, 5) AS brand_prefix,
               concat_ws('/', p_brand, p_type) AS brand_type,
               round(p_retailprice * 1.1, 2) AS marked_up,
               p_size % 7 AS size_mod7,
               CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class,
               abs(p_retailprice - 1000.0) AS dist_from_1000
        FROM part ORDER BY p_partkey""",
    "q_orders_by_month": """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1 ORDER BY 1""",
    "q_json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*) AS n,
               CAST(SUM(CAST("value" AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1 ORDER BY 1""",
    "q_running_totals": """
        SELECT user_id, event_id,
               row_number() OVER w AS event_idx,
               round(sum("value") OVER w, 6) AS running_value,
               lag(event_type, 1) OVER w AS prev_type
        FROM events
        WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""",
    "q_sessionize": """
        WITH flagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), sessions AS (
          SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM sessions GROUP BY user_id ORDER BY user_id""",
    # native session_window twin: strict > gap starts a new session
    "q_session_window": """
        WITH flagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), sessions AS (
          SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sessions GROUP BY user_id ORDER BY user_id""",
    "q_avg_order_gap": """
        WITH gaps AS (
          SELECT o_custkey,
                 date_diff('day', lag(o_orderdate) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS gap_days
          FROM orders
        )
        SELECT o_custkey, count(*) AS n_orders,
               round(CAST(sum(coalesce(gap_days, 0)) AS DOUBLE) / (count(*) - 1), 6)
                 AS avg_gap_days
        FROM gaps GROUP BY o_custkey HAVING count(*) >= 5
        ORDER BY o_custkey""",
}

QUERIES = {
    "q_event_time_windows": q_event_time_windows,
    "q_funnel": q_funnel,
    "q18_large_volume": q18_large_volume,
    "q_mode_event_type": q_mode_event_type,
    "q_moving_avg": q_moving_avg,
    "q_cohort_retention": q_cohort_retention,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q_top_customers_per_nation": q_top_customers_per_nation,
    "q_rollup_acctbal": q_rollup_acctbal,
    "q_set_ops": q_set_ops,
    "q_scalar_functions": q_scalar_functions,
    "q_orders_by_month": q_orders_by_month,
    "q_json_extract": q_json_extract,
    "q_running_totals": q_running_totals,
    "q_sessionize": q_sessionize,
    "q_session_window": q_session_window,
    "q_avg_order_gap": q_avg_order_gap,
}
