"""Additional TPC-H-shape queries over the trimmed driver schema.

The driver's star schema drops a few TPC-H columns (no partsupp, no
commit/receipt dates, no shipmode/container/phone), so each query keeps the
*plan shape* of its TPC-H namesake with predicates adapted to the columns
that exist (see TESTDATA.md). Like the rest of the relational surface these
exercise SURVEY.md §2 Part B capabilities (joins incl. semi/anti with
non-equi residuals, scalar subqueries, OR-of-conjuncts pushdown, correlated
aggregates) — capabilities the reference engine lacks entirely (closest
analogs: vlog deref join A15, graph self-join A23).

Scale notes: only *fixed-size* dimensions (nation=25 rows, region=5 rows,
1-row scalar aggregates) carry a forced `F.broadcast` hint. Customer,
supplier, and part scale linearly with SF (~15 B customer rows at the
100 TB design point), so their joins are left unhinted — AQE broadcasts
them at runtime when they fit, and shuffles them when they don't.
Fact-fact joins shuffle on the join key only; all sums are
decimal-accumulated for cross-engine determinism (common.py rules).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.queries.common import dsum, dsum_sql, t


def q2_min_cost_shape(spark, sf_dir):
    """TPC-H Q2 shape: minimum-cost supplier selection. The correlated
    MIN(ps_supplycost) subquery becomes a keyed window-min: without
    partsupp, a (part, supplier) unit cost is derived from lineitem as
    min(l_extendedprice / l_quantity) — the best unit price that supplier
    ever shipped that part at (DOUBLE division, IEEE-identical across
    engines; the min-equality filter compares a value against the min of
    the set it belongs to, so it is exact). Scope: 'STANDARD'-type parts
    of size < 10, suppliers of EUROPE nations. Output: the classic Q2
    columns that exist in this schema, ordered by supplier balance with a
    unique total tie-break, top 100.

    Plan: one fact shuffle (the (part, supplier) cost agg), supplier join
    left to AQE (SF-scaled), nation⋈region broadcast (fixed dims), one
    keyed window-min per part — no correlated re-scan, no self-join."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    cost = (
        li.groupBy(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    parts = part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    ).select("p_partkey", "p_brand", "p_size")
    eu_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    offers = (
        cost.join(parts, "p_partkey")
        .join(supp, "s_suppkey")
        .join(F.broadcast(eu_nations), supp.s_nationkey == F.col("n_nationkey"))
    )
    w_part = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("unit_cost").over(w_part))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: order-priority checking. EXISTS becomes a LEFT SEMI
    join with a non-equi residual (l_shipdate > o_orderdate stands in for
    commitdate < receiptdate, which the trimmed schema lacks)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: single-pass scan-agg with three pushable predicates — the
    canonical predicate-pushdown/column-pruning showcase (only 4 columns
    read, all filters reach the parquet scan)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship year.
    Two broadcast nation joins (supplier-side and customer-side aliases) +
    the symmetric pair predicate."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue on returned items
    (l_returnflag='R') in one quarter. Deterministic top-k: revenue DESC
    with c_custkey tie-break."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share in one month — conditional
    aggregation over the part join (part is SF-scaled, so the join strategy
    is left to AQE); two decimal-exact sums divided once at the end
    (deterministic double division)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0), "promo_rev"),
            dsum(disc_price, "total_rev"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue impact of small-quantity orders for one
    brand. The correlated per-part AVG subquery becomes a groupBy over the
    (brand-filtered) lineitem joined back on partkey — both sides already
    hashed on l_partkey, and the per-part averages are tiny so AQE
    broadcasts the join-back."""
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = t(spark, sf_dir, "lineitem")
    brand_li = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        brand_li.join(avg_qty, brand_li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-conjuncts over the part join (brand ×
    size-range × quantity-range disjuncts, adapted from the container/brand
    triples). Catalyst extracts the common l_partkey=p_partkey equi-key and
    keeps the disjunction as a join residual."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


def q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape: positive-balance customers with no orders, grouped
    by "country code" (last 2 digits of c_name — the trimmed schema has no
    phone). The scalar AVG subquery is a 1-row broadcast cross-join; the
    NOT EXISTS is a LEFT ANTI join (scoped to *recent* orders — in the
    synthetic data every customer has some order, so the classic
    no-orders-ever predicate returns nothing)."""
    cust = t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.expr("right(c_name, 2)")
    )
    codes = ["10", "11", "12", "13", "14", "15", "16"]
    in_codes = cust.filter(F.col("cntrycode").isin(codes))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        in_codes.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )


def q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution. LEFT OUTER join
    with an ON-clause filter (o_orderstatus <> 'F' stands in for the
    comment NOT LIKE predicate the trimmed schema lacks), double
    aggregation. Customers with zero qualifying orders land in the c_count
    = 0 bucket — the part an inner join would silently drop."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: top supplier by quarterly revenue — the revenue
    'view' is a grouped subquery, the winner is picked with an exact
    scalar-max equality (decimal-accumulated revenue, so the equality is
    reliable cross-engine; ties would all be returned, per spec)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.mx)
        .join(supp, supp.s_suppkey == revenue.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q21_waiting_shape(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who solely 'failed' a multi-supplier
    order — the EXISTS + NOT-EXISTS double over the same fact table.
    l_returnflag = 'R' stands in for late delivery (the trimmed schema has
    no commit/receipt dates). A returned line qualifies when another
    supplier participated in the order (left-semi with a <> residual) but
    no other supplier had a returned line there (left-anti with the same
    residual)."""
    li = t(spark, sf_dir, "lineitem")
    orders_f = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders_f, li.l_orderkey == orders_f.o_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    others_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_key"), F.col("l_suppkey").alias("r_supp")
    )
    waited = (
        l1.join(
            others,
            (l1.l_orderkey == others.o_key) & (l1.l_suppkey != others.o_supp),
            "left_semi",
        )
        .join(
            others_r,
            (l1.l_orderkey == others_r.r_key) & (l1.l_suppkey != others_r.r_supp),
            "left_anti",
        )
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        waited.join(supp, waited.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share — NATION_2's share of ECONOMY-
    part revenue sold to ASIA-region customers, by order year. The classic
    snowflake fan-out: fact scan + five dimension joins (part, orders-side
    customer→nation→region restricted to the region, supplier→nation for
    the share numerator); only the fixed-size nation-derived sides are
    hinted. Share = decimal-exact conditional sum /
    decimal-exact total, divided as doubles (IEEE-exact both engines)."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            dsum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(
                    0.0
                ),
                "nation_rev",
            ),
            dsum(F.col("volume"), "total_rev"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q9_profit_shape(spark, sf_dir):
    """TPC-H Q9 shape: product-type profit by nation and year. The trimmed
    schema has no partsupp, so supply cost is proxied deterministically as
    0.5 * p_retailprice per unit (keeps the 4-table join + two-level group
    shape; the real query's ps_supplycost is likewise a per-part scalar).
    Parts are filtered by name containment ('%bolt%'), as in the spec."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("bolt"))
        .select("p_partkey", "p_retailprice")
    )
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_volume_share_shape(spark, sf_dir):
    """TPC-H Q11 shape: per-nation supply volume with a global-total scalar
    subquery in the HAVING (nations whose volume exceeds 2% of world
    volume). The trimmed schema has no partsupp; volume is proxied by
    lineitem value routed through the supplier's nation — same two-level
    aggregate + scalar-threshold shape. The 1-row global total is a
    broadcast, never a shuffle."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    vol = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            (F.col("l_extendedprice") * F.col("l_quantity")).alias("v"),
        )
    )
    per_nation = vol.groupBy("n_name").agg(dsum(F.col("v"), "nation_volume"))
    total = per_nation.agg(
        F.sum(F.col("nation_volume").cast("decimal(38,6)")).cast("double").alias("world")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("nation_volume") > 0.02 * F.col("world"))
        .select("n_name", "nation_volume")
        .orderBy(F.desc("nation_volume"), "n_name")
    )


def q12_ship_lag_shape(spark, sf_dir):
    """TPC-H Q12 shape: shipping-delay effect on priority classes — the
    two-way conditional aggregation. The trimmed schema has no
    shipmode/commit/receipt dates, so the predicate is ship lag > 60 days
    after order date, and the output counts urgent (1-2) vs other
    priority lines per returnflag."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    lag_days = (
        F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    ) / F.lit(86_400_000_000)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(lag_days > 60)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_supplier_cnt_shape(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute group
    with an exclusion subquery. The trimmed schema has no partsupp (supply
    relationships come from lineitem) and no s_comment (the complaints
    anti-join keys on negative s_acctbal instead) — same shape: anti-join
    the supplier exclusion set, distinct-count suppliers per
    (brand, type, size), filtered to exclude one brand and one type. The
    exclusion set scales with SF, so the anti-join strategy is left to AQE;
    the distinct-count shuffle is keyed by the group columns."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            part.filter(
                (F.col("p_brand") != "Brand#2") & (F.col("p_type") != "ECONOMY")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_excess_shipping_shape(spark, sf_dir):
    """TPC-H Q20 shape: the semi-join chain part -> per-(part, supplier)
    quantity aggregate -> threshold -> suppliers -> nation filter. Without
    partsupp availqty, the threshold is a fixed floor on 1996 shipped
    quantity of 'small *' parts (> 60 units); the output is the qualifying
    suppliers of nations in region AMERICA, by name. Fixed-size dims
    (nation/region) broadcast; SF-scaled sides (small_parts, supplier) are
    left to AQE; the one fact shuffle is the (part, supplier) aggregate."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    small_parts = part.filter(F.col("p_name").startswith("small")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(small_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    amer_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            nation.n_regionkey == F.col("r_regionkey"),
            "left_semi",
        )
        .select("n_nationkey")
    )
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .join(
            F.broadcast(amer_nations),
            supp.s_nationkey == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


ORACLES = {
    "q2_min_cost_shape": """
        WITH cost AS (
          SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                 min(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY 1, 2
        ),
        parts AS (
          SELECT p_partkey, p_brand FROM part
          WHERE p_type = 'STANDARD' AND p_size < 10
        ),
        eu AS (
          SELECT n_nationkey, n_name
          FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ),
        offers AS (
          SELECT c.p_partkey, pa.p_brand, s.s_acctbal, s.s_name,
                 e.n_name, c.unit_cost,
                 min(c.unit_cost) OVER (PARTITION BY c.p_partkey) AS min_cost
          FROM cost c
          JOIN parts pa USING (p_partkey)
          JOIN supplier s USING (s_suppkey)
          JOIN eu e ON s.s_nationkey = e.n_nationkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               round(unit_cost, 6) AS unit_cost
        FROM offers WHERE unit_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""",
    "q16_supplier_cnt_shape": """
        WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
        pairs AS (
          SELECT l_partkey, l_suppkey FROM lineitem
          WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        )
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs JOIN part ON p_partkey = l_partkey
        WHERE p_brand != 'Brand#2' AND p_type != 'ECONOMY'
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q20_excess_shipping_shape": """
        WITH small_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
        shipped AS (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
            AND l_partkey IN (SELECT p_partkey FROM small_parts)
          GROUP BY l_partkey, l_suppkey
          HAVING sum(l_quantity) > 60
        ),
        amer AS (
          SELECT n_nationkey FROM nation
          WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'AMERICA')
        )
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM shipped)
          AND s_nationkey IN (SELECT n_nationkey FROM amer)
        ORDER BY s_name""",
    "q11_volume_share_shape": f"""
        WITH per_nation AS (
          SELECT n_name, {dsum_sql("l_extendedprice * l_quantity", "nation_volume")}
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT n_name, nation_volume
        FROM per_nation
        WHERE nation_volume > 0.02 * (
          SELECT CAST(SUM(CAST(nation_volume AS DECIMAL(38,6))) AS DOUBLE) FROM per_nation
        )
        ORDER BY nation_volume DESC, n_name""",
    "q12_ship_lag_shape": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE (epoch_us(l_shipdate) - epoch_us(o_orderdate)) / 86400000000.0 > 60
        GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q8_market_share": f"""
        WITH vol AS (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND EXISTS (
              SELECT 1 FROM nation n1 JOIN region ON n1.n_regionkey = r_regionkey
              WHERE r_name = 'ASIA' AND n1.n_nationkey = c_nationkey
            )
        )
        SELECT o_year,
               round(
                 CAST(SUM(CAST((CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END) AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE),
                 6) AS mkt_share
        FROM vol GROUP BY o_year ORDER BY o_year""",
    "q9_profit_shape": f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               {dsum_sql("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity", "sum_profit")}
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""",
    "q13_custdist": """
        WITH per_cust AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus <> 'F'
          GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""",
    "q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {dsum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey""",
    "q21_waiting_shape": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name""",
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q6_forecast_revenue": f"""
        SELECT {dsum_sql("l_extendedprice * l_discount", "revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""",
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q14_promo_effect": f"""
        WITH agg AS (
          SELECT
            {dsum_sql(
                "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) "
                "ELSE 0.0 END",
                "promo_rev",
            )},
            {dsum_sql("l_extendedprice * (1 - l_discount)", "total_rev")}
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-09-01'
            AND l_shipdate < TIMESTAMP '1996-10-01'
        )
        SELECT round(100.0 * promo_rev / total_rev, 6) AS promo_revenue_pct FROM agg""",
    "q17_small_quantity": """
        WITH brand_li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ), avg_qty AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty
          FROM brand_li GROUP BY l_partkey
        )
        SELECT round(
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0,
                 6) AS avg_yearly
        FROM brand_li b JOIN avg_qty a ON b.l_partkey = a.l_partkey
        WHERE b.l_quantity < 0.2 * a.avg_qty""",
    "q19_discounted_revenue": f"""
        SELECT {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)""",
    "q22_global_sales": f"""
        WITH in_codes AS (
          SELECT *, right(c_name, 2) AS cntrycode FROM customer
          WHERE right(c_name, 2) IN ('10','11','12','13','14','15','16')
        ), avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_bal
          FROM in_codes WHERE c_acctbal > 0.0
        )
        SELECT cntrycode, count(*) AS numcust, {dsum_sql("c_acctbal", "totacctbal")}
        FROM in_codes, avg_bal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-07-01')
        GROUP BY cntrycode ORDER BY cntrycode""",
}

QUERIES = {
    "q2_min_cost_shape": q2_min_cost_shape,
    "q16_supplier_cnt_shape": q16_supplier_cnt_shape,
    "q20_excess_shipping_shape": q20_excess_shipping_shape,
    "q8_market_share": q8_market_share,
    "q9_profit_shape": q9_profit_shape,
    "q11_volume_share_shape": q11_volume_share_shape,
    "q12_ship_lag_shape": q12_ship_lag_shape,
    "q13_custdist": q13_custdist,
    "q15_top_supplier": q15_top_supplier,
    "q21_waiting_shape": q21_waiting_shape,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q14_promo_effect": q14_promo_effect,
    "q17_small_quantity": q17_small_quantity,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales": q22_global_sales,
}
