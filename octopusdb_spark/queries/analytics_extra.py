"""Analytic extras: the full ranking-window family, deterministic weighted
(probability-proportional-to-size) sampling, and higher-order array functions
over the embedding vectors.

These round out SURVEY.md §2 Part B capability rows (window functions beyond
row_number — the reference's only window analog is the version-dedup of A7,
`kv/lsm/iterator.go:314-319`; sampling mirrors the vlog-GC sampling idea of
A16, `kv/vlog_gc.go:262-346`, done deterministically; array HOFs are the
JVM-side vector path the similarity module builds on).

Determinism rules (common.py): every window orders by a unique tie-break;
uniform randomness is derived from md5 (same in both engines) — never
`rand()`/`df.sample()`; sequential `aggregate` keeps float reduction order
fixed.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from octopusdb_spark.queries.common import dsum, dsum_sql, t


def q_window_family(spark, sf_dir):
    """The ranking/navigation window family in one pass: row_number, ntile,
    percent_rank, cume_dist, lag, lead, first_value over each customer's
    order history. One shuffle on o_custkey serves all eight functions
    (single Window spec — Spark evaluates them in one sort)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.first("o_totalprice").over(w).alias("first_price"),
        )
        .orderBy("o_custkey", "rn")
    )


def q_weighted_sample(spark, sf_dir):
    """Deterministic PPS (probability-proportional-to-size) Bernoulli sample
    of orders: include each order with p = o_totalprice / max(o_totalprice),
    driven by an md5-derived uniform — reproducible on any engine, unlike
    rand(). Reports per-priority sample size, sampled revenue, and the
    Horvitz-Thompson estimate of total revenue (sum of w/p, which for PPS
    is n_sampled * max_weight — a useful self-check that the estimator
    tracks the true total)."""
    orders = t(spark, sf_dir, "orders")
    max_w = orders.agg(F.max("o_totalprice").alias("max_price"))
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    sampled = (
        orders.crossJoin(F.broadcast(max_w))
        .withColumn("p", F.col("o_totalprice") / F.col("max_price"))
        .filter(u < F.col("p"))
    )
    return (
        sampled.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_sampled"),
            dsum("o_totalprice", "sampled_revenue"),
            dsum(F.col("o_totalprice") / F.col("p"), "ht_total_estimate"),
        )
        .orderBy("o_orderpriority")
    )


def q_array_hof(spark, sf_dir):
    """Higher-order array functions over the embedding vectors, all
    JVM-side: size, positive-component count (filter), L2 norm
    (zip_with + sequential aggregate), mean component, max |x|
    (transform + array_max). The building blocks of every vector operator
    in the similarity module, verified element-for-element against
    DuckDB's list_* family."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    e = F.col("embedding")
    sq = F.zip_with(e, e, lambda x, y: x.cast("double") * y.cast("double"))
    ssum = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    esum = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.round(F.sqrt(ssum), 6).alias("l2_norm"),
        F.round(esum / F.size(e), 6).alias("mean_component"),
        F.round(
            F.array_max(F.transform(e, lambda x: F.abs(x.cast("double")))), 6
        ).alias("max_abs"),
    ).orderBy("vec_id")


ORACLES = {
    "q_window_family": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER w AS rn,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 9) AS pct_rank,
               round(cume_dist() OVER w, 9) AS cume,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               first_value(o_totalprice) OVER w AS first_price
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rn""",
    "q_weighted_sample": f"""
        WITH mx AS (SELECT max(o_totalprice) AS max_price FROM orders),
        sampled AS (
          SELECT o_orderpriority, o_totalprice,
                 o_totalprice / max_price AS p
          FROM orders, mx
          WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
                / 4294967296.0 < o_totalprice / max_price
        )
        SELECT o_orderpriority,
               count(*) AS n_sampled,
               {dsum_sql("o_totalprice", "sampled_revenue")},
               {dsum_sql("o_totalprice / p", "ht_total_estimate")}
        FROM sampled GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_array_hof": """
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
               round(sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (s, x) -> s + x)), 6) AS l2_norm,
               round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (s, x) -> s + x) / len(embedding), 6) AS mean_component,
               round(list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'), 6) AS max_abs
        FROM embeddings WHERE vec_id < 1000 ORDER BY vec_id""",
}

QUERIES = {
    "q_window_family": q_window_family,
    "q_weighted_sample": q_weighted_sample,
    "q_array_hof": q_array_hof,
}
