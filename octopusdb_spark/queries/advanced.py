"""Advanced relational operators (SURVEY.md §2 Part B stretch surface):
as-of join, pivot, anti join, exact median, ordered string agg, cube,
decimal-exact correlation, and a vectorized Pandas-UDF stage.

Determinism strategy as elsewhere: integer/decimal math wherever an
aggregation crosses rows; the only float-function query (sigmoid UDF) rounds
to 6 decimals, far above cross-libm ulp differences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from octopusdb_spark.queries.common import dsum, dsum_sql, spread, t

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_asof_join(spark, sf_dir):
    """As-of join (Spark has no native one — composed from union + ordered
    window, the scale-correct pattern: one shuffle by user, no range
    explosion): for each purchase event, the most recent prior click of the
    same user."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("ts_us"), F.col("event_id").alias("eid"), F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("ts_us"), F.col("event_id").alias("eid"), F.lit(1).alias("kind")
    )
    # kind asc in the ordering makes a click at the same ts_us visible to the
    # purchase (click sorts first); eid breaks exact ties deterministically.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_eid",
        F.last(F.when(F.col("kind") == 0, F.col("eid")), ignorenulls=True).over(w),
    ).withColumn(
        "last_click_us",
        F.last(F.when(F.col("kind") == 0, F.col("ts_us")), ignorenulls=True).over(w),
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            F.col("eid").alias("purchase_id"),
            "user_id",
            F.col("last_click_eid").alias("prior_click_id"),
            ((F.col("ts_us") - F.col("last_click_us")) / F.lit(1_000_000)).alias("gap_sec"),
        )
        .orderBy("purchase_id")
    )


def q_pivot_event_types(spark, sf_dir):
    """Pivot: per-user event-type counts as columns (fixed pivot values so
    the schema is static — the scalable form; dynamic pivot needs a
    pre-pass)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


def q_anti_join(spark, sf_dir):
    """Anti join: parts never shipped at a deep (> 8%) discount."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


def q_semi_join(spark, sf_dir):
    """Semi join (EXISTS): suppliers with at least one max-quantity (>= 49)
    shipment — left_semi keeps the probe side only, so nothing from the big
    side is projected or duplicated (the shuffle carries just the join key)."""
    supp = t(spark, sf_dir, "supplier")
    bulk = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        supp.join(bulk, supp.s_suppkey == bulk.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


def q_median_quantity(spark, sf_dir):
    """Exact median per group without percentile interpolation ambiguity:
    middle-row(s) average via row_number — bit-identical in both engines
    (a mean of at most two doubles)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey", "l_linenumber")
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == (F.col("n") + 1) / 2)
        | (F.col("rn") == (F.col("n") + 2) / 2)
    )
    return (
        mid.groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double") / F.count("*")).alias(
                "median_qty"
            )
        )
        .orderBy("l_returnflag")
    )


def q_p95_disc(spark, sf_dir):
    """Exact discrete 95th percentile of extendedprice per returnflag —
    percentile_disc semantics made engine-exact: the value at rank
    ceil(0.95 * n) in sort order (an actual data value, no interpolation,
    so no float-accumulation ambiguity). One keyed window."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") == F.ceil(F.col("n") * 0.95))
        .select("l_returnflag", F.col("l_extendedprice").alias("p95_price"))
        .orderBy("l_returnflag")
    )


def q_string_agg(spark, sf_dir):
    """Ordered string aggregation: top-3 (by acctbal desc) customer names per
    nation, comma-joined — collect_list + array_sort keeps it deterministic."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    top = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
    return (
        top.groupBy("n_name")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "c_name"))),
                    lambda x: x["c_name"],
                ),
            ).alias("top_customers")
        )
        .orderBy("n_name")
    )


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the generalization cube/rollup compile to:
    per-status totals, per-priority totals, and the grand total in one pass
    (one shuffle keyed by grouping-set id), without the full cube's cross
    product."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority,
                  count(*) AS n_orders,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
           FROM _orders_gs
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""
    )


def q_cube_orders(spark, sf_dir):
    """CUBE aggregation over (status, priority): all grouping-set rollups."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


def q_correlation(spark, sf_dir):
    """Pearson correlation (price vs quantity per returnflag) from
    decimal-exact moment sums — order-independent, unlike F.corr's streaming
    accumulation."""
    li = t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(38,6)")
    moments = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(d("l_quantity")).cast("double").alias("sx"),
        F.sum(d("l_extendedprice")).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(38,6)"))
        .cast("double")
        .alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return moments.select("l_returnflag", F.round(corr, 6).alias("price_qty_corr")).orderBy(
        "l_returnflag"
    )


def q_pandas_udf_score(spark, sf_dir):
    """Pandas-UDF surface: sigmoid score over customer balances, aggregated
    per segment. Vectorized (Arrow-batched) — the sanctioned Python path,
    ~10-100× faster than row-at-a-time UDFs. Defined inside the function
    (pandas_udf needs an active session; closure ships by value to
    executors). Rounded well above cross-libm ulp noise."""

    @pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-v / 1000.0))

    cust = t(spark, sf_dir, "customer")
    scored = cust.select("c_mktsegment", F.round(sigmoid("c_acctbal"), 6).alias("score"))
    return (
        scored.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("score").cast("decimal(38,6)")).cast("double").alias("total_score"),
        )
        .orderBy("c_mktsegment")
    )


def q_pandas_udaf_trimmed_mean(spark, sf_dir):
    """Grouped-aggregate pandas UDF (the UDAF surface): 10% trimmed mean of
    order totals per priority — an aggregate the builtins can't express.
    Each group arrives as one Arrow-backed Series; sorting inside the UDF
    makes the float reduction order deterministic regardless of shuffle
    layout, and round(6) sits far above any cross-engine ulp drift. At
    scale this is one hash shuffle; groups must fit per-executor (true for
    any bounded-cardinality grouping)."""

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        import math

        s = v.sort_values().to_numpy()
        k = int(len(s) * 0.1)
        core = s[k : len(s) - k] if len(s) > 2 * k else s
        # math.fsum is exactly rounded — order-independent, and within one
        # ulp of the oracle's Kahan fsum(), far inside the round(6) margin
        return math.fsum(core) / len(core)

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # builtin count() can't share an agg with a grouped-map pandas UDF
        return len(v)

    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            n_rows("o_totalprice").alias("n_orders"),
            F.round(trimmed_mean("o_totalprice"), 6).alias("trimmed_mean_price"),
        )
        .orderBy("o_orderpriority")
    )


def q_rollup_merge(spark, sf_dir):
    """Incremental-view-maintenance equivalence under the hash gate: the
    events table is split into 3 deterministic batches (event_id mod 3) and
    merged through ContinuousRollup — partial aggregate per batch, decimal
    merge by (bucket, grp), atomic snapshot per merge — and the resulting
    materialized table must hash-match the oracle's ONE-SHOT aggregate of
    the same rows. Decimal accumulation is what makes the merge order
    irrelevant; this query makes that claim falsifiable."""
    import os
    import shutil
    import tempfile

    from octopusdb_spark.streaming.rollup import ContinuousRollup

    # scratch stores live under one parent, each dir tagged with the pid
    # that created it; the sweep removes only dirs whose owning process is
    # DEAD. A live process may still hold lazy DataFrames over its earlier
    # stores (long session, concurrent bench + plan audit), so age alone is
    # never grounds for deletion.
    parent = os.path.join(tempfile.gettempdir(), "octopusdb-rollupq")
    os.makedirs(parent, exist_ok=True)
    for entry in os.listdir(parent):
        if not entry.startswith("pid"):
            continue
        pid_str = entry[3:].split("-", 1)[0]
        try:
            os.kill(int(pid_str), 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
        except (ValueError, PermissionError, OSError):
            pass  # unparseable tag or someone else's live pid: leave it

    ev = t(spark, sf_dir, "events")
    roll = ContinuousRollup(
        spark,
        tempfile.mkdtemp(prefix=f"pid{os.getpid()}-", dir=parent),
        bucket_seconds=3600,
    )
    for i in range(3):
        roll.merge_batch(
            ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i),
            ts_us_col="ts_us",
            group_col="event_type",
            value_col="value",
        )
    return (
        roll.table()
        .select(
            "bucket",
            "grp",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
            "min_value",
            "max_value",
        )
        .orderBy("bucket", "grp")
    )


def q_approx_distinct(spark, sf_dir):
    """Approximate distinct (HLL++) validated against the exact count. The
    sketch value itself is engine-specific, so the oracle-checked output is
    the exact count plus a ``within_5pct`` accuracy bound — the oracle
    asserts TRUE, making HLL++ drift a hard hash mismatch instead of a
    rows-only shrug."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


CM_DEPTH, CM_WIDTH = 4, 1024


def _cm_buckets(hx):
    """The four depth buckets from ONE md5 digest: depth d reads the
    3-hex-char slice at position 1+8d (disjoint slices of the same digest
    = four independent hashes, one md5 per token instead of four),
    interpreted as an integer mod the sketch width. Pure string
    arithmetic so DuckDB computes the IDENTICAL buckets — the whole
    sketch is exact-value checkable, not just bound-asserted. Catalyst's
    CollapseProject DOES inline ``hx`` into all 12 subexpressions
    (a prior select doesn't stop it); what keeps this one-md5-per-token
    at runtime is codegen common-subexpression elimination over the
    identical md5 calls, so the prior select is for readability only."""

    def hv(pos):
        return F.instr(
            F.lit("0123456789abcdef"), F.substring(hx, pos, 1)
        ) - 1

    return F.array(
        *[
            (hv(1 + 8 * d) * 256 + hv(2 + 8 * d) * 16 + hv(3 + 8 * d)) % CM_WIDTH
            for d in range(CM_DEPTH)
        ]
    )


def q_countmin_sketch(spark, sf_dir):
    """Count-min sketch heavy hitters — the reference's TinyLFU admission
    sketch (`kv/utils/cache/cmsketch.go`) promoted from a cache-internal
    frequency estimator to a first-class distributed operator: token
    frequencies over the whole corpus are summarized into a FIXED-SIZE
    d x w counter table (4 x 1024 rows regardless of corpus size — one
    groupBy, mergeable partials, the one-pass 100 TB shape), and the
    exact top-15 tokens are then estimated from the sketch alone
    (min over d depths of the bucket counters, the CM estimate).

    The bucket hashes are md5-derived string arithmetic both engines
    share — ONE md5 per token, with the four depths reading four disjoint
    3-hex-char slices of the digest (four independent hashes for one hash
    evaluation) — so the oracle rebuilds the IDENTICAL sketch and the row
    is exact-value checked end-to-end: estimates, and the CM guarantee
    est >= exact, are hashed — not reduced to a within-bound boolean
    (contrast q_approx_distinct, where the HLL sketch is engine-internal).
    At 100 TB the sketch relation is 4096 rows no matter the data, so the
    estimate join broadcasts a constant-size table."""
    # spread + lazy checkpoint (r16, guide §2.5/§1.2): the token explode
    # feeds BOTH the exact counts and the sketch pass — spread
    # parallelizes it off the single input split, the checkpoint runs it
    # once instead of per consumer (measured 1.34 s -> 1.04 s warm,
    # ~8 s -> 1.6 s cold)
    toks = (
        spread(t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .localCheckpoint(eager=False)
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    top = counts.orderBy(F.desc("exact_cnt"), "tok").limit(15)

    sketch = (
        toks.select(F.md5("tok").alias("hx"))
        .select(F.posexplode(_cm_buckets(F.col("hx"))).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probes = (
        top.select("tok", "exact_cnt", F.md5("tok").alias("hx"))
        .select(
            "tok",
            "exact_cnt",
            F.posexplode(_cm_buckets(F.col("hx"))).alias("d", "bucket"),
        )
    )
    return (
        probes.join(sketch, ["d", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cm_est"))
        .select(
            "tok",
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("exact_cnt")).alias("overestimate"),
            (F.col("cm_est") >= F.col("exact_cnt")).alias("never_undercounts"),
        )
        .orderBy("tok")
    )


HLL_M = 256  # registers (b=8: first two md5 hex chars)
HLL_RHO_CAP = 40  # register ceiling: keeps 2^(CAP-reg) exact in BIGINT


def q_hll_sketch(spark, sf_dir):
    """HyperLogLog distinct-count sketch as a first-class distributed
    operator — the cardinality companion to `q_countmin_sketch`
    (frequency) and the transparent twin of `q_approx_distinct` (where
    the HLL lives inside the engine and only a bound is checkable; here
    the sketch IS the output, exact-value checked register by register).

    md5-derived string arithmetic both engines share: bucket = the first
    two hex chars (m=256 registers), rho = 1 + leading zero BITS of the
    remaining 30 hex chars (4 per leading '0' nibble + a CASE on the
    first non-zero digit), capped at HLL_RHO_CAP so the harmonic term
    2^(CAP - reg) stays an exact BIGINT and the Flajolet et al. estimate
    alpha_m * m^2 / Z is a deterministic double computed from exact
    integers — no float-accumulation drift, so the estimate itself is
    hashed, not bound-asserted. The 256-register table is pinned whole
    by an order-checksummed digest; the linear-counting small-range
    correction (est <= 2.5m with empty registers) rides the same exact
    inputs (branch exercised by a crafted-corpus test; the sf corpus
    takes the raw branch). One pass, mergeable max-partials, constant
    256-row state regardless of corpus size — the 100 TB cardinality
    shape."""
    # r17 (VERDICT r16 #1): the r16 spread + lazy-checkpoint treatment is
    # REVERTED here — fresh-session single-shot A/B (the driver's
    # methodology; n=6 interleaved) medians: r15 shape 4.52 s, spread-only
    # 5.03 s, checkpoint-only 4.88 s, both 5.38 s. The checkpoint's first
    # materialization stores the full token frame in the block manager,
    # which a run-once query pays in full and never amortizes; warm reps
    # are flat (±0.1 s), so the r16 warm A/B had measured the wrong
    # regime. q_countmin_sketch KEEPS its treatment: its sketch pass
    # (md5 + 4-way posexplode) makes recomputing the explode twice
    # genuinely more expensive — single-shot A/B r15 4.59 vs current
    # 4.69 s (flat, kept on the shared-work argument).
    toks = hll_tokens(t(spark, sf_dir, "documents"))
    regs = hll_parts(toks).groupBy("bucket").agg(F.max("rho").alias("reg"))
    exact = toks.agg(F.countDistinct("tok").alias("exact_distinct"))
    return hll_report(spark, regs, exact)


def hll_tokens(docs):
    """The shared token expression (same split as q_countmin_sketch)."""
    return docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)


def hll_parts(toks):
    """(bucket, rho) per token occurrence — pure md5 string arithmetic,
    stateless (streams unchanged under Structured Streaming). Shared by
    the batch row and its streaming twin so the sketch rule is defined
    once."""
    rho = F.least(
        F.lit(HLL_RHO_CAP),
        F.col("zp") * 4
        + F.when(F.col("d1") == "1", 3)
        .when(F.col("d1").isin("2", "3"), 2)
        .when(F.col("d1").isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + 1,
    )
    return (
        toks.select(F.md5("tok").alias("hx"))
        .select(
            (
                (F.instr(F.lit("0123456789abcdef"), F.substring("hx", 1, 1)) - 1)
                * 16
                + (F.instr(F.lit("0123456789abcdef"), F.substring("hx", 2, 1)) - 1)
            ).alias("bucket"),
            F.substring("hx", 3, 30).alias("sfx"),
        )
        .select(
            "bucket",
            "sfx",
            (
                F.length("sfx")
                - F.length(F.expr("trim(LEADING '0' FROM sfx)"))
            ).alias("zp"),
        )
        .select(
            "bucket",
            "zp",
            F.expr("substring(sfx, zp + 1, 1)").alias("d1"),
        )
        .select("bucket", rho.alias("rho"))
    )


def hll_report(spark, regs, exact):
    """Fold a (possibly sparse) register frame + a 1-row exact frame into
    the checked single-row report: spine-filled registers, exact-BIGINT
    harmonic numerator, order-checksummed register digest, and the
    Flajolet et al. estimate with linear-counting correction — one
    deterministic double expression, shared verbatim with the oracle."""
    spine = spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
    full = spine.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("reg", F.lit(0)).cast("int").alias("reg")
    )
    summary = full.agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("reg")).cast("long")
        ).alias("s_num"),
        F.sum((F.col("reg") == 0).cast("long")).alias("zero_registers"),
        F.sum("reg").cast("long").alias("register_sum"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "reg"))),
                    lambda s: s["reg"].cast("string"),
                ),
            ).cast("binary")
        ).alias("register_checksum"),
    )
    # alpha_m * m^2 * 2^CAP / S — exact integers in, one double out
    raw = (
        F.lit(0.7213 / (1.0 + 1.079 / 256.0))
        * F.lit(256.0 * 256.0)
        * F.lit(float(2 ** HLL_RHO_CAP))
        / F.col("s_num").cast("double")
    )
    # ln() is the one non-exact float op in the chain (JVM Math.log and
    # DuckDB's libm differ in the last ULP for 18 of the 255 reachable
    # inputs) — but the checked value is round(x, 6), and the full input
    # domain 256/V, V in 1..255 is verified round-6-identical across
    # engines (pinned in test_hll_linear_counting_ln_domain)
    corrected = F.when(
        (raw <= F.lit(2.5 * 256.0)) & (F.col("zero_registers") > 0),
        F.lit(256.0) * F.log(F.lit(256.0) / F.col("zero_registers").cast("double")),
    ).otherwise(raw)
    return (
        summary.crossJoin(exact)  # two 1-row frames
        .select(
            F.lit(HLL_M).alias("m"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(raw, 6).alias("raw_est_r6"),
            F.round(corrected, 6).alias("hll_est_r6"),
            "zero_registers",
            "register_sum",
            "register_checksum",
        )
    )


def q_approx_percentile(spark, sf_dir):
    """Approximate percentiles (the mergeable KLL-style sketch behind
    ``approx_percentile``) validated against exact rank-based quantiles —
    the q_approx_distinct pattern for order statistics. The exact p-quantile
    is the value at rank ceil(p*n) under a total order (no interpolation, so
    both engines compute the identical double); the sketch estimate itself
    is engine-specific and is reduced to a within-bound boolean the oracle
    asserts TRUE. At 100 TB the sketch is the only viable path (one pass,
    mergeable partials); this query pins how far it strays."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    exact = (
        ranked.filter(
            (F.col("rn") == F.ceil(F.col("n") * 0.5))
            | (F.col("rn") == F.ceil(F.col("n") * 0.95))
        )
        .groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("l_extendedprice"))
            ).alias("p50_exact"),
            F.min(
                F.when(F.col("rn") == F.ceil(F.col("n") * 0.95), F.col("l_extendedprice"))
            ).alias("p95_exact"),
        )
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("a95"),
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("p50_exact", 6).alias("p50_exact"),
            F.round("p95_exact", 6).alias("p95_exact"),
            (F.abs(F.col("a50") - F.col("p50_exact")) / F.col("p50_exact") <= 0.05).alias(
                "p50_within_5pct"
            ),
            (F.abs(F.col("a95") - F.col("p95_exact")) / F.col("p95_exact") <= 0.05).alias(
                "p95_within_5pct"
            ),
        )
        .orderBy("l_returnflag")
    )


_PIVOT_COLS = ", ".join(
    f'count(*) FILTER (WHERE event_type = \'{et}\') AS "{et}"' for et in EVENT_TYPES
)

def q_time_gapfill(spark, sf_dir):
    """Hypertable gap-fill + LOCF: per (event_type, day) activity where
    MISSING days are materialized as zero-count rows (generate the full
    bucket range once, explode, left-join the aggregates) and the rolling
    average value carries the last observation forward across gaps — the
    time_bucket_gapfill/locf pair of a time-series store. Scale: the dense
    bucket axis is (days x types) — tiny metadata — so the only real
    shuffle is the aggregation; gap filling is a broadcast join against
    the generated axis."""
    ev = t(spark, sf_dir, "events")
    day = F.expr("ts_us div 86400000000").cast("long")  # µs → days since epoch
    agg = ev.groupBy(day.alias("day"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_value"),  # decimal-accumulated: order-independent
    )
    bounds = ev.select(
        F.expr("min(ts_us div 86400000000)").cast("long").alias("lo"),
        F.expr("max(ts_us div 86400000000)").cast("long").alias("hi"),
    )
    axis = (
        bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
        .crossJoin(
            t(spark, sf_dir, "events").select("event_type").distinct()
        )
    )
    filled = (
        F.broadcast(axis)
        .join(agg, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "avg_value",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filled.withColumn(
            "avg_value_locf", F.last("avg_value", ignorenulls=True).over(w)
        )
        .select("day", "event_type", "n_events", "avg_value_locf")
        .orderBy("day", "event_type")
    )


def q_time_rollup(spark, sf_dir):
    """Time-hierarchy ROLLUP (year -> quarter -> month) over order totals —
    the hypertable/continuous-aggregate shape: one pass computes every
    granularity plus the grand total, instead of three separate aggs. At
    scale ROLLUP expands map-side (one shuffle keyed by grouping-set id)."""
    o = t(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return (
        o.select(
            F.year(ts).alias("yr"),
            F.quarter(ts).alias("qtr"),
            F.month(ts).alias("mon"),
            "o_totalprice",
        )
        .rollup("yr", "qtr", "mon")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price"))
        .orderBy(
            F.col("yr").asc_nulls_first(),
            F.col("qtr").asc_nulls_first(),
            F.col("mon").asc_nulls_first(),
        )
    )


def q_linear_regression(spark, sf_dir):
    """OLS slope/intercept of extendedprice on quantity per returnflag,
    assembled from decimal-exact moment sums (n, Σx, Σy, Σxx, Σxy) instead
    of the engines' regr_slope (whose float accumulation order differs).
    The closed form runs on exact sums, so both engines agree bit-for-bit.
    One partial-aggregable groupBy — the same shuffle as any scan-agg."""
    li = t(spark, sf_dir, "lineitem")
    d = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(d(x)).cast("double").alias("sx"),
        F.sum(d(y)).cast("double").alias("sy"),
        F.sum(d(x * y)).cast("double").alias("sxy"),
        F.sum(d(x * x)).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        agg.withColumn("slope", slope)
        .select(
            "l_returnflag",
            F.round("slope", 9).alias("slope"),
            F.round((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"), 9).alias(
                "intercept"
            ),
        )
        .orderBy("l_returnflag")
    )


ORACLES = {
    "q_time_rollup": f"""
        SELECT year(o_orderdate) AS yr,
               quarter(o_orderdate) AS qtr,
               month(o_orderdate) AS mon,
               count(*) AS n_orders,
               {dsum_sql("o_totalprice", "total_price")}
        FROM orders
        GROUP BY ROLLUP (yr, qtr, mon)
        ORDER BY yr NULLS FIRST, qtr NULLS FIRST, mon NULLS FIRST""",
    "q_pandas_udaf_trimmed_mean": """
        WITH ranked AS (
          SELECT o_orderpriority, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
                 count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
        )
        SELECT o_orderpriority,
               max(n) AS n_orders,
               round(fsum(CASE WHEN rn > CAST(FLOOR(n * 0.1) AS BIGINT)
                                AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
                          THEN o_totalprice END)
                     / (max(n) - 2 * CAST(FLOOR(max(n) * 0.1) AS BIGINT)), 6) AS trimmed_mean_price
        FROM ranked
        GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q_p95_disc": """
        WITH ranked AS (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem
        )
        SELECT l_returnflag, l_extendedprice AS p95_price
        FROM ranked WHERE rn = CAST(ceil(n * 0.95) AS BIGINT)
        ORDER BY l_returnflag""",
    "q_semi_join": """
        SELECT s_suppkey, s_name, s_nationkey
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
        ORDER BY s_suppkey""",
    "q_linear_regression": """
        WITH m AS (
          SELECT l_returnflag,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx
          FROM lineitem GROUP BY l_returnflag
        ), s AS (
          SELECT l_returnflag, n, sx, sy,
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
          FROM m
        )
        SELECT l_returnflag,
               round(slope, 9) AS slope,
               round((sy - slope * sx) / n, 9) AS intercept
        FROM s ORDER BY l_returnflag""",
    "q_asof_join": """
        WITH tagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id AS eid,
                 CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
          FROM events WHERE event_type IN ('click', 'purchase')
        ), windowed AS (
          SELECT *,
                 last_value(CASE WHEN kind = 0 THEN eid END IGNORE NULLS)
                   OVER w AS last_click_eid,
                 last_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS)
                   OVER w AS last_click_us
          FROM tagged
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, kind, eid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT eid AS purchase_id, user_id, last_click_eid AS prior_click_id,
               (ts_us - last_click_us) / 1000000 AS gap_sec
        FROM windowed WHERE kind = 1 ORDER BY purchase_id""",
    "q_pivot_event_types": f"""
        SELECT user_id, {_PIVOT_COLS}
        FROM events GROUP BY user_id ORDER BY user_id""",
    "q_anti_join": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.08)
        ORDER BY p_partkey""",
    "q_median_quantity": """
        WITH ranked AS (
          SELECT l_returnflag, l_quantity,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem
        )
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS median_qty
        FROM ranked
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_string_agg": """
        WITH top AS (
          SELECT n_name, c_name,
                 row_number() OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, string_agg(c_name, ',' ORDER BY rk) AS top_customers
        FROM top WHERE rk <= 3 GROUP BY n_name ORDER BY n_name""",
    "q_cube_orders": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q_correlation": """
        WITH m AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               round((n * sxy - sx * sy) /
                     (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
                 AS price_qty_corr
        FROM m ORDER BY l_returnflag""",
    "q_pandas_udf_score": """
        SELECT c_mktsegment, count(*) AS n,
               CAST(SUM(CAST(round(1.0 / (1.0 + exp(-c_acctbal / 1000.0)), 6)
                    AS DECIMAL(38,6))) AS DOUBLE) AS total_score
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_time_gapfill": """
        WITH agg AS (
          SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                 count(*) AS n_events,
                 round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*), 6) AS avg_value
          FROM events GROUP BY 1, 2
        ),
        bounds AS (
          SELECT min(epoch_us(ts) // 86400000000) AS lo,
                 max(epoch_us(ts) // 86400000000) AS hi
          FROM events
        ),
        axis AS (
          SELECT d.day, et.event_type
          FROM (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds) d,
               (SELECT DISTINCT event_type FROM events) et
        ),
        filled AS (
          SELECT axis.day, axis.event_type,
                 CAST(coalesce(n_events, 0) AS BIGINT) AS n_events, avg_value
          FROM axis LEFT JOIN agg
            ON agg.day = axis.day AND agg.event_type = axis.event_type
        )
        SELECT day, event_type, n_events,
               last_value(avg_value IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_locf
        FROM filled ORDER BY day, event_type""",
    # one-shot aggregate twin of the 3-batch incremental merge
    "q_rollup_merge": """
        SELECT (epoch_us(ts) // 1000000) // 3600 * 3600 AS bucket,
               event_type AS grp,
               count(*) AS n_events,
               round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
                 AS total_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2 ORDER BY bucket, grp""",
    # the oracle pins the exact counts and asserts the HLL++ estimate landed
    # within 5% — the accuracy bound is the checked value, not the sketch
    # exact-value replication of the count-min sketch: same md5-derived
    # bucket hash, same d x w counter table, same min-over-depths estimate
    # HLL rebuilt register-for-register from the same md5 string
    # arithmetic; harmonic term via exact BIGINT powers, estimate as one
    # double expression shared verbatim with the Spark side
    "q_hll_sketch": """
        WITH toks AS (
          SELECT t.tok FROM documents,
               unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
          WHERE length(t.tok) > 0
        ),
        parts AS (
          SELECT
            (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS bucket,
            substr(md5(tok), 3, 30) AS sfx
          FROM toks
        ),
        zps AS (
          SELECT bucket, sfx,
                 length(sfx) - length(trim(LEADING '0' FROM sfx)) AS zp
          FROM parts
        ),
        rhos AS (
          SELECT bucket,
                 least(40, zp * 4 + CASE substr(sfx, CAST(zp + 1 AS INT), 1)
                     WHEN '1' THEN 3
                     WHEN '2' THEN 2 WHEN '3' THEN 2
                     WHEN '4' THEN 1 WHEN '5' THEN 1
                     WHEN '6' THEN 1 WHEN '7' THEN 1
                     ELSE 0 END + 1) AS rho
          FROM zps
        ),
        regs AS (SELECT bucket, max(rho) AS reg FROM rhos GROUP BY bucket),
        filled AS (
          SELECT r.range AS bucket, coalesce(g.reg, 0) AS reg
          FROM range(0, 256) r LEFT JOIN regs g ON g.bucket = r.range
        ),
        summary AS (
          SELECT CAST(sum(CAST(power(2.0, 40 - reg) AS BIGINT)) AS BIGINT)
                   AS s_num,
                 CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zero_registers,
                 CAST(sum(reg) AS BIGINT) AS register_sum,
                 md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY bucket))
                   AS register_checksum
          FROM filled
        ),
        exact AS (
          SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
          FROM toks
        )
        SELECT CAST(256 AS INT) AS m, exact_distinct,
               round(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
                     * 1099511627776.0 / CAST(s_num AS DOUBLE), 6)
                 AS raw_est_r6,
               round(CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
                                * 1099511627776.0 / CAST(s_num AS DOUBLE))
                               <= 640.0
                           AND zero_registers > 0
                     THEN 256.0 * ln(256.0 / CAST(zero_registers AS DOUBLE))
                     ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
                          * 1099511627776.0 / CAST(s_num AS DOUBLE) END, 6)
                 AS hll_est_r6,
               zero_registers, register_sum, register_checksum
        FROM summary, exact""",
    "q_countmin_sketch": """
        WITH toks AS (
          SELECT t.tok FROM documents,
               unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
          WHERE length(t.tok) > 0
        ),
        counts AS (SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY tok),
        top AS (SELECT * FROM counts ORDER BY exact_cnt DESC, tok LIMIT 15),
        expanded AS (
          SELECT x.tok, d.d,
                 ((strpos('0123456789abcdef',
                          substr(md5(x.tok), CAST(1 + 8 * d.d AS INT), 1)) - 1) * 256
                + (strpos('0123456789abcdef',
                          substr(md5(x.tok), CAST(2 + 8 * d.d AS INT), 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                          substr(md5(x.tok), CAST(3 + 8 * d.d AS INT), 1)) - 1)
                 ) % 1024 AS bucket
          FROM toks x CROSS JOIN range(0, 4) d(d)
        ),
        sketch AS (
          SELECT d, bucket, count(*) AS cnt FROM expanded GROUP BY d, bucket
        ),
        probes AS (
          SELECT t.tok, t.exact_cnt, e.d, e.bucket
          FROM top t JOIN (SELECT DISTINCT tok, d, bucket FROM expanded) e
            ON e.tok = t.tok
        )
        SELECT p.tok,
               CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
               CAST(min(s.cnt) AS BIGINT) AS cm_est,
               CAST(min(s.cnt) - p.exact_cnt AS BIGINT) AS overestimate,
               min(s.cnt) >= p.exact_cnt AS never_undercounts
        FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
        GROUP BY p.tok, p.exact_cnt ORDER BY p.tok""",
    "q_approx_distinct": """
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS within_5pct
        FROM events GROUP BY event_type ORDER BY event_type""",
    # same pattern for order statistics: exact rank-based quantiles pinned,
    # the sketch estimate reduced to an asserted accuracy bound
    "q_approx_percentile": """
        WITH ranked AS (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem
        )
        SELECT l_returnflag,
               round(min(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                              THEN l_extendedprice END), 6) AS p50_exact,
               round(min(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                              THEN l_extendedprice END), 6) AS p95_exact,
               TRUE AS p50_within_5pct,
               TRUE AS p95_within_5pct
        FROM ranked
        WHERE rn = CAST(ceil(n * 0.5) AS BIGINT) OR rn = CAST(ceil(n * 0.95) AS BIGINT)
        GROUP BY l_returnflag ORDER BY l_returnflag""",
}

QUERIES = {
    "q_asof_join": q_asof_join,
    "q_pivot_event_types": q_pivot_event_types,
    "q_anti_join": q_anti_join,
    "q_median_quantity": q_median_quantity,
    "q_p95_disc": q_p95_disc,
    "q_string_agg": q_string_agg,
    "q_cube_orders": q_cube_orders,
    "q_grouping_sets": q_grouping_sets,
    "q_correlation": q_correlation,
    "q_pandas_udf_score": q_pandas_udf_score,
    "q_approx_distinct": q_approx_distinct,  # oracle checks the 5% HLL bound
    "q_countmin_sketch": q_countmin_sketch,  # exact-value sketch replication
    "q_hll_sketch": q_hll_sketch,  # exact-value HLL registers + estimate
    "q_approx_percentile": q_approx_percentile,  # oracle checks the 5% sketch bound
    "q_rollup_merge": q_rollup_merge,
    "q_linear_regression": q_linear_regression,
    "q_time_rollup": q_time_rollup,
    "q_time_gapfill": q_time_gapfill,
    "q_semi_join": q_semi_join,
    "q_pandas_udaf_trimmed_mean": q_pandas_udaf_trimmed_mean,
}
