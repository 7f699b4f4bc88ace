"""Scale-pattern operators: the join/sampling shapes that keep a 100 TB
cluster job off its worst-case plan, each verified against a DuckDB oracle
that computes the same answer the naive way.

The reference engine never needs these (single-node, `kv/db.go`), but any
large-scale pipeline over this engine's tables does:

- **Bucketed range join** — Spark has no range-join optimization, so a plain
  `ON ship >= start AND ship < end` predicate compiles to a broadcast/
  cartesian nested-loop join: O(n*m) comparisons. Bucketing both sides by a
  bucket the width of the range turns it into an equi-join (each range spans
  at most 2 buckets) + a residual filter: O(n+m) shuffle, then only
  bucket-local comparisons.
- **Salted skew join** — a hot key floods one reducer in a hash join.
  Salting the fact side (deterministic hash % SALTS) and exploding the dim
  side SALTS-fold spreads each hot key over SALTS reducers. AQE's skew-join
  handles moderate skew at runtime; salting is the explicit form that also
  works for aggregations.
- **Hash sampling** — `df.sample()` is nondeterministic across runs and
  engines; hashing a stable row id and keeping one hex bucket gives a
  deterministic, reproducible 1/16 sample that any engine agrees on —
  the only sane way to sample a 100 TB table for profiling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.queries.common import dsum, dsum_sql, t

WEEK_US = 7 * 86_400 * 1_000_000  # range width == bucket width, microseconds
SALTS = 16


def q_range_join_bucketed(spark, sf_dir):
    """For a deterministic 1% order sample: how many lineitems (any order)
    shipped within 7 days of the order date, and their total value. The
    range join runs as bucket-equi-join + residual filter, not a nested
    loop."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select(
            "o_orderkey",
            # parquet NTZ -> timestamp is exact (session tz pinned to UTC)
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("start_us"),
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) + F.lit(WEEK_US)).alias(
                "end_us"
            ),
        )
    )
    # a [start, start+W) window overlaps at most 2 W-wide buckets
    ob = o.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("start_us") / WEEK_US),
                F.floor((F.col("end_us") - 1) / WEEK_US),
            )
        ),
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
        "l_extendedprice",
    )
    lb = li.withColumn("bucket", F.floor(F.col("ship_us") / WEEK_US))
    return (
        ob.join(lb, "bucket")
        .filter((F.col("ship_us") >= F.col("start_us")) & (F.col("ship_us") < F.col("end_us")))
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_shipped"),
            dsum("l_extendedprice", "shipped_value"),
        )
        .orderBy("o_orderkey")
    )


def q_skew_salted_join(spark, sf_dir):
    """Events joined to their customer's nation with an explicit salt:
    events carry salt = event_id % SALTS, the (small) customer side is
    exploded SALTS-fold, and the join key is (custkey, salt). Result is
    identical to the unsalted join the oracle runs — salting changes the
    shuffle layout, never the answer."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "value", (F.col("event_id") % SALTS).alias("salt")
    )
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(SALTS)])))
    )
    return (
        ev.join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .orderBy("c_nationkey")
    )


def q_hash_sampled_stats(spark, sf_dir):
    """Profile stats over a deterministic 1/16 sample: rows whose
    md5(orderkey-linenumber) starts with '0'. Reproducible on any engine,
    any run, any partitioning — unlike rand()/TABLESAMPLE."""
    li = t(spark, sf_dir, "lineitem")
    rid = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return (
        li.filter(F.md5(rid.cast("binary")).startswith("0"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy("l_returnflag")
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample: exactly 20 orders per priority
    class, chosen by md5-hash order — balanced profiling input regardless
    of class skew (a plain hash sample under-represents rare strata). One
    keyed window; at scale the per-class top-20 is a partial top-k."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    hid = F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    w = Window.partitionBy("o_orderpriority").orderBy(hid.asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("o_orderpriority", F.col("rn").alias("sample_rank"), "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "sample_rank")
    )


def q_source_balanced_sample(spark, sf_dir):
    """Source-mixture rebalancing — the downsample step that equalizes a
    training corpus across sources: every source contributes exactly
    min-source-count documents, chosen deterministically by md5-hash order
    (so regeneration keeps the same sample). Plan: a 1-row global min
    (broadcast) + one per-source top-k window — WindowGroupLimit pushes the
    rank<=k cut into each partition before the shuffle, so skewed sources
    never sort their full bulk. The general weighted-mixture case is this
    same plan with a per-source target joined in place of the scalar."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count("*").alias("n"))
    target = per_source.agg(F.min("n").alias("take"))
    hid = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("source").orderBy(hid.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(target))
        .filter(F.col("rn") <= F.col("take"))
        .select("source", F.col("rn").alias("sample_rank"), "doc_id", "lang")
        .orderBy("source", "sample_rank")
    )


def q_train_val_split(spark, sf_dir):
    """Deterministic train/val/test assignment + stratification audit —
    the split step of a training pipeline done content-stably: bucket =
    md5(doc_id) mod 100, train < 80, val < 90, test otherwise. Hash
    assignment (never rand()) means the split is reproducible across
    reruns, engines, and repartitioning, documents never migrate between
    splits as the corpus grows, and train/test disjointness is by
    construction. The audit reports, per (source, split), the document
    count, token mass, and the split's exact fraction of its source — the
    check that hashing didn't skew any stratum. One scan + one small
    keyed agg; at 100 TB the split column is a free projection."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    ).alias("split")
    per = (
        docs.select("source", split, F.size(F.split("text", " ")).alias("toks"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("toks").cast("long")).alias("total_tokens"),
        )
    )
    w_src = Window.partitionBy("source")
    return per.select(
        "source",
        "split",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_src), 6
        ).alias("frac_of_source"),
    ).orderBy("source", "split")


TOKEN_BUDGET = 4096  # whitespace tokens per training shard
PACK_BUCKET = 500  # fixed doc_id range per bucket (deterministic boundaries)


def q_token_budget_packing(spark, sf_dir):
    """Token-budget shard packing — assign documents (in doc_id order) to
    consecutive training shards of ~TOKEN_BUDGET whitespace tokens each:
    shard = floor(running_token_total_before_doc / budget).

    A global running sum over 100 TB cannot be one unpartitioned window
    (single task). This is the **distributed two-phase prefix sum**: docs
    fall into FIXED doc_id buckets (deterministic boundaries, unlike
    sampled repartitionByRange), phase 1 windows WITHIN each bucket in
    parallel, phase 2 computes per-bucket totals (tiny frame), prefix-sums
    them with a window over buckets (rows = bucket count, not doc count),
    and a broadcast join adds each bucket's offset back. Every shuffle key
    is the bucket id; no stage sees more than one bucket's rows in order.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") / PACK_BUCKET).cast("long").alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    w_in = Window.partitionBy("bucket").orderBy("doc_id")
    within = docs.withColumn(
        "cum_in",  # running total inside the bucket, INCLUSIVE of this doc
        F.sum("toks").over(w_in),
    )
    bucket_totals = docs.groupBy("bucket").agg(F.sum("toks").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.withColumn(
        "offset", F.coalesce(F.sum("btot").over(w_b), F.lit(0))
    ).select("bucket", "offset")
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "toks",
            (F.col("offset") + F.col("cum_in") - F.col("toks")).alias("tokens_before"),
            (
                (F.col("offset") + F.col("cum_in") - F.col("toks"))
                / F.lit(TOKEN_BUDGET)
            )
            .cast("long")
            .alias("shard"),
        )
        .orderBy("doc_id")
    )


def q_pipeline_pretrain_corpus(spark, sf_dir):
    """The full pretraining-corpus prep chain as ONE declarative plan —
    quality filter → exact dedup → source-balanced downsample →
    token-budget shard packing — proving the individual operators compose
    without materialization barriers (Catalyst plans the whole chain; at
    100 TB each stage keeps its own scale shape: projection filter, one
    hash-groupBy dedup shuffle, per-source WindowGroupLimit sample, and
    the bucket-keyed two-phase prefix sum — no global window, no
    collect). Output is the shard manifest (docs + token totals per
    shard), the artifact a training launcher actually consumes."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    # stage 1: rule filter (the keep-side of quality_filter_reasons)
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    kept = docs.filter(
        ~(
            (F.col("n_chars") < 100)
            | (n_alpha.cast("double") / F.col("n_chars") < 0.5)
            | (n_digit.cast("double") / F.col("n_chars") > 0.2)
        )
    )
    # stage 2: exact dedup — canonical (min doc_id) per content hash
    canon = kept.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = kept.join(canon.select("doc_id"), "doc_id", "left_semi")
    # stage 3: source-balanced sample (same plan as q_source_balanced_sample)
    per_source = surv.groupBy("source").agg(F.count("*").alias("n"))
    target = per_source.agg(F.min("n").alias("take"))
    hid = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w_s = Window.partitionBy("source").orderBy(hid.asc(), F.col("doc_id").asc())
    sample = (
        surv.withColumn("rn", F.row_number().over(w_s))
        .join(F.broadcast(target))
        .filter(F.col("rn") <= F.col("take"))
        .select(
            "doc_id",
            (F.col("doc_id") / PACK_BUCKET).cast("long").alias("bucket"),
            F.size(F.split("text", " ")).cast("long").alias("toks"),
        )
    )
    # stage 4: token-budget packing (two-phase distributed prefix sum)
    w_in = Window.partitionBy("bucket").orderBy("doc_id")
    within = sample.withColumn("cum_in", F.sum("toks").over(w_in))
    bucket_totals = sample.groupBy("bucket").agg(F.sum("toks").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.withColumn(
        "offset", F.coalesce(F.sum("btot").over(w_b), F.lit(0))
    ).select("bucket", "offset")
    packed = within.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "toks",
        (
            (F.col("offset") + F.col("cum_in") - F.col("toks")) / F.lit(TOKEN_BUDGET)
        )
        .cast("long")
        .alias("shard"),
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard")
    )


ORACLES = {
    "q_train_val_split": """
        WITH s AS (
          SELECT source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                   % 100 AS b,
                 len(string_split(text, ' ')) AS toks
          FROM documents
        ),
        lab AS (
          SELECT source,
                 CASE WHEN b < 80 THEN 'train'
                      WHEN b < 90 THEN 'val'
                      ELSE 'test' END AS split,
                 toks
          FROM s
        ),
        per AS (
          SELECT source, split, count(*) AS n_docs,
                 CAST(sum(toks) AS BIGINT) AS total_tokens
          FROM lab GROUP BY source, split
        )
        SELECT source, split, n_docs, total_tokens,
               round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY source), 6)
                 AS frac_of_source
        FROM per ORDER BY source, split""",
    "pipeline_pretrain_corpus": f"""
        WITH kept AS (
          SELECT doc_id, source, text FROM documents
          WHERE NOT (n_chars < 100
            OR CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / n_chars < 0.5
            OR CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / n_chars > 0.2)
        ), canon AS (
          SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
        ), surv AS (
          SELECT k.* FROM kept k WHERE k.doc_id IN (SELECT doc_id FROM canon)
        ), counts AS (
          SELECT source, count(*) AS n FROM surv GROUP BY source
        ), tgt AS (SELECT min(n) AS take FROM counts),
        ranked AS (
          SELECT doc_id, text,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                 ) AS rn
          FROM surv
        ), sample AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
          FROM ranked, tgt WHERE rn <= tgt.take
        ), pre AS (
          SELECT doc_id, toks,
                 CAST(coalesce(SUM(toks) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tokens_before
          FROM sample
        )
        SELECT CAST(floor(CAST(tokens_before AS DOUBLE) / {TOKEN_BUDGET}) AS BIGINT) AS shard,
               count(*) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS shard_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM pre GROUP BY 1 ORDER BY shard""",
    "q_source_balanced_sample": """
        WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        tgt AS (SELECT min(n) AS take FROM counts),
        ranked AS (
          SELECT source, doc_id, lang,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                 ) AS rn
          FROM documents
        )
        SELECT source, CAST(rn AS BIGINT) AS sample_rank, doc_id, lang
        FROM ranked, tgt WHERE rn <= tgt.take
        ORDER BY source, sample_rank""",
    "q_token_budget_packing": f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                 CAST(coalesce(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                   OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
          FROM documents
        )
        SELECT doc_id, toks, tokens_before,
               CAST(floor(CAST(tokens_before AS DOUBLE) / {TOKEN_BUDGET}) AS BIGINT) AS shard
        FROM c ORDER BY doc_id""",
    "q_stratified_sample": """
        WITH ranked AS (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC, o_orderkey ASC
                 ) AS rn
          FROM orders
        )
        SELECT o_orderpriority, rn AS sample_rank, o_orderkey, o_totalprice
        FROM ranked WHERE rn <= 20
        ORDER BY o_orderpriority, sample_rank""",
    "q_range_join_bucketed": f"""
        SELECT o.o_orderkey,
               count(*) AS n_shipped,
               {dsum_sql("l.l_extendedprice", "shipped_value")}
        FROM orders o
        JOIN lineitem l
          ON epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
         AND epoch_us(l.l_shipdate) < epoch_us(o.o_orderdate) + {WEEK_US}
        WHERE o.o_orderkey % 101 = 0
        GROUP BY 1 ORDER BY 1""",
    "q_skew_salted_join": f"""
        SELECT c.c_nationkey,
               count(*) AS n_events,
               {dsum_sql('e."value"', "total_value")}
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1""",
    "q_hash_sampled_stats": f"""
        SELECT l_returnflag,
               count(*) AS n_rows,
               {dsum_sql("l_quantity", "sum_qty")},
               {dsum_sql("l_extendedprice", "sum_price")}
        FROM lineitem
        WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
        GROUP BY 1 ORDER BY 1""",
}

QUERIES = {
    "pipeline_pretrain_corpus": q_pipeline_pretrain_corpus,
    "q_token_budget_packing": q_token_budget_packing,
    "q_range_join_bucketed": q_range_join_bucketed,
    "q_skew_salted_join": q_skew_salted_join,
    "q_hash_sampled_stats": q_hash_sampled_stats,
    "q_stratified_sample": q_stratified_sample,
    "q_source_balanced_sample": q_source_balanced_sample,
    "q_train_val_split": q_train_val_split,
}
