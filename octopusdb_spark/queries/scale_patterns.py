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

from octopusdb_spark.queries.common import dsum, dsum_sql, spread, t
from octopusdb_spark.queries.text import bpe_token_sql

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
    # spread (r16, guide §2.5): the orders side broadcasts, so the whole
    # join + residual filter + partial agg otherwise run inside the
    # single-split lineitem scan task (measured 2.2 s -> 1.2 s; the
    # narrow 16-byte rows make the restore shuffle trivial)
    lb = spread(li.withColumn("bucket", F.floor(F.col("ship_us") / WEEK_US)), "bucket")
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


def q_token_budget_packing_bpe(spark, sf_dir):
    """Token-budget shard packing under the TOKENIZER-FIDELITY counter
    (VERDICT r8 #5): the same distributed two-phase prefix sum as
    `q_token_budget_packing`, run over BOTH the whitespace proxy and the
    BPE-ish subword segmentation (`bpe_token_col` — GPT-2-style chunks,
    integer per-chunk costs), side by side. Real pipelines pack by
    tokenizer counts, not word counts: the subword counter runs ~1.2-1.8x
    the whitespace one on this corpus, so the same budget cuts ~1.5x as
    many shards and every boundary moves. The output carries both shard
    assignments so the divergence is itself hash-checked; an in-query
    assertion reddens the row if the two packings ever agree everywhere
    (which would mean the counter is not actually changing decisions).

    Scale shape: one extra regex pass per row inside whole-stage codegen —
    no new shuffle (both running sums share the bucket-keyed windows and
    the single broadcast of bucket offsets)."""
    from pyspark.sql import Window

    from octopusdb_spark.queries.text import bpe_token_col

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") / PACK_BUCKET).cast("long").alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("toks_ws"),
        bpe_token_col("text").alias("toks_bpe"),
    )
    w_in = Window.partitionBy("bucket").orderBy("doc_id")
    within = docs.withColumn("cum_ws", F.sum("toks_ws").over(w_in)).withColumn(
        "cum_bpe", F.sum("toks_bpe").over(w_in)
    )
    totals = docs.groupBy("bucket").agg(
        F.sum("toks_ws").alias("bt_ws"), F.sum("toks_bpe").alias("bt_bpe")
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bt_ws").over(w_b), F.lit(0)).alias("off_ws"),
        F.coalesce(F.sum("bt_bpe").over(w_b), F.lit(0)).alias("off_bpe"),
    )
    shard = lambda off, cum, tok: (  # noqa: E731
        (F.col(off) + F.col(cum) - F.col(tok)) / F.lit(TOKEN_BUDGET)
    ).cast("long")
    # materialize ONCE (a 5-long-columns-per-doc frame): the eager
    # divergence probe below and the caller's action both read the
    # checkpointed result instead of re-running the two window passes —
    # without this the probe would double the query's real plan cost
    out = (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "toks_ws",
            "toks_bpe",
            shard("off_ws", "cum_ws", "toks_ws").alias("shard_ws"),
            shard("off_bpe", "cum_bpe", "toks_bpe").alias("shard_bpe"),
        )
        .localCheckpoint(eager=True)
    )
    diverged = out.filter(F.col("shard_ws") != F.col("shard_bpe")).limit(1).count()
    if diverged == 0:
        raise RuntimeError(
            "BPE packing identical to whitespace packing — counter inert"
        )
    return out.orderBy("doc_id")


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
            F.size(F.split("text", " ")).cast("long").alias("toks"),
        )
    )
    # stage 4: token-budget packing (shared two-phase prefix sum)
    packed = token_budget_pack(sample)
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


def q_join_skew_profile(spark, sf_dir):
    """Join-key skew profile — the pre-flight diagnostic that decides
    whether a 100 TB join/aggregation on this key needs salting or AQE
    skew handling: per-key row counts, the global skew ratio
    (max key count / mean key count — >> 1 means one reducer drowns),
    and the top-10 heaviest keys with their share of all rows. One keyed
    agg + a 1-row stats broadcast + an ordered limit; at scale this runs
    BEFORE the expensive join, on the key column alone (column pruning
    keeps the scan narrow)."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
    )
    top = counts.orderBy(F.desc("n"), F.asc("user_id")).limit(10)
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        top.join(F.broadcast(stats))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_rows"),
            F.round(dbl("n") / dbl("total_rows"), 6).alias("share"),
            F.round(dbl("max_n") * dbl("n_keys") / dbl("total_rows"), 6).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.desc("n_rows"), F.asc("user_id"))
    )


def mixture_rates(counts_df):
    """(source, n) -> (source, n, w, w_tot, budget): quantized sqrt
    weights (round(sqrt(n) * 1e6) — IEEE sqrt is correctly rounded, so
    both engines agree bit-for-bit), exact integer totals, 60% budget.
    THE mixture-rate definition, shared by `q_domain_mixture` and
    `pipeline_pretrain_v2` so the two can never diverge."""
    w = counts_df.withColumn(
        "w", F.round(F.sqrt(F.col("n").cast("double")) * 1e6).cast("long")
    )
    tot = w.agg(
        F.sum("w").cast("long").alias("w_tot"), F.sum("n").cast("long").alias("n_tot")
    )
    return w.join(F.broadcast(tot)).withColumn(
        "budget", F.expr("CAST((n_tot * 6) DIV 10 AS BIGINT)")
    )


def mixture_bucket():
    """The deterministic per-doc md5 bucket in [0, 1e6) membership tests
    against."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 1000000
    )


def mixture_keep_cond():
    """keep <=> bucket/1e6 < budget*w/(w_tot*n), evaluated as the
    cross-multiplied DECIMAL(38,0) comparison — no float ever decides
    membership. Expects columns bucket, n, w, w_tot, budget in scope."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (
        dec(F.col("bucket")) * dec(F.col("w_tot")) * dec(F.col("n"))
        < dec(F.col("budget")) * dec(F.col("w")) * F.lit(1000000).cast("decimal(38,0)")
    )


def token_budget_pack(df):
    """(doc_id, toks) -> (doc_id, toks, shard): the two-phase distributed
    prefix sum over fixed doc_id-range buckets — phase 1 is a bucket-keyed
    window, phase 2 a window over BUCKET TOTALS only (rows = bucket
    count), so no global per-doc window exists. Equivalent to a global
    running sum in doc_id order (bucket index is monotone in doc_id).
    Shared by `pipeline_pretrain_corpus` and `pipeline_pretrain_v2`."""
    from pyspark.sql import Window

    sample = df.withColumn("_pb", (F.col("doc_id") / PACK_BUCKET).cast("long"))
    w_in = Window.partitionBy("_pb").orderBy("doc_id")
    within = sample.withColumn("cum_in", F.sum("toks").over(w_in))
    bucket_totals = sample.groupBy("_pb").agg(F.sum("toks").alias("btot"))
    w_b = Window.orderBy("_pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.withColumn(
        "offset", F.coalesce(F.sum("btot").over(w_b), F.lit(0))
    ).select("_pb", "offset")
    return within.join(F.broadcast(offsets), "_pb").select(
        "doc_id",
        "toks",
        ((F.col("offset") + F.col("cum_in") - F.col("toks")) / F.lit(TOKEN_BUDGET))
        .cast("long")
        .alias("shard"),
    )


def q_pipeline_pretrain_v2(spark, sf_dir):
    """The MODERN pretraining-corpus chain as one declarative plan — LM
    quality filter → cross-doc span-dedup filter → exact dedup →
    temperature-weighted domain mixture → token-budget shard packing —
    i.e. `pipeline_pretrain_corpus` upgraded with this round's operators,
    composed without materialization barriers. The LM scores and span
    hashes come from the SAME memoized compressed frames the standalone
    queries read (`_LM_PAIRS_MEMO` / `_SPAN_HASH_MEMO`), so composing the
    pipeline adds joins, not re-explodes of the corpus.

    Stage shapes at 100 TB: two doc-keyed score joins (bounded model
    broadcast + hash join), one hash-groupBy dedup shuffle, the
    integer-exact mixture filter (map-side after a tiny rates join — the
    rates recompute over SURVIVORS, as a real pipeline must), and the
    bucket-keyed two-phase prefix sum. No global window over documents,
    no collect. Output: the shard manifest a training launcher consumes."""
    from octopusdb_spark.queries.text import lm_doc_stats, span_doc_stats

    docs = t(spark, sf_dir, "documents")
    # stage 1: LM quality filter (keep low_quality == 0, i.e. rounded
    # OOV ratio <= 0.35 — identical rule to text_lm_score, including the
    # zero-bigram restore: a doc absent from the stats frame has nothing
    # out-of-model and passes)
    lm = lm_doc_stats(spark, sf_dir)
    # stage 2: span-dedup filter (keep dup_ratio <= 0.2 — identical rule
    # to text_dup_spans; docs with < SPAN_WORDS words have no spans and
    # pass by construction via the left join)
    span = span_doc_stats(spark, sf_dir)
    surv0 = (
        docs.join(lm, "doc_id", "left")
        .filter(
            F.coalesce(
                F.round(F.col("oov").cast("double") / F.col("n_bigrams"), 6),
                F.lit(0.0),
            )
            <= 0.35
        )
        .join(span, "doc_id", "left")
        .filter(
            F.coalesce(
                F.round(F.col("dup").cast("double") / F.col("n_spans"), 6),
                F.lit(0.0),
            )
            <= 0.2
        )
        .select("doc_id", "source", "text")
    )
    # stage 3: exact dedup — canonical (min doc_id) per content hash
    canon = surv0.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # Narrow survivor materialization (r16 optimization, guide §3.3/§8):
    # downstream stages reference the survivor set FOUR times (the dedup
    # semi-join's both sides, the mixture-rate recount, the keep filter,
    # and the pack's two prefix-sum branches), and each reference used to
    # re-evaluate the whole filter chain — the explain held ~154 Exchange
    # nodes from the duplicated subtrees. Every downstream decision needs
    # only (doc_id, source, bucket, toks) — ~32 bytes/doc, the "decide
    # with small rows" proxy — so compute exactly those once, checkpoint,
    # and let every stage read the materialized narrow frame. Values are
    # unchanged: bucket/toks are the same expressions previously computed
    # inline (oracle-verified).
    surv = (
        surv0.join(canon.select("doc_id"), "doc_id", "left_semi")
        .select(
            "doc_id",
            "source",
            mixture_bucket().alias("bucket"),
            F.size(F.split("text", " ")).cast("long").alias("toks"),
        )
        .localCheckpoint(eager=True)
    )
    # stage 4: temperature mixture over SURVIVORS (the shared
    # q_domain_mixture machinery, rates recomputed from survivor counts)
    rates = mixture_rates(surv.groupBy("source").agg(F.count("*").alias("n")))
    mixed = (
        surv.join(rates, "source")
        .filter(mixture_keep_cond())
        .select("doc_id", "toks")
    )
    # stage 5: token-budget packing (shared two-phase prefix sum)
    packed = token_budget_pack(mixed)
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


def q_domain_mixture(spark, sf_dir):
    """Temperature-weighted domain mixture — the source-reweighting stage a
    multi-domain pretraining corpus runs after filtering (the UniMax /
    multilingual-sampling family): target mixture weight per source is
    proportional to n^tau with tau = 0.5 (sqrt smoothing — big domains
    are downsampled toward the tail, the tail is kept whole), a total
    budget of 60% of the corpus is split by those weights, and membership
    is decided by a deterministic md5 bucket so the sample is stable
    across reruns, engines, and repartitioning.

    Cross-engine exactness: the keep decision is pure integer arithmetic.
    Weights are quantized once (round(sqrt(n) * 1e6) — IEEE sqrt is
    correctly rounded, so both engines agree bit-for-bit), summed as
    integers (order-independent, unlike float sums), and the per-doc test
    ``bucket/1e6 < B*w/(W*n)`` is evaluated as the cross-multiplied
    DECIMAL(38,0) comparison ``bucket*W*n < B*w*1e6`` — no float ever
    decides membership. The reported rates are display-only doubles
    computed by an identical operation chain in both engines.

    Plan: one tiny groupBy (source counts), a 1-row totals broadcast, a
    per-source rates table joined back to the fact scan (AQE broadcasts
    it when small; no forced hint — source cardinality is data-dependent),
    then one keyed agg for the audit. At 100 TB: two scans, two bounded
    shuffles — the keep filter is a map-side projection."""
    docs = t(spark, sf_dir, "documents")
    rates = mixture_rates(docs.groupBy("source").agg(F.count("*").alias("n")))
    per = (
        docs.select("source", mixture_bucket().alias("bucket"))
        .join(rates, "source")
        .select(
            "source", "n", "w", "w_tot", "budget",
            F.when(mixture_keep_cond(), 1).otherwise(0).alias("keep"),
        )
        .groupBy("source", "n", "w", "w_tot", "budget")
        .agg(F.sum("keep").cast("long").alias("kept_docs"))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return per.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(dbl("w") / dbl("w_tot"), 6).alias("mix_weight"),
        F.round(
            F.least(F.lit(1.0), dbl("budget") * dbl("w") / dbl("w_tot") / dbl("n")), 6
        ).alias("keep_rate"),
        "kept_docs",
        F.round(dbl("kept_docs") / dbl("n"), 6).alias("achieved_rate"),
    ).orderBy("source")


ORACLES = {
    "q_join_skew_profile": """
        WITH c AS (
          SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        ),
        s AS (
          SELECT CAST(sum(n) AS BIGINT) AS total_rows,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(max(n) AS BIGINT) AS max_n
          FROM c
        ),
        top AS (
          SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 10
        )
        SELECT t.user_id,
               CAST(t.n AS BIGINT) AS n_rows,
               round(CAST(t.n AS DOUBLE) / CAST(s.total_rows AS DOUBLE), 6)
                 AS share,
               round(CAST(s.max_n AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
                       / CAST(s.total_rows AS DOUBLE), 6) AS skew_ratio
        FROM top t, s
        ORDER BY n_rows DESC, user_id ASC""",
    "pipeline_pretrain_v2": f"""
        WITH d AS (SELECT doc_id, lower(text) AS txt FROM documents),
        bex AS (
          SELECT doc_id, substring(txt, CAST(i AS INT), 2) AS b
          FROM d, unnest(range(1, length(txt))) AS t(i)
        ),
        model AS (
          SELECT b, count(*) AS cnt FROM bex GROUP BY b
          ORDER BY cnt DESC, b ASC LIMIT 64
        ),
        lmstats AS (
          SELECT e.doc_id,
                 round(CAST(sum(CASE WHEN m.cnt IS NULL THEN 1 ELSE 0 END)
                            AS DOUBLE) / count(*), 6) AS oovr
          FROM bex e LEFT JOIN model m USING (b)
          GROUP BY e.doc_id
        ),
        wsd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        sex AS (
          SELECT doc_id,
                 md5(array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 15], ' ')) AS h
          FROM wsd, unnest(range(1, len(ws) - 15 + 1)) AS t(i)
          WHERE len(ws) >= 16
        ),
        duph AS (SELECT h FROM sex GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        spanstats AS (
          SELECT s.doc_id, count(*) AS n_spans,
                 sum(CASE WHEN duph.h IS NOT NULL THEN 1 ELSE 0 END) AS dup
          FROM sex s LEFT JOIN duph ON s.h = duph.h
          GROUP BY s.doc_id
        ),
        surv0 AS (
          SELECT doc.doc_id, doc.source, doc.text
          FROM documents doc
          LEFT JOIN lmstats l ON doc.doc_id = l.doc_id
          LEFT JOIN spanstats sp ON doc.doc_id = sp.doc_id
          WHERE coalesce(l.oovr, 0.0) <= 0.35
            AND coalesce(round(CAST(sp.dup AS DOUBLE) / sp.n_spans, 6), 0.0) <= 0.2
        ),
        canon AS (SELECT min(doc_id) AS doc_id FROM surv0 GROUP BY md5(text)),
        surv AS (
          SELECT s.* FROM surv0 s WHERE s.doc_id IN (SELECT doc_id FROM canon)
        ),
        counts AS (SELECT source, count(*) AS n FROM surv GROUP BY source),
        w AS (
          SELECT source, n,
                 CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
          FROM counts
        ),
        tot AS (
          SELECT CAST(sum(w) AS BIGINT) AS w_tot, CAST(sum(n) AS BIGINT) AS n_tot
          FROM w
        ),
        rates AS (
          SELECT source, n, w, w_tot,
                 CAST((n_tot * 6) // 10 AS BIGINT) AS budget
          FROM w, tot
        ),
        mixbase AS (
          SELECT s.doc_id, s.source, s.text,
                 CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                   % 1000000 AS bucket
          FROM surv s
        ),
        keptdocs AS (
          SELECT m.doc_id, CAST(len(string_split(m.text, ' ')) AS BIGINT) AS toks
          FROM mixbase m JOIN rates r USING (source)
          WHERE CAST(m.bucket AS DECIMAL(38,0))
                  * CAST(r.w_tot AS DECIMAL(38,0))
                  * CAST(r.n AS DECIMAL(38,0))
                < CAST(r.budget AS DECIMAL(38,0))
                  * CAST(r.w AS DECIMAL(38,0))
                  * CAST(1000000 AS DECIMAL(38,0))
        ),
        pre AS (
          SELECT doc_id, toks,
                 CAST(coalesce(SUM(toks) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tokens_before
          FROM keptdocs
        )
        SELECT CAST(floor(CAST(tokens_before AS DOUBLE) / {TOKEN_BUDGET}) AS BIGINT)
                 AS shard,
               count(*) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS shard_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM pre GROUP BY 1 ORDER BY shard""",
    "q_domain_mixture": """
        WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        w AS (
          SELECT source, n,
                 CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
          FROM counts
        ),
        tot AS (
          SELECT CAST(sum(w) AS BIGINT) AS w_tot, CAST(sum(n) AS BIGINT) AS n_tot
          FROM w
        ),
        rates AS (
          SELECT source, n, w, w_tot,
                 CAST((n_tot * 6) // 10 AS BIGINT) AS budget
          FROM w, tot
        ),
        d AS (
          SELECT source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                   % 1000000 AS bucket
          FROM documents
        ),
        k AS (
          SELECT d.source,
                 CASE WHEN CAST(d.bucket AS DECIMAL(38,0))
                             * CAST(r.w_tot AS DECIMAL(38,0))
                             * CAST(r.n AS DECIMAL(38,0))
                           < CAST(r.budget AS DECIMAL(38,0))
                             * CAST(r.w AS DECIMAL(38,0))
                             * CAST(1000000 AS DECIMAL(38,0))
                      THEN 1 ELSE 0 END AS keep
          FROM d JOIN rates r USING (source)
        ),
        per AS (
          SELECT source, CAST(sum(keep) AS BIGINT) AS kept_docs
          FROM k GROUP BY source
        )
        SELECT r.source,
               r.n AS n_docs,
               round(CAST(r.w AS DOUBLE) / CAST(r.w_tot AS DOUBLE), 6) AS mix_weight,
               round(least(1.0, CAST(r.budget AS DOUBLE) * CAST(r.w AS DOUBLE)
                                  / CAST(r.w_tot AS DOUBLE) / CAST(r.n AS DOUBLE)), 6)
                 AS keep_rate,
               p.kept_docs,
               round(CAST(p.kept_docs AS DOUBLE) / CAST(r.n AS DOUBLE), 6)
                 AS achieved_rate
        FROM rates r JOIN per p USING (source)
        ORDER BY r.source""",
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
    "q_token_budget_packing_bpe": f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS toks_ws,
                 {bpe_token_sql("text")} AS toks_bpe
          FROM documents
        ), cum AS (
          SELECT doc_id, toks_ws, toks_bpe,
                 CAST(coalesce(SUM(toks_ws) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before_ws,
                 CAST(coalesce(SUM(toks_bpe) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before_bpe
          FROM c
        )
        SELECT doc_id, toks_ws, toks_bpe,
               CAST(floor(CAST(before_ws AS DOUBLE) / {TOKEN_BUDGET}) AS BIGINT) AS shard_ws,
               CAST(floor(CAST(before_bpe AS DOUBLE) / {TOKEN_BUDGET}) AS BIGINT) AS shard_bpe
        FROM cum ORDER BY doc_id""",
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
    "q_token_budget_packing_bpe": q_token_budget_packing_bpe,
    "q_range_join_bucketed": q_range_join_bucketed,
    "q_skew_salted_join": q_skew_salted_join,
    "q_hash_sampled_stats": q_hash_sampled_stats,
    "q_stratified_sample": q_stratified_sample,
    "q_source_balanced_sample": q_source_balanced_sample,
    "q_train_val_split": q_train_val_split,
    "q_domain_mixture": q_domain_mixture,
    "pipeline_pretrain_v2": q_pipeline_pretrain_v2,
    "q_join_skew_profile": q_join_skew_profile,
}
