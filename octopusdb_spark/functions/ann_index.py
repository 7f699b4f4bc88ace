"""Persistent ANN indexes: build once, query many (IVF and PQ).

The registry's `sim_ann_ivf` recomputes centroid assignment per query so a
DuckDB oracle can check it; this is the production lifecycle: `build_ivf`
materializes the coarse quantizer and the inverted lists to Parquet —
lists written partitioned BY centroid, so a probe reads only its lists'
files (partition pruning, the on-disk analog of an IVF index's posting
lists) — and `query_ivf` answers any query batch against the prebuilt
index without touching the full corpus.

Scale shape: build is one broadcast assignment pass + one partitioned
write, O(corpus). A query batch scores K centroids (broadcast), prunes to
nprobe lists (partition filter reaches the Parquet scan), and exact-scores
only those candidates — corpus I/O per query batch is nprobe/K of the
data, the IVF contract. K and nprobe tune recall vs. cost; deterministic
given the seed centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from octopusdb_spark.queries.similarity import (
    _dot,
    _l2sq,
    _residual_of,
    _with_norm,
    assign_centroids,
    kmeans_centroids,
    pq_train_codebooks,
)


def _write_list_stats(assigned_ct: DataFrame, index_dir: str, phase: str,
                      mode: str) -> None:
    """Append one ledger generation to ``{index_dir}/stats``: per inverted
    list, the row count and the DECIMAL(38,12)-accumulated sum of
    residual L2 norms (||v - c(v)||, the per-row double being the
    bit-identical sequential fold every oracle replicates; the DECIMAL
    sum making the cross-row total order-independent). The ledger is
    what makes `ivf_drift` O(ledger) instead of O(corpus): residuals are
    computed HERE, where the batch is already in hand, never re-scanned.
    Consistency grade: the ledger write follows the lists write, so a
    crash between the two leaves the ledger LAGGING the lists (drift
    undercounts n_now) — telemetry-grade, never a data-path error; a
    rebuild (`build_ivf`, mode overwrite end to end) reconciles both."""
    stats = (
        assigned_ct.withColumn(
            "res_norm", F.sqrt(_l2sq(F.col("embedding"), F.col("ct_emb")))
        )
        .groupBy("cent_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("res_norm").cast("decimal(38,12)")).alias("res_norm_sum"),
        )
        .withColumn("phase", F.lit(phase))
    )
    stats.write.mode(mode).parquet(f"{index_dir}/stats")


# ledger schema written by both stats paths — must stay identical across
# generations (the stats table is a multi-generation parquet union)
_STATS_SCHEMA = "cent_id int, n long, res_norm_sum decimal(38,12), phase string"

# Widest centroid set whose ledger stats ride the lists write as observed
# conditional aggregates; wider quantizers use the aggregate-over-lists
# path above (same bytes either way — pinned by test).
OBSERVE_STATS_MAX_CENTROIDS = 32


def _ledger_metrics(cent_ids: list):
    """Per-centroid conditional aggregates of the ledger stats, observable
    during the lists write itself (r16, guide §1.2): same per-row
    res_norm doubles, same order-independent DECIMAL sum as
    `_write_list_stats` — the ledger bytes are identical, but the build
    no longer re-reads the written lists (a full corpus re-read at
    scale) and the append needs no checkpoint + aggregation job."""
    res = F.sqrt(_l2sq(F.col("embedding"), F.col("ct_emb"))).cast("decimal(38,12)")
    metrics = []
    for cid in cent_ids:
        c = F.col("cent_id") == F.lit(int(cid))
        metrics.append(F.count(F.when(c, F.lit(1))).alias(f"n__{cid}"))
        metrics.append(F.sum(F.when(c, res)).alias(f"rs__{cid}"))
    return metrics


def _write_observed_stats(spark: SparkSession, got: dict, cent_ids: list,
                          index_dir: str, phase: str, mode: str) -> None:
    rows = [
        (int(cid), int(got[f"n__{cid}"]), got[f"rs__{cid}"], phase)
        for cid in cent_ids
        if got[f"n__{cid}"]
    ]
    # parallelize(.., 1), not coalesce(1): coalescing a default-parallelism
    # Python collection makes one task evaluate 32 Python partitions
    # sequentially (the set_batch lesson, kv/store.py)
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), _STATS_SCHEMA
    ).write.mode(mode).parquet(f"{index_dir}/stats")


def build_ivf(
    emb_df: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> None:
    """Materialize the index: TRAINED centroids — deterministic seed (first
    n_centroids vectors by id) refined by ``kmeans_iters`` Lloyd rounds
    (see `kmeans_centroids`: decimal-mean update, fixed tie-breaks, no
    randomness) — plus inverted lists partitioned by centroid id. Pass
    ``kmeans_iters=0`` for the raw-seed quantizer. Training cost is
    iters × (one broadcast assignment pass + one (cent,dim)-keyed agg),
    O(corpus) per round."""
    emb = _with_norm(
        emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    w = Window.orderBy("vec_id")
    cent = (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.row_number().over(w).alias("cent_id"),
            F.col("embedding").alias("ct_emb"),
            F.col("norm").alias("ct_norm"),
        )
    )
    if kmeans_iters > 0:
        cent = kmeans_centroids(emb, cent, iters=kmeans_iters)
    cent.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    cent_r = _read_centroids(emb.sparkSession, index_dir)
    assigned = assign_centroids(emb, cent_r, keep=("embedding", "norm"), with_ct=True)
    if n_centroids <= OBSERVE_STATS_MAX_CENTROIDS:
        # Ledger stats observed during the lists write itself: centroid
        # ids are bounded by 1..n_centroids (row_number seeds; Lloyd drops
        # but never renumbers), so per-id conditional aggregates are exact.
        # The prior shape re-read the WRITTEN lists — one full corpus
        # re-read at scale — to recompute them (r16, guide §1.2).
        from pyspark.sql import Observation

        cent_ids = list(range(1, n_centroids + 1))
        obs = Observation(f"ivf-build-{index_dir}")
        (
            assigned.observe(obs, *_ledger_metrics(cent_ids))
            .select("cent_id", "vec_id", "embedding", "norm")
            .repartition("cent_id")
            .write.mode("overwrite")
            .partitionBy("cent_id")
            .parquet(f"{index_dir}/lists")
        )
        _write_observed_stats(
            emb.sparkSession, obs.get, cent_ids, index_dir, "build", "overwrite"
        )
    else:
        (
            assigned.select("cent_id", "vec_id", "embedding", "norm")
            .repartition("cent_id")
            .write.mode("overwrite")
            .partitionBy("cent_id")
            .parquet(f"{index_dir}/lists")
        )
        written = emb.sparkSession.read.parquet(f"{index_dir}/lists")
        _write_list_stats(
            written.join(F.broadcast(cent_r.select("cent_id", "ct_emb")), "cent_id"),
            index_dir,
            "build",
            "overwrite",
        )


def append_ivf(
    emb_df: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign NEW vectors to the STORED
    (frozen) coarse quantizer — the same `rank_centroids` rule as the
    build, so build-time and append-time assignment can never diverge —
    and append them to the inverted lists (dynamic-partition append; a
    probe's partition pruning sees old and new rows alike). This is the
    production lifecycle: train rarely, append continuously; the frozen
    quantizer keeps every existing assignment valid, at the cost of
    gradual drift until the next `build_ivf` rebuild (the standard IVF
    trade; monitor recall and rebuild when it sags).

    Ids must be new — an id-dedup pass here would be a full-corpus
    anti-join at 100 TB; deduplicate upstream where it is one keyed hash
    agg. Cost: one broadcast-K assignment pass + one partitioned write
    over the BATCH, never the corpus."""
    emb = _with_norm(
        emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    cent = _read_centroids(emb.sparkSession, index_dir)
    # one tiny collect serves the dim check AND the ledger's centroid-id
    # domain (the frozen quantizer is K rows by contract)
    cent_meta = cent.select("cent_id", F.size("ct_emb").alias("dim")).collect()
    _check_batch_dim(emb, int(cent_meta[0]["dim"]), "append_ivf")
    cent_ids = sorted(int(r["cent_id"]) for r in cent_meta)
    assigned = assign_centroids(emb, cent, keep=("embedding", "norm"), with_ct=True)
    if len(cent_ids) <= OBSERVE_STATS_MAX_CENTROIDS:
        # ONE assignment pass over the batch: ledger stats are observed
        # metrics of the lists write itself (r16, guide §1.2) — no
        # checkpoint, no second aggregation job, identical ledger bytes.
        from pyspark.sql import Observation

        obs = Observation(f"ivf-append-{index_dir}-{id(emb_df)}")
        (
            assigned.observe(obs, *_ledger_metrics(cent_ids))
            .select("cent_id", "vec_id", "embedding", "norm")
            .repartition("cent_id")
            .write.mode("append")
            .partitionBy("cent_id")
            .parquet(f"{index_dir}/lists")
        )
        _write_observed_stats(
            emb.sparkSession, obs.get, cent_ids, index_dir, "append", "append"
        )
    else:
        assigned = assigned.select(
            "cent_id", "vec_id", "embedding", "norm", "ct_emb"
        ).localCheckpoint(eager=False)
        (
            assigned.select("cent_id", "vec_id", "embedding", "norm")
            .repartition("cent_id")
            .write.mode("append")
            .partitionBy("cent_id")
            .parquet(f"{index_dir}/lists")
        )
        _write_list_stats(assigned, index_dir, "append", "append")
    emb.sparkSession.catalog.refreshByPath(f"{index_dir}/stats")
    # Invalidate the session's cached file listing for the lists path: a
    # reader that already planned a query over this index (Spark's
    # InMemoryFileIndex caches per-path file status) would otherwise keep
    # seeing the PRE-append file set and silently miss every appended
    # vector. The writer owns the invalidation — callers shouldn't know
    # Spark caches listings. (Caught by the sim_ann_persistent oracle:
    # post-append top-k matched the pre-append answer.)
    emb.sparkSession.catalog.refreshByPath(f"{index_dir}/lists")


def ivf_drift(spark: SparkSession, index_dir: str) -> DataFrame:
    """Maintenance telemetry for a frozen-quantizer index (VERDICT r12
    #8): the index can `append_ivf` forever against a quantizer trained
    once, and nothing tells the operator WHEN that trade has gone bad.
    This probe reads the stats LEDGER (one row per list per
    build/append generation — O(ledger), never a corpus scan; the
    `approximate_sizes`-style endpoint) and reports, per inverted list:

    - ``n_build`` / ``n_now`` / ``added`` — growth since training;
    - ``mean_res_build_r6`` / ``mean_res_now_r6`` — mean residual L2
      norm (||v - c(v)||) at build time vs now. Appended vectors were
      assigned to centroids that were NOT trained on them, so their
      residuals run larger; the ratio ``drift_r6`` rising above ~1.2
      is the standard retrain signal (docs/SCALE.md);
    - ``skew_r6`` — list size vs the even-split expectation (n_now *
      K / total). Skew >> 1 means hot lists: probes over them scan
      disproportionate data, the other half of the retrain decision.

    All arithmetic is ledger-exact: per-row residual norms were folded
    sequentially at write time (bit-identical cross-engine), sums are
    DECIMAL(38,12) (order-independent), and the two means divide as
    doubles rounded at 6 — so the probe itself sits under the
    exact-value correctness gate (`sim_ann_drift`)."""
    stats = spark.read.parquet(f"{index_dir}/stats")
    per = stats.groupBy("cent_id").agg(
        F.sum(F.when(F.col("phase") == "build", F.col("n"))).alias("n_build"),
        F.sum(
            F.when(F.col("phase") == "build", F.col("res_norm_sum"))
        ).alias("sum_build"),
        F.sum("n").alias("n_now"),
        F.sum("res_norm_sum").alias("sum_now"),
    )
    k_total = per.select(
        F.count("*").alias("k"), F.sum("n_now").alias("total")
    )
    out = (
        per.crossJoin(F.broadcast(k_total))
        .select(
            "cent_id",
            F.coalesce("n_build", F.lit(0)).cast("long").alias("n_build"),
            F.col("n_now").cast("long").alias("n_now"),
            (F.col("n_now") - F.coalesce("n_build", F.lit(0)))
            .cast("long")
            .alias("added"),
            F.round(
                F.col("sum_build").cast("double") / F.col("n_build"), 6
            ).alias("mean_res_build_r6"),
            F.round(
                F.col("sum_now").cast("double") / F.col("n_now"), 6
            ).alias("mean_res_now_r6"),
            (F.col("n_now") * F.col("k") / F.col("total")).alias("skew_raw"),
        )
        .withColumn(
            "drift_r6",
            F.round(F.col("mean_res_now_r6") / F.col("mean_res_build_r6"), 6),
        )
        .withColumn("skew_r6", F.round("skew_raw", 6))
        .drop("skew_raw")
    )
    return out.orderBy("cent_id")


def _check_batch_dim(emb: DataFrame, expected: int, op: str) -> None:
    """Fail fast when an appended batch's vector dimension differs from the
    index it targets: a mismatched batch would not error on its own —
    zip_with pads with nulls, null distances sort first under asc, and an
    arbitrary codeword/centroid gets assigned — so the corruption would be
    SILENT. One bounded agg over the batch (never the corpus)."""
    bad = (
        emb.filter(F.size("embedding") != expected)
        .select("vec_id", F.size("embedding").alias("got"))
        .first()
    )
    if bad is not None:
        raise ValueError(
            f"{op}: batch vector dim {bad['got']} (vec_id={bad['vec_id']}) "
            f"!= index dim {expected}; appending would silently corrupt "
            "the index"
        )


def _residual_base(emb: DataFrame, residual_ivf_dir: str) -> DataFrame:
    """(vec_id, norm, cent_id, embedding=v - c(v)) against the stored
    coarse quantizer — the residual-mode input to PQ seeding, training,
    and encoding. norm stays the RAW vector's norm (the ADC denominator)."""
    cent = _read_centroids(emb.sparkSession, residual_ivf_dir)
    return assign_centroids(
        emb, cent, keep=("norm", "embedding"), with_ct=True
    ).select(
        "vec_id",
        "norm",
        "cent_id",
        _residual_of(F.col("embedding"), F.col("ct_emb")).alias("embedding"),
    )


def _encode_with_codebooks(subvecs: DataFrame, cb: DataFrame, residual: bool) -> DataFrame:
    """Nearest-codeword encoding — broadcast-codebook join, per-(vec, m)
    L2 argmin (code asc tie-break), one groupBy packing the M codes
    positionally. ONE definition shared by the initial `build_pq` and
    incremental `append_pq`, so the code-assignment rule can never
    diverge between a corpus's original rows and its appended ones."""
    keep = ["vec_id", "norm"] + (["cent_id"] if residual else [])
    w_enc = Window.partitionBy("vec_id", "m").orderBy(F.asc("d2"), F.asc("code"))
    aggs = [
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "code"))), lambda s: s["code"]
        ).alias("codes"),
        F.min("norm").alias("norm"),
    ]
    if residual:
        aggs.append(F.min("cent_id").alias("cent_id"))  # constant per vec
    return (
        subvecs.join(F.broadcast(cb), "m")
        .select(*keep, "m", "code", _l2sq(F.col("sv"), F.col("cw")).alias("d2"))
        .withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .groupBy("vec_id")
        .agg(*aggs)
    )


def append_pq(
    emb_df: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual_ivf_dir: str | None = None,
) -> None:
    """Encode NEW vectors against the STORED (frozen) codebooks and append
    to the codes table — `append_ivf`'s twin for the PQ index: train
    rarely, append continuously; codebooks drift from the appended
    distribution until the next `build_pq` rebuild. Subspace geometry
    (M, sub_dim) is read from the stored codebooks; the residual mode is
    cross-checked against the codes schema exactly like `query_pq`, so an
    append in the wrong mode fails fast instead of silently corrupting
    the table with incompatible codes. Ids must be new (same contract and
    reason as `append_ivf`). Cost: one broadcast-codebook encode pass
    over the BATCH (+ one broadcast-K assignment in residual mode)."""
    spark = emb_df.sparkSession
    cb = spark.read.parquet(f"{index_dir}/codebooks")
    meta = cb.agg(
        F.countDistinct("m").alias("n_sub"), F.max(F.size("cw")).alias("sub_dim")
    ).collect()[0]
    n_sub, sub_dim = meta["n_sub"], meta["sub_dim"]
    is_residual_index = "cent_id" in spark.read.parquet(f"{index_dir}/codes").columns
    if is_residual_index != (residual_ivf_dir is not None):
        raise ValueError(
            "append/build mode mismatch: the index at "
            f"{index_dir} was built {'WITH' if is_residual_index else 'WITHOUT'} "
            "residual encoding; pass the matching residual_ivf_dir"
        )
    emb = _with_norm(
        emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    _check_batch_dim(emb, n_sub * sub_dim, "append_pq")
    if residual_ivf_dir is not None:
        base = _residual_base(emb, residual_ivf_dir)
    else:
        base = emb.select("vec_id", "norm", "embedding")
    subvecs = _subspaces(base, "embedding", n_sub, sub_dim, "sv")
    codes = _encode_with_codebooks(subvecs, cb, residual=residual_ivf_dir is not None)
    codes.write.mode("append").parquet(f"{index_dir}/codes")
    # same listing-cache invalidation as append_ivf (see note there)
    spark.catalog.refreshByPath(f"{index_dir}/codes")


def _read_centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(f"{index_dir}/centroids")


def query_ivf(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    top_k: int = 5,
    nprobe: int = 2,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    exclude_matching_ids: bool = False,
) -> DataFrame:
    """Answer a query batch from the prebuilt index: rank centroids per
    query (broadcast, K rows), keep nprobe, and exact-score only the rows
    of those inverted lists. The union of probed centroid ids (a tiny set,
    <= nprobe x queries) is collected and pushed as a LITERAL
    ``cent_id IN (...)`` filter, so list partitions prune statically at
    the Parquet scan — no reliance on dynamic partition pruning firing.
    Returns (query_id, cand_id, rank, cosine).

    ``exclude_matching_ids=True`` drops candidates whose corpus vec_id
    equals the query's id — ONLY meaningful when query ids are drawn from
    the corpus id space (self-match suppression for in-corpus queries).
    Leave False for external query batches: their ids are unrelated, and
    excluding a coincidental collision would silently drop a legitimate
    neighbor."""
    q = _with_norm(
        queries_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("embedding"))
    ).select("query_id", F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm"))
    cent = _read_centroids(spark, index_dir)
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_emb",
            "q_norm",
            "cent_id",
            (_dot(F.col("q_emb"), F.col("ct_emb")) / (F.col("q_norm") * F.col("ct_norm"))).alias(
                "ccos"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_norm", "cent_id")
    )
    # ONE evaluation of the probe subtree (r16, guide §1.2): the probe
    # frame is bounded rows by construction (<= nprobe per query), so it is
    # collected once and reused both as driver metadata (the static
    # partition-pruning IN list below) and, re-parallelized, as the
    # broadcast join side — previously the query scan + crossJoin + window
    # ran twice, once per consumer.
    probe_rows = probes.collect()
    probed_ids = sorted({r["cent_id"] for r in probe_rows})
    probes_local = spark.createDataFrame(probe_rows, probes.schema)
    lists = spark.read.parquet(f"{index_dir}/lists").filter(
        F.col("cent_id").isin(probed_ids)
    )
    scored = lists.join(F.broadcast(probes_local), "cent_id")
    if exclude_matching_ids:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    scored = (
        scored
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            (_dot(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm"))).alias(
                "cos"
            ),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "cand_id", "rank", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


# ------------------------------------------------------------------ PQ index
def _subspaces(df: DataFrame, vec_col, n_sub: int, sub_dim: int, out: str) -> DataFrame:
    """Explode a vector column into (m, <out>) subvector rows."""
    return df.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim).alias(out),
                )
                for m in range(n_sub)
            ])
        ).alias("_e"),
    ).select(*[c for c in df.columns if c != vec_col], "_e.m", f"_e.{out}")


def build_pq(
    emb_df: DataFrame,
    index_dir: str,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 2,
    dim: int = 64,
    train_sample_mod: int = 4,
    residual_ivf_dir: str | None = None,
) -> None:
    """Materialize a product-quantization index: TRAINED per-subspace
    codebooks (deterministic seeds — the first ``n_codes`` vectors by id —
    refined by ``train_iters`` L2 Lloyd rounds over the deterministic
    1-in-``train_sample_mod`` id sample: quantizer quality needs a
    representative sample, not the corpus, and at 100 TB full-corpus Lloyd
    rounds would dominate the build; `pq_train_codebooks`) plus
    the encoded corpus: per vector, ``n_sub`` one-byte codes and its exact
    norm. The codes table is the whole on-disk corpus footprint a scoring
    scan reads — (8 codes + 1 norm) per vector instead of ``dim`` floats,
    the ~30x compression that makes exhaustive ADC scans affordable at
    100 TB. Build cost: train_iters bounded-key aggs + one encode pass.

    ``residual_ivf_dir``: path of a `build_ivf` index — switches the index
    to RESIDUAL encoding (the IVF-PQ composite, Jegou et al.): each vector
    is assigned to its nearest stored centroid and v - c(v) is what gets
    seeded, trained on, and encoded (residuals concentrate near the
    origin, so the same code budget quantizes them far more finely); codes
    rows additionally carry ``cent_id`` so `query_pq` can add the
    dot(q, c) term back. Query such an index with the SAME
    ``residual_ivf_dir``. Cost: one extra broadcast-K assignment pass +
    a narrow zip_with — same plan family as the build's encode."""
    sub_dim = dim // n_sub
    emb = _with_norm(
        emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    if residual_ivf_dir is not None:
        base = _residual_base(emb, residual_ivf_dir)
    else:
        base = emb.select("vec_id", "norm", "embedding")
    subvecs = _subspaces(base, "embedding", n_sub, sub_dim, "sv")
    w_seed = Window.orderBy("vec_id")
    seed_codebook = _subspaces(
        base.orderBy("vec_id")
        .limit(n_codes)
        .select(F.row_number().over(w_seed).alias("code"), "embedding"),
        "embedding",
        n_sub,
        sub_dim,
        "cw",
    ).select("m", "code", "cw")
    sample = subvecs.filter(F.col("vec_id") % train_sample_mod == 1).select(
        "vec_id", "m", "sv"
    )
    # An id space with no id ≡ 1 (mod N) would train on nothing and write
    # an empty codebook that query_pq can only crash on — fail fast with
    # the fix in hand instead.
    if sample.isEmpty():
        raise ValueError(
            f"PQ training sample is empty (no {id_col} % {train_sample_mod} == 1 "
            "in the corpus); choose a different train_sample_mod"
        )
    codebook = pq_train_codebooks(sample, seed_codebook, iters=train_iters)
    codebook.write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    cb = emb.sparkSession.read.parquet(f"{index_dir}/codebooks")
    codes = _encode_with_codebooks(subvecs, cb, residual=residual_ivf_dir is not None)
    codes.write.mode("overwrite").parquet(f"{index_dir}/codes")


def query_pq(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    top_k: int = 5,
    shortlist: int = 50,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    corpus_df: DataFrame | None = None,
    corpus_id_col: str = "vec_id",
    exclude_matching_ids: bool = False,
    residual_ivf_dir: str | None = None,
) -> DataFrame:
    """Answer a query batch from the prebuilt PQ index: per query, an
    M x K lookup table of subspace dot products against the stored
    codebooks (tiny, broadcast), then one compressed scan over the codes
    table — M positional lookups per candidate — keeps the ``shortlist``
    best per query. When ``corpus_df`` is given (the raw vectors), the
    shortlist is exact-rescored against it (the production refine step:
    corpus I/O = shortlist rows, not the scan); otherwise ADC-ranked
    results are returned directly with the approximate cosine.

    ``residual_ivf_dir``: REQUIRED (same dir) when the index was built
    with residual encoding — the ADC numerator becomes dot(q, c(v)) +
    sum(lut): the centroid term is a bounded (queries x K) dot-product
    frame joined by the cent_id each codes row carries. The mode is
    cross-checked against the codes schema, so a mismatched build/query
    pair fails fast instead of returning silently wrong scores."""
    cb = spark.read.parquet(f"{index_dir}/codebooks")
    # one metadata job for both scalars (the codebook is M*K tiny rows)
    meta = cb.agg(
        F.countDistinct("m").alias("n_sub"), F.max(F.size("cw")).alias("sub_dim")
    ).collect()[0]
    n_sub, sub_dim = meta["n_sub"], meta["sub_dim"]
    q = _with_norm(
        queries_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("embedding"))
    )
    qsub = _subspaces(
        q.select("query_id", "norm", "embedding"), "embedding", n_sub, sub_dim, "sv"
    )
    lut = (
        qsub.join(F.broadcast(cb), "m")
        .select(
            "query_id",
            F.col("norm").alias("q_norm"),
            "m",
            "code",
            _dot(F.col("sv"), F.col("cw")).alias("dp"),
        )
        .groupBy("query_id", "q_norm", "m")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "dp"))), lambda s: s["dp"]
            ).alias("lm")
        )
        .groupBy("query_id", "q_norm")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "lm"))), lambda s: s["lm"]
            ).alias("lut")
        )
    )
    codes = spark.read.parquet(f"{index_dir}/codes")
    is_residual_index = "cent_id" in codes.columns
    if is_residual_index != (residual_ivf_dir is not None):
        raise ValueError(
            "residual/raw mode mismatch: codes table "
            f"{'carries' if is_residual_index else 'lacks'} cent_id but "
            f"residual_ivf_dir={'set' if residual_ivf_dir else 'None'} — "
            "query a residual-encoded index with the build's ivf dir"
        )
    scored = codes.crossJoin(F.broadcast(lut))
    if exclude_matching_ids:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    adc_sum = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"), lambda c, l: F.element_at(l, c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if residual_ivf_dir is not None:
        cent = _read_centroids(spark, residual_ivf_dir)
        qc = (
            q.crossJoin(F.broadcast(cent))
            .select(
                "query_id",
                "cent_id",
                _dot(F.col("embedding"), F.col("ct_emb")).alias("qc_dot"),
            )
        )
        scored = scored.join(F.broadcast(qc), ["query_id", "cent_id"])
        numerator = F.col("qc_dot") + adc_sum
    else:
        numerator = adc_sum
    scored = scored.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        (numerator / (F.col("q_norm") * F.col("norm"))).alias("acos"),
    )
    w_s = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("cand_id"))
    short = (
        scored.withColumn("srank", F.row_number().over(w_s))
        .filter(F.col("srank") <= shortlist)
    )
    if corpus_df is None:
        return (
            short.filter(F.col("srank") <= top_k)
            .select(
                "query_id", "cand_id", F.col("srank").alias("rank"),
                F.round("acos", 6).alias("cosine"),
            )
            .orderBy("query_id", "rank")
        )
    qv = q.select(
        F.col("query_id"), F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    cv = _with_norm(
        corpus_df.select(
            F.col(corpus_id_col).alias("cand_id"), F.col(vec_col).alias("embedding")
        )
    ).select("cand_id", F.col("embedding").alias("c_emb"), F.col("norm").alias("c_norm"))
    rescored = (
        short.select("query_id", "cand_id")
        .join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))).alias(
                "cos"
            ),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "cand_id", "rank", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )
