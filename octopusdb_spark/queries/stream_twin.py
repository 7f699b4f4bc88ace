"""Registry twin for the custom stateful-streaming operator.

``sessionize_stream`` (applyInPandasWithState, `streaming/stateful.py`) was
previously pytest-only; this module runs it as a REAL bounded stream inside
a registry query so the driver's DuckDB oracle hash-checks the closed
sessions — the hard correctness signal for the stateful operator, not just
a unit test.

Determinism strategy: one far-future sentinel event is appended per user,
so every real session closes via the GAP rule inside the batch (the
sentinel's own 1-event session stays open and is never emitted). That
removes any reliance on watermark-timeout timing across micro-batches: the
emitted rows are exactly the real sessions regardless of how the engine
schedules timeout batches. The whole source is written as a single parquet
file so the availableNow run processes it as one micro-batch (no
cross-batch watermark late-drops).

Oracle parity: the stream operator tracks event times as whole epoch
SECONDS (Arrow-friendly state), so the oracle applies the identical
truncated-second gap rule (floor(epoch_us/1e6) diffs >= 1800). Events in
the same truncated second can never open a session boundary (diff 0), so
tie order is irrelevant and the session partition is deterministic.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopusdb_spark.queries.common import NOW, t
from octopusdb_spark.streaming.stateful import dedup_stream, sessionize_stream

GAP_SECONDS = 1800
# far enough past every event (data ends 2024-01-30) to breach any gap
_SENTINEL_US = 4_102_444_800_000_000  # 2100-01-01T00:00:00Z in microseconds

@contextlib.contextmanager
def _bounded_state_partitions(spark: SparkSession, key_domain: int):
    """Scope the stateful-aggregation shuffle down for a streaming query
    whose state key domain is BOUNDED by construction (r16, guide §2.2/§2.4:
    fewer, larger partitions; state-store open/commit is a per-partition
    per-micro-batch fixed cost). The partition count is frozen into the
    query's checkpoint at first start, so it must be set before .start().

    Only valid when the domain does not grow with data size (e.g. the 256
    HLL registers): upstream stateless work keeps full scan parallelism and
    the partial aggregation reduces each task's output to <= key_domain
    rows before the exchange, so a small constant partition count is right
    at any input scale. Parameterised via SPARK_GRAFT_STREAM_STATE_PARTITIONS
    (default 8), clamped to the domain."""
    n = int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8"))
    n = max(1, min(n, key_domain))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _run_bounded(q) -> None:
    """Wait for an availableNow run to finish, loudly. A silent timeout
    would hand a partial/empty memory-sink table to the correctness gate
    (misread as a semantics failure) and let the finally-block delete the
    parquet source out from under the still-running stream."""
    try:
        if not q.awaitTermination(300):
            raise RuntimeError("bounded stream did not finish within 300 s")
    finally:
        if q.isActive:
            q.stop()




def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session counts computed BY THE STREAMING OPERATOR: events
    (+ per-user sentinel) -> file stream -> sessionize_stream -> memory
    sink -> aggregate closed sessions. Matches the batch lag+cumsum
    sessionizer under the truncated-second gap rule."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.timestamp_micros("ts_us").alias("ts"),
    )
    sentinels = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(0.0).alias("value"),
            F.timestamp_micros(F.lit(_SENTINEL_US)).alias("ts"),
        )
    )
    run_id = uuid.uuid4().hex[:12]
    src = tempfile.mkdtemp(prefix=f"stream_twin_{run_id}_")
    try:
        # single part file => single availableNow micro-batch
        ev.unionByName(sentinels).coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "user_id long, value double, ts timestamp"
        ).parquet(src)
        name = f"stream_sessionize_{run_id}"
        q = (
            sessionize_stream(stream, gap_seconds=GAP_SECONDS, watermark_delay="10 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        sessions = spark.table(name)
        # memory-sink table: bounded rows (one per closed session); pull them
        # into a concrete frame so the result outlives the tmp source dir
        out = (
            sessions.groupBy("user_id")
            .agg(
                F.count("*").alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
            .orderBy("user_id")
        )
        result = spark.createDataFrame(
            out.collect(), "user_id long, n_sessions long, n_events long"
        )
        spark.catalog.dropTempView(name)  # free the memory-sink rows
        return result
    finally:
        shutil.rmtree(src, ignore_errors=True)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup computed BY THE STREAMING OPERATOR
    (dropDuplicatesWithinWatermark, `streaming/stateful.py::dedup_stream`):
    events -> file stream -> first-arrival-wins per (user_id, event_type)
    -> memory sink -> per-type distinct-user counts. WHICH duplicate wins
    is processing-order-dependent, so the checked output is the surviving
    key set (cardinality per event_type) — exactly the operator's
    contract, and deterministic. Single part file => one micro-batch => no
    cross-batch watermark drops."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.timestamp_micros("ts_us").alias("ts")
    )
    run_id = uuid.uuid4().hex[:12]
    src = tempfile.mkdtemp(prefix=f"stream_dedup_{run_id}_")
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "user_id long, event_type string, ts timestamp"
        ).parquet(src)
        name = f"stream_dedup_{run_id}"
        q = (
            dedup_stream(stream, ["user_id", "event_type"], watermark_delay="10 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        out = (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_distinct_users"))
            .orderBy("event_type")
        )
        result = spark.createDataFrame(
            out.collect(), "event_type string, n_distinct_users long"
        )
        spark.catalog.dropTempView(name)  # free the memory-sink rows
        return result
    finally:
        shutil.rmtree(src, ignore_errors=True)


ROLLUP_BUCKET_SECONDS = 86_400  # daily buckets


def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance run FOR REAL: events -> file stream
    -> foreachBatch merge into a ContinuousRollup (atomic manifest
    snapshots, idempotent per batch id) -> read the materialized table.
    Sums accumulate in DECIMAL(38,6) inside the rollup, so the maintained
    value is bit-identical to the oracle's direct decimal aggregation no
    matter how the stream was batched; min/max/count merge losslessly."""
    ev = t(spark, sf_dir, "events").select(
        "ts_us", "event_type", F.col("value").cast("double").alias("value")
    )
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_rollup_{run_id}_")
    try:
        src = f"{base}/src"
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            "ts_us long, event_type string, value double"
        ).parquet(src)
        from octopusdb_spark.streaming.rollup import (
            ContinuousRollup,
            maintain_rollup_stream,
        )

        roll = ContinuousRollup(
            spark, f"{base}/rollup", bucket_seconds=ROLLUP_BUCKET_SECONDS
        )
        q = maintain_rollup_stream(stream, roll, f"{base}/ckpt")
        _run_bounded(q)
        out = roll.table().orderBy("bucket", "grp")
        return spark.createDataFrame(
            out.collect(),
            "bucket long, grp string, n_events long, total_value double,"
            " min_value double, max_value double",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join run FOR REAL: views ⋈ clicks per user
    where the click lands within 10 minutes after the view
    (`streaming/joins.py::interval_join_streams`, watermark-bounded state).
    Both sides are bounded file streams processed under availableNow; the
    inner join's match set is deterministic, emitted as epoch-microsecond
    pairs for exact cross-engine compare."""
    ev = t(spark, sf_dir, "events")
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_ij_{run_id}_")
    try:
        ev.filter(F.col("event_type") == "view").select(
            "user_id", F.timestamp_micros("ts_us").alias("l_ts")
        ).coalesce(1).write.parquet(f"{base}/views")
        ev.filter(F.col("event_type") == "click").select(
            "user_id", F.timestamp_micros("ts_us").alias("r_ts")
        ).coalesce(1).write.parquet(f"{base}/clicks")
        left = spark.readStream.schema("user_id long, l_ts timestamp").parquet(
            f"{base}/views"
        )
        right = spark.readStream.schema("user_id long, r_ts timestamp").parquet(
            f"{base}/clicks"
        )
        from octopusdb_spark.streaming.joins import interval_join_streams

        joined = interval_join_streams(
            left, right, key="user_id", within="10 minutes", watermark="10 minutes"
        )
        name = f"stream_ij_{run_id}"
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        out = (
            spark.table(name)
            .select(
                "user_id",
                F.unix_micros("l_ts").alias("l_us"),
                F.unix_micros("r_ts").alias("r_us"),
            )
            .orderBy("user_id", "l_us", "r_us")
        )
        result = spark.createDataFrame(
            out.collect(), "user_id long, l_us long, r_us long"
        )
        spark.catalog.dropTempView(name)  # free the memory-sink rows
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_kv_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KV ingest run FOR REAL — the write path of the reference's
    channel-fed batch pipeline (`kv/db.go:224-285`) as a Structured
    Streaming job: documents -> 4-file parquet source -> file stream
    (maxFilesPerTrigger=1, so four micro-batches) -> foreachBatch ->
    ``KVStore.ingest_df(commit_tag=...)`` (`streaming/ingest.py`), each
    batch one atomic segment-append + manifest commit, with a maintenance
    tick (leveled compaction + value GC) every second batch. Every
    ingest-path behavior rides the stream: doc_id % 37 == 0 rows carry
    NULL values and become tombstones; texts >= the 1024-byte threshold
    are value-separated and re-joined on read; TTL rides ``expires_col``
    (the reference's expiry-at-write contract, `kv/utils/entry.go:77-80`,
    through the batched write path `kv/db.go:224-285`) — doc_id % 23 == 0
    rows expire BEFORE the checked read time (absent from the view),
    doc_id % 5 == 0 rows carry a far-future TTL (present), the rest no
    TTL.

    Exactly-once is ASSERTED in-query: after the stream drains, a batch id
    already recorded in the manifest is replayed via ``ingest_df`` — it
    must commit nothing and leave the live view's key count unchanged
    (the `ManifestState.stream_commits` idempotency contract).

    The checked output is the live view (key + reconstructed value
    length): unique keys make it independent of micro-batch seq stamping,
    so the feed order the engine picks cannot move the hash."""
    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"),
        F.when(F.col("doc_id") % 37 == 0, F.lit(None))
        .otherwise(F.col("text"))
        .cast("binary")
        .alias("value"),
        F.when(F.col("doc_id") % 23 == 0, F.lit(NOW - 5))
        .when(F.col("doc_id") % 5 == 0, F.lit(NOW + 100_000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("expires_at"),
    )
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_kv_{run_id}_")
    try:
        src = f"{base}/src"
        ckpt = f"{base}/ckpt"
        docs.repartitionByRange(4, "key").write.parquet(src)
        from octopusdb_spark.kv.store import KVStore
        from octopusdb_spark.streaming.ingest import ingest_stream_to_kv

        store = KVStore(spark, f"{base}/kv")
        stream = (
            spark.readStream.schema("key string, value binary, expires_at long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ingest_stream_to_kv(
            stream, store, ckpt, expires_col="expires_at", compact_every=2
        )
        _run_bounded(q)
        before = store.view(now=NOW).count()
        # replay a committed batch id: the manifest's stream_commits gate
        # must turn the duplicate into a no-op (exactly-once contract)
        replayed = store.ingest_df(
            docs.limit(32), key_col="key", value_col="value", commit_tag=(ckpt, 0)
        )
        if replayed != 0 or store.view(now=NOW).count() != before:
            raise RuntimeError(
                f"replayed batch was not idempotent: rows={replayed}"
            )
        out = (
            store.view(now=NOW)
            .select(
                "key",
                F.length(F.col("value").cast("string")).alias("value_chars"),
            )
            .orderBy("key")
        )
        # bounded rows (one per live doc); concrete frame so the result
        # outlives the tmp store dir
        return spark.createDataFrame(out.collect(), "key string, value_chars int")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_kv_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static KV enrichment run FOR REAL — the dimension-lookup
    pattern (`streaming/joins.py::enrich_stream_with_kv`): user profiles
    land in a KV store (user ids 0..99, deleted when id % 10 == 0), then
    the events table rides a file stream and every event picks up the
    store's live value for its user — tombstoned/absent keys enrich to
    NULL, exactly like a left lookup against the reference's Get path
    (`kv/db.go:89-130`) per event. The checked output aggregates per
    enrichment status so the result is independent of stream batching."""
    from octopusdb_spark.kv.store import Entry, KVStore
    from octopusdb_spark.streaming.joins import enrich_stream_with_kv

    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_enrich_{run_id}_")
    try:
        store = KVStore(spark, f"{base}/kv", key_type="string")
        store.set_batch(
            [Entry(str(u), f"profile-{u}".encode()) for u in range(100)]
        )
        # one tombstone batch (one commit, one L0 segment) — not a per-key
        # delete() loop, which would leave 10 one-row segments in the view
        store.set_batch([Entry(str(u), None) for u in range(0, 100, 10)])
        src = f"{base}/src"
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("event_id long, user_id long").parquet(src)
        keyed = stream.withColumn("key", F.col("user_id").cast("string"))
        enriched = enrich_stream_with_kv(keyed, store, key_col="key", now=NOW)
        name = f"stream_enrich_{run_id}"
        q = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        out = (
            spark.table(name)
            .select(
                "user_id",
                F.col("kv_value").isNotNull().alias("enriched"),
                F.length(F.col("kv_value").cast("string")).alias("value_chars"),
            )
            .groupBy("enriched")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(F.coalesce("value_chars", F.lit(0))).alias("total_chars"),
            )
            .orderBy("enriched")
        )
        result = spark.createDataFrame(
            out.collect(),
            "enriched boolean, n_events long, n_users long, total_chars long",
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_lm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online LM quality filtering at ingest — the perplexity-filter stage
    (`text_lm_score`) run against ARRIVING documents: the char-bigram
    model trains on the static corpus (the same compressed-pairs frame
    the batch query reads), its 64 (bigram, count) rows collapse into a
    bounded map literal (driver collect of a fixed-size model — the
    production shape: a trained scorer ships to every executor), and
    each arriving doc (doc_id % 7 == 0) is scored by ONE stateless
    per-row expression — transform to bigrams, aggregate over the map —
    no streaming aggregation, no state, no Python. The checked output is
    the per-arrival score row, identical columns and constants to the
    batch scorer, so stream and batch filtering agree by construction.

    100 TB shape: the hot path is a map-only projection per micro-batch
    with an O(|charset|^2)-bounded broadcast-equivalent literal; the sink
    is the arrival subset."""
    from octopusdb_spark.queries.text import lm_model

    # bounded: <= LM_TOP_K rows by construction (the shared model builder)
    model_rows = lm_model(spark, sf_dir).collect()
    kv_pairs: list = []
    for r in model_rows:
        kv_pairs.extend([F.lit(r["b"]), F.lit(int(r["cnt"]))])
    model_map = F.create_map(*kv_pairs)
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_lm_{run_id}_")
    try:
        arrivals = (
            t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 7 == 0)
            .select("doc_id", "text")
        )
        src = f"{base}/src"
        arrivals.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        b_arr = F.expr(
            """CASE WHEN length(lower(text)) >= 2
                    THEN transform(sequence(1, length(lower(text)) - 1),
                                   i -> substring(lower(text), i, 2))
                    ELSE array() END"""
        )
        n = F.size(b_arr)
        looked = F.transform(b_arr, lambda x: F.element_at(model_map, x))
        oov = F.size(F.filter(looked, lambda c: c.isNull()))
        fam = F.aggregate(
            looked, F.lit(0).cast("long"), lambda acc, c: acc + F.coalesce(c, F.lit(0))
        )
        in_model = n - oov
        oov_ratio = F.round(oov.cast("double") / n, 6)
        scored = stream.select(
            "doc_id",
            n.cast("long").alias("n_bigrams"),
            F.coalesce(oov_ratio, F.lit(0.0)).alias("oov_ratio"),
            F.when(in_model > 0, F.round(fam.cast("double") / in_model, 6))
            .otherwise(0.0)
            .alias("avg_model_count"),
            F.when(F.coalesce(oov_ratio, F.lit(0.0)) > 0.35, 1)
            .otherwise(0)
            .alias("low_quality"),
        )
        name = f"stream_lm_{run_id}"
        q = (
            scored.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        rows = spark.table(name).orderBy("doc_id").collect()
        result = spark.createDataFrame(
            rows,
            "doc_id long, n_bigrams long, oov_ratio double, "
            "avg_model_count double, low_quality int",
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online near-dup rejection at ingest — the filter a continuously
    crawled corpus runs BEFORE documents enter the store: arriving docs
    (doc_id % 5 == 0) ride a file stream, their MinHash band signatures
    are computed in-stream as pure per-row array expressions (shingle →
    hash → per-band min — no streaming aggregation, so the hot path is a
    stateless projection), and a stream-static LEFT SEMI join against the
    static corpus's banded signature index (doc_id % 5 != 0, the batch
    `minhash_bands` output, checkpointed once) surfaces every colliding
    band. A doc colliding on ANY band is rejected — identical banding,
    hashes, and constants as `dedup_minhash_lsh`, so stream and batch
    dedup agree by construction. Checked output: per-source
    arrivals/rejected/accepted counts (batching-independent).

    100 TB shape: the stream side is map-only per micro-batch; the static
    index is the banded LSH table (one row per (doc, band)), the join is
    a band-bucket equi-join bounded like every LSH join here, and the
    final count rides the tiny sink. No all-pairs anything."""
    from octopusdb_spark.queries.dedup import (
        _SHINGLES_SPARK,
        MINHASH_AB,
        MINHASH_P,
        N_BANDS,
        _ROWS_PER_BAND,
        minhash_bands,
    )

    docs = t(spark, sf_dir, "documents")
    static_bands = (
        minhash_bands(spark, sf_dir)
        .filter(F.col("doc_id") % 5 != 0)
        .localCheckpoint(eager=True)
    )
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_ingest_dedup_{run_id}_")
    try:
        arrivals = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
        src = f"{base}/src"
        arrivals.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        # per-row MinHash: same shingles, same 28-bit hash, same (a,b)
        # chains as the batch path — array_min over a transform instead of
        # a groupBy min, because a stream projection must stay stateless
        sh = F.array_distinct(F.expr(_SHINGLES_SPARK))
        hs = F.transform(
            sh, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
        )
        mins = [
            F.array_min(
                F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
        sigs = stream.withColumn("ws", F.split("text", " ")).select("doc_id", *mins)
        sig_cols = [
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{j}").cast("string")
                        for j in range(band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND)
                    ],
                )
            ).alias(f"sig{band}")
            for band in range(N_BANDS)
        ]
        stack_args = ", ".join(f"{band}, sig{band}" for band in range(N_BANDS))
        banded = sigs.select("doc_id", *sig_cols).select(
            "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
        )
        collisions = banded.join(static_bands, ["band", "sig"], "left_semi")
        name = f"stream_ingest_dedup_{run_id}"
        q = (
            collisions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        rejected = spark.table(name).select("doc_id").distinct()
        out = (
            arrivals.join(rejected.withColumn("rej", F.lit(1)), "doc_id", "left")
            .join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(
                F.count("*").alias("n_arrivals"),
                F.count("rej").alias("n_rejected"),
                (F.count("*") - F.count("rej")).alias("n_accepted"),
            )
            .orderBy("source")
        )
        result = spark.createDataFrame(
            out.collect(),
            "source string, n_arrivals long, n_rejected long, n_accepted long",
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        static_bands.unpersist()
        shutil.rmtree(base, ignore_errors=True)


def q_stream_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online IMAGE near-dup rejection at ingest (r15; UPDATABLE index
    r16) — the perceptual sibling of `stream_dedup_ingest`: arriving
    images (doc_id % 5 == 0, brightness-shifted +40 so the invariance
    is part of what's tested) ride a file stream; each payload is
    decoded and dHashed INSIDE the stream via the same Arrow-batched
    mapInPandas lane the batch row uses, exploded into the 4 x 16-bit
    bands, and — per VERDICT r15 #6 — joined in foreachBatch against a
    parquet-backed band index that STARTS as the static corpus
    (doc_id % 5 != 0) and GROWS: every micro-batch appends its observed
    arrival hashes, so a dup of an EARLIER ARRIVAL is rejected too
    (the frozen-parameter append pattern of `functions/ann_index.py`,
    here for the perceptual index). Arrival patterns are keyed by
    (doc_id % 30) // 5, making arrivals d and d+30 brightness-twin
    PAIRS that only the updated index can catch; the arrival files are
    split < 30 / >= 30 with ordered mtimes + maxFilesPerTrigger=1 so
    the twins genuinely cross a batch boundary. The rejection rule is
    batching-independent by construction: an arrival is rejected iff
    it hamming<=3-matches the static corpus OR any SMALLER-doc_id
    arrival — earlier batches live in the index, same-batch earlier
    ids via the in-batch banded self-join — so any batching yields the
    same verdicts. Same hashes, bands, and threshold as the batch row.
    Checked output: per-source arrivals/rejected/accepted counts.

    100 TB shape: decode+hash is map-only per micro-batch; the index
    is one parquet row per (image, band), appended not rewritten; the
    joins are band-bucket equi-joins. No all-pairs anything."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    from octopusdb_spark.functions.image_hash import image_hashes, pattern_rgb
    from octopusdb_spark.functions.multimodal import encode_ppm

    media_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def build_static(it):
        for pdf in it:
            ids, payloads = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                ids.append(int(did))
                payloads.append(encode_ppm(pattern_rgb(
                    b[0] % 5 + 1, b[1] % 5 + 1, b[2] % 3 + 1,
                    int(did) % 97, delta=0,
                ), 72, 64))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    def build_arrivals(it):
        for pdf in it:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                vg = (d % 30) // 5  # twin key: arrivals d and d+30 share it
                ids.append(d)
                payloads.append(encode_ppm(pattern_rgb(
                    vg % 23 + 1, (vg * 7) % 19 + 1, vg % 3 + 1,
                    (vg * 31) % 97, delta=40,
                ), 72, 64))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    docs = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select("doc_id", "text", "source")
    )
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            F.shiftrightunsigned(F.col("dhash"), 16 * j)
            .bitwiseAND(F.lit(65535)).alias("bval"),
        )
        for j in range(4)
    ]

    def banded(hashed):
        return (
            hashed.filter(F.col("decoded"))
            .select(
                F.col("media_id").alias("doc_id"), "dhash",
                F.explode(F.array(*band_cols)).alias("bb"),
            )
            .select("doc_id", "dhash", "bb.band", "bb.bval")
        )

    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_image_dedup_{run_id}_")
    index_dir = f"{base}/index"
    rej_dir = f"{base}/rejected"
    try:
        # seed the updatable index with the static corpus's bands
        banded(
            image_hashes(
                docs.filter(F.col("doc_id") % 5 != 0)
                .select("doc_id", "text")
                .repartition(8, "doc_id")
                .mapInPandas(build_static, media_schema)
            )
        ).select(
            F.col("dhash").alias("s_dhash"), "band", "bval"
        ).write.parquet(index_dir)
        spark.createDataFrame([], "doc_id long").write.parquet(rej_dir)

        arrivals = docs.filter(F.col("doc_id") % 5 == 0)
        src = f"{base}/src"
        # two arrival files with ordered mtimes: the < 30 originals land
        # a batch BEFORE their >= 30 twins, so twin rejection requires
        # the between-batch index append to actually work
        arrivals.filter(F.col("doc_id") < 30).select("doc_id") \
            .coalesce(1).write.mode("append").parquet(src)
        first_files = {
            f for f in os.listdir(src) if f.endswith(".parquet")
        }
        arrivals.filter(F.col("doc_id") >= 30).select("doc_id") \
            .coalesce(1).write.mode("append").parquet(src)
        now = int(os.stat(src).st_mtime)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                early = f in first_files
                os.utime(f"{src}/{f}", (now - 60, now - 60 if early else now))

        stream = image_hashes(
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1).parquet(src)
            .mapInPandas(build_arrivals, media_schema)
        ).filter(F.col("decoded")).select("media_id", "dhash", "decoded")

        def process(batch_df, _batch_id):
            bands = banded(batch_df).localCheckpoint(eager=True)
            idx = spark.read.parquet(index_dir)
            hit_index = (
                bands.join(idx, ["band", "bval"])
                .filter(F.bit_count(
                    F.col("dhash").bitwiseXOR(F.col("s_dhash"))) <= 3)
                .select("doc_id")
            )
            a, b = bands.alias("a"), bands.alias("b")
            hit_earlier = (
                a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bval") == F.col("b.bval"))
                       & (F.col("a.doc_id") > F.col("b.doc_id")))
                .filter(F.bit_count(
                    F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))) <= 3)
                .select(F.col("a.doc_id").alias("doc_id"))
            )
            hit_index.unionByName(hit_earlier).distinct() \
                .write.mode("append").parquet(rej_dir)
            # the index UPDATE: this batch's observed hashes join it
            bands.select(F.col("dhash").alias("s_dhash"), "band", "bval") \
                .write.mode("append").parquet(index_dir)

        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        rejected = spark.read.parquet(rej_dir).distinct()
        out = (
            arrivals.join(
                rejected.withColumn("rej", F.lit(1)), "doc_id", "left"
            )
            .groupBy("source")
            .agg(
                F.count("*").alias("n_arrivals"),
                F.count("rej").alias("n_rejected"),
                (F.count("*") - F.count("rej")).alias("n_accepted"),
            )
            .orderBy("source")
        )
        result = spark.createDataFrame(
            out.collect(),
            "source string, n_arrivals long, n_rejected long, n_accepted long",
        )
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_semantic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online SEMANTIC near-dup rejection at ingest — `dedup_semantic`'s
    SemDeDup rule run as a stream filter, the embedding-space sibling of
    `stream_dedup_ingest`: arriving vectors (vec_id % 5 == 0) ride a file
    stream; each is assigned to its nearest TRAINED centroid as a pure
    per-row expression (the K-row quantizer collapses to literal arrays —
    K*dim doubles — so the hot path stays a STATELESS projection: no
    streaming aggregation, no state store), then a stream-static LEFT
    SEMI join against the static corpus (vec_id % 5 != 0, same
    assignment, checkpointed once) rejects any arrival with a
    cluster-mate at cosine >= SEMDEDUP_THRESH. Same centroids, same
    sequential-order dot, same threshold as the batch query, so stream
    and batch semantic dedup agree by construction. Checked output:
    per-label arrivals/rejected/accepted counts (batching-independent).

    100 TB shape: assignment is map-only per micro-batch (the quantizer
    is a broadcast-sized literal by design — that is what a COARSE
    quantizer is for); the semi join is cent_id-keyed against the static
    index, so candidate pairs are bounded by cluster granularity exactly
    like the batch path. No all-pairs, no stream state."""
    from octopusdb_spark.queries.similarity import (
        SEMDEDUP_THRESH,
        _dot,
        _with_norm,
        assign_centroids,
        trained_ivf_centroids,
    )

    emb = _with_norm(t(spark, sf_dir, "embeddings"))
    cent = trained_ivf_centroids(spark, sf_dir)
    # assignment via max_by agg (r16, guide §2.3/§2.4); the corpus-split
    # filter moves BEFORE assignment — per-vector assignment is independent,
    # so the filtered result is row-identical and the discarded split never
    # crosses the exchange
    static_idx = (
        assign_centroids(
            emb.filter(F.col("vec_id") % 5 != 0), cent, keep=("embedding", "norm")
        )
        .select(
            F.col("cent_id").alias("s_cent"),
            F.col("embedding").alias("s_emb"),
            F.col("norm").alias("s_norm"),
        )
        .localCheckpoint(eager=True)
    )
    # K rows -> driver literals: the stateless in-stream quantizer. Sorted
    # by cent_id so array_position's first-occurrence rule reproduces the
    # batch tie-break (cos DESC, cent_id ASC) bit-for-bit.
    crows = sorted(cent.collect(), key=lambda r: r["cent_id"])
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_semfilter_{run_id}_")
    try:
        arrivals = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
        src = f"{base}/src"
        arrivals.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            t(spark, sf_dir, "embeddings").select("vec_id", "embedding").schema
        ).parquet(src)
        norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        coss = F.array(
            *[
                _dot(
                    F.col("embedding"),
                    F.array(*[F.lit(float(x)) for x in r["ct_emb"]]),
                )
                / (F.col("norm") * F.lit(float(r["ct_norm"])))
                for r in crows
            ]
        )
        cent_ids = F.array(*[F.lit(int(r["cent_id"])) for r in crows])
        assigned = (
            stream.withColumn("norm", norm)
            .withColumn("coss", coss)
            .withColumn(
                "cent_id",
                F.element_at(cent_ids, F.array_position(F.col("coss"), F.array_max("coss")).cast("int")),
            )
            .select("vec_id", "cent_id", "embedding", "norm")
        )
        sim = _dot(F.col("embedding"), F.col("s_emb")) / (F.col("norm") * F.col("s_norm"))
        collisions = assigned.join(
            static_idx,
            (F.col("cent_id") == F.col("s_cent")) & (sim >= F.lit(SEMDEDUP_THRESH)),
            "left_semi",
        )
        name = f"stream_semfilter_{run_id}"
        q = (
            collisions.select("vec_id").writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        rejected = spark.table(name).select("vec_id").distinct()
        out = (
            arrivals.join(rejected.withColumn("rej", F.lit(1)), "vec_id", "left")
            .join(emb.select("vec_id", "label"), "vec_id")
            .groupBy("label")
            .agg(
                F.count("*").alias("n_arrivals"),
                F.count("rej").alias("n_rejected"),
                (F.count("*") - F.count("rej")).alias("n_accepted"),
            )
            .orderBy("label")
        )
        result = spark.createDataFrame(
            out.collect(),
            "label int, n_arrivals long, n_rejected long, n_accepted long",
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        static_idx.unpersist()
        shutil.rmtree(base, ignore_errors=True)


def _stream_semantic_filter_sql() -> str:
    """DuckDB twin of `q_stream_semantic_filter`: the SQL-replicated Lloyd
    training + assignment from `dedup_semantic`'s oracle, arrivals split
    by the streaming mod rule, rejection = exists a static cluster-mate
    at/above the threshold, counts by label."""
    from octopusdb_spark.queries.similarity import (
        _DOT_SQL,
        _EMB_NORM_SQL,
        _kmeans_cte_sql,
        KMEANS_ITERS,
        SEMDEDUP_THRESH,
    )

    return (
        _EMB_NORM_SQL
        + _kmeans_cte_sql()
        + f"""
    , assign_scored AS (
      SELECT e.vec_id, c.cent_id,
             {_DOT_SQL.format(a="e.embedding", b="c.ct_emb")} / (e.norm * c.ct_norm) AS cos
      FROM emb e CROSS JOIN cent{KMEANS_ITERS} c
    ), assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rn
        FROM assign_scored) WHERE rn = 1
    ), arrivals AS (
      SELECT vec_id, cent_id FROM assigned WHERE vec_id % 5 = 0
    ), statics AS (
      SELECT vec_id, cent_id FROM assigned WHERE vec_id % 5 != 0
    ), rejected AS (
      SELECT DISTINCT r.vec_id
      FROM arrivals r
      JOIN statics s ON s.cent_id = r.cent_id
      JOIN emb ea ON ea.vec_id = r.vec_id
      JOIN emb es ON es.vec_id = s.vec_id
      WHERE {_DOT_SQL.format(a="ea.embedding", b="es.embedding")} / (ea.norm * es.norm)
            >= {SEMDEDUP_THRESH}
    )
    SELECT e.label,
           count(*) AS n_arrivals,
           count(j.vec_id) AS n_rejected,
           count(*) - count(j.vec_id) AS n_accepted
    FROM arrivals r
    JOIN emb e ON e.vec_id = r.vec_id
    LEFT JOIN rejected j ON j.vec_id = r.vec_id
    GROUP BY e.label
    ORDER BY e.label"""
    )


def _stream_dedup_ingest_sql() -> str:
    """Batch twin of the streaming near-dup filter: the identical shingle →
    hash → banded-minhash chain as dedup_minhash_lsh's oracle, split into
    arrivals (doc_id % 5 = 0) vs static, rejected = any shared band."""
    from octopusdb_spark.queries.dedup import (
        _ROWS_PER_BAND,
        MINHASH_AB,
        MINHASH_P,
        N_BANDS,
        SHINGLES_SQL,
    )

    mins = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    bands = " UNION ALL ".join(
        "SELECT doc_id, %d AS band, md5(%s) AS sig FROM mins"
        % (
            band,
            " || ',' || ".join(
                f"CAST(m{j} AS VARCHAR)"
                for j in range(band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND)
            ),
        )
        for band in range(N_BANDS)
    )
    return (
        SHINGLES_SQL
        + f"""
    , hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT) AS h FROM sh
    ),
    mins AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    bands AS ({bands}),
    coll AS (
      SELECT DISTINCT a.doc_id
      FROM bands a JOIN bands s ON a.band = s.band AND a.sig = s.sig
      WHERE a.doc_id % 5 = 0 AND s.doc_id % 5 != 0
    )
    SELECT d.source,
           count(*) AS n_arrivals,
           count(c.doc_id) AS n_rejected,
           count(*) - count(c.doc_id) AS n_accepted
    FROM documents d LEFT JOIN coll c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 5 = 0
    GROUP BY d.source ORDER BY d.source"""
    )


def q_stream_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous crawl ingest — the WARC source (`sources/warc.py`) run
    as a REAL bounded stream under the gate: documents are packed into
    WARC segments in batch (16 records each, odd segments in the
    per-record-gzip .warc.gz layout — the same builder as the batch row
    `source_warc_ingest`), the segment files arrive as a file stream, and
    `read_warc` — a stateless mapInPandas, the SAME operator as batch —
    explodes each arriving segment into records whose URI-embedded ids,
    Content-Length framing, and content digests the oracle hash-checks.
    No state store, no watermark: parsing is per-segment pure, so
    stream ingest and batch ingest agree row-for-row by construction.

    100 TB shape: the production pipeline tails a crawl bucket with this
    exact plan — file-arrival parallelism across segments, per-record
    explode inside the Arrow batch, one output row per record."""
    from octopusdb_spark.queries.multimodal import (
        warc_document_segments,
        warc_record_report,
    )
    from octopusdb_spark.sources.warc import read_warc

    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_warc_{run_id}_")
    try:
        src = f"{base}/src"
        # the SAME segment builder as the batch row — the shared oracle's
        # agree-by-construction guarantee is structural, not copy-paste
        warc_document_segments(spark, sf_dir).write.parquet(src)
        stream = spark.readStream.schema("source_id long, payload binary").parquet(
            src
        )
        records = warc_record_report(read_warc(stream))
        name = f"stream_warc_{run_id}"
        q = (
            records.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        rows = spark.table(name).orderBy("doc_id").collect()
        result = spark.createDataFrame(
            rows, "doc_id long, warc_type string, content_len long, digest string"
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_warc_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted re-crawl as a CONTINUOUS pipeline: CDX hit rows arrive as
    a 3-file stream (maxFilesPerTrigger=1 -> three micro-batches), each
    micro-batch stream-static inner-joins to the STATIC segment blobs
    (only segments with hits are touched), and `read_warc_cdx_rows`
    slices + parses exactly the addressed byte ranges — a stateless
    per-row mapInPandas, append mode, no watermark. Same builder, same
    selection, same slicing primitive as the batch row
    (`source_warc_cdx`), so the two share ONE oracle by construction;
    the stream twin proves the random-access path runs under Structured
    Streaming unchanged (the production tail-the-index shape)."""
    from octopusdb_spark.queries.multimodal import (
        warc_cdx_segments,
        warc_cdx_selection,
    )
    from octopusdb_spark.sources.warc import read_warc_cdx_rows

    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_cdx_{run_id}_")
    try:
        seg = warc_cdx_segments(spark, sf_dir)
        blobs = seg.select("source_id", "payload")
        src = f"{base}/src"
        warc_cdx_selection(seg).repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(
                "source_id long, uri string, offset long, length long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        recs = read_warc_cdx_rows(stream.join(blobs, "source_id"))
        report = recs.select(
            F.split("target_uri", ":").getItem(1).cast("long").alias("doc_id"),
            "offset",
            "length",
            F.length("content").cast("long").alias("content_len"),
            F.md5("content").alias("digest"),
        )
        name = f"stream_cdx_{run_id}"
        q = (
            report.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_bounded(q)
        rows = spark.table(name).orderBy("doc_id").collect()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(
            rows,
            "doc_id long, offset long, length long, content_len long,"
            " digest string",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality via MERGEABLE HLL registers — the production
    shape for distinct counts over an unbounded stream: documents arrive
    as a 3-file stream processed as three micro-batches
    (maxFilesPerTrigger=1 under availableNow), the stateless md5
    bucket/rho projection (`advanced.hll_parts`, the SAME expression as
    the batch row) feeds a streaming groupBy(bucket).max — 256 rows of
    state REGARDLESS of stream length, complete-mode memory sink — and
    the final registers fold through the SAME `hll_report` as
    `q_hll_sketch`. Register max is commutative/associative, so the
    merged sketch is bit-identical to the batch sketch no matter how the
    stream was batched: stream and batch share ONE oracle by
    construction. (exact_distinct in the report is the batch reference
    count — the yardstick column, not stream state.)"""
    from octopusdb_spark.queries.advanced import (
        hll_parts,
        hll_report,
        hll_tokens,
    )

    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_hll_{run_id}_")
    try:
        src = f"{base}/src"
        docs = t(spark, sf_dir, "documents").select("doc_id", "text")
        docs.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        regs = (
            hll_parts(hll_tokens(stream))
            .groupBy("bucket")
            .agg(F.max("rho").alias("reg"))
        )
        name = f"stream_hll_{run_id}"
        # state domain is 256 registers by construction -> small constant
        # state-partition count (r16; see _bounded_state_partitions)
        with _bounded_state_partitions(spark, key_domain=256):
            q = (
                regs.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", f"{base}/ckpt")
                .start()
            )
            _run_bounded(q)
        rows = spark.table(name).collect()
        spark.catalog.dropTempView(name)
        regs_df = spark.createDataFrame(
            [(int(r["bucket"]), int(r["reg"])) for r in rows],
            "bucket int, reg int",
        )
        exact = hll_tokens(t(spark, sf_dir, "documents")).agg(
            F.countDistinct("tok").alias("exact_distinct")
        )
        return hll_report(spark, regs_df, exact)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_kv_stream_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous replication run FOR REAL — streaming ingest into a
    primary with per-batch CDC shipping to a replica
    (`streaming/replicate.py::stream_ingest_with_replication`), the
    Spark-idiomatic stand-in for the reference's aspirational cluster
    layer (A25: raft dep + empty `cmd/main.go:3-4`; here: log shipping
    with a manifest-durable consumer checkpoint). Customer rows ride a
    3-file stream (c_custkey % 11 == 0 rows are NULL -> in-stream
    tombstones); each micro-batch lands in the primary and its changefeed
    interval applies to the replica in the same foreachBatch, with the
    replica's resume seq registered as a named HOLD on the primary.

    After the stream drains, a range delete [p000010, p000025) commits on
    the primary and a maintenance tick runs BEFORE the interval ships —
    the hold is what keeps the tombstone alive to ship (retirement
    before shipping would silently strand the replica). In-query
    assertions: the replica's live view equals the primary's exactly,
    and replaying the final shipped feed applies zero rows (idempotent
    per commit_tag). The checked output is the replica's live view."""
    from octopusdb_spark.kv.store import KVStore
    from octopusdb_spark.streaming.replicate import stream_ingest_with_replication

    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 60)
        .select(
            F.concat(
                F.lit("p"), F.lpad(F.col("c_custkey").cast("string"), 6, "0")
            ).alias("key"),
            F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
            .otherwise(F.col("c_name"))
            .cast("binary")
            .alias("value"),
        )
    )
    run_id = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"stream_repl_{run_id}_")
    try:
        src = f"{base}/src"
        ckpt = f"{base}/ckpt"
        cust.repartitionByRange(3, "key").write.parquet(src)
        primary = KVStore(spark, f"{base}/primary")
        replica = KVStore(spark, f"{base}/replica")
        primary.hold_snapshot("replica", 0)  # replicate from genesis
        stream = (
            spark.readStream.schema("key string, value binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_ingest_with_replication(
            stream, primary, replica, ckpt, holder="replica", now=NOW
        )
        _run_bounded(q)
        # a range delete + maintenance BEFORE the interval ships: the
        # resume-point hold must keep the tombstone alive to ship
        primary.delete_range(start="p000010", end="p000025")
        primary.maintenance_tick(now=NOW)
        if primary.info()["range_tombstones"] != 1:
            raise RuntimeError("held range tombstone retired before shipping")
        resume = int(primary.manifest.state.held_snapshots["replica"])
        feed = primary.changes_since(resume, now=NOW)
        replica.apply_changes(feed, commit_tag=(f"{ckpt}#final", 0))
        primary.hold_snapshot("replica", primary.snapshot_seq())
        plive = sorted(
            (r["key"], bytes(r["value"]).decode("utf-8"))
            for r in primary.view(now=NOW).collect()
        )
        rlive = sorted(
            (r["key"], bytes(r["value"]).decode("utf-8"))
            for r in replica.view(now=NOW).collect()
        )
        if plive != rlive:
            raise RuntimeError("replica diverged from primary after shipping")
        if replica.apply_changes(feed, commit_tag=(f"{ckpt}#final", 0)) != 0:
            raise RuntimeError("replayed final ship was not idempotent")
        return spark.createDataFrame(rlive, "key string, value string")
    finally:
        shutil.rmtree(base, ignore_errors=True)


ORACLES = {
    # identical to the batch row source_warc_ingest: the stream twin runs
    # the SAME parser over the SAME segments, so the oracle is shared
    "stream_warc_ingest": """
        SELECT doc_id, 'response' AS warc_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS content_len,
               md5(text) AS digest
        FROM documents WHERE doc_id < 120 ORDER BY doc_id""",
    "stream_lm_filter": """
        WITH d AS (SELECT doc_id, lower(text) AS txt FROM documents),
        ex AS (
          SELECT doc_id, substring(txt, CAST(i AS INT), 2) AS b
          FROM d, unnest(range(1, length(txt))) AS t(i)
        ),
        model AS (
          SELECT b, count(*) AS cnt FROM ex GROUP BY b
          ORDER BY cnt DESC, b ASC LIMIT 64
        ),
        aex AS (SELECT * FROM ex WHERE doc_id % 7 = 0),
        per AS (
          SELECT a.doc_id,
                 count(*) AS n_bigrams,
                 sum(CASE WHEN m.cnt IS NULL THEN 1 ELSE 0 END) AS oov,
                 sum(coalesce(m.cnt, 0)) AS fam
          FROM aex a LEFT JOIN model m USING (b)
          GROUP BY a.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               coalesce(round(CAST(p.oov AS DOUBLE) / p.n_bigrams, 6), 0.0)
                 AS oov_ratio,
               CASE WHEN coalesce(p.n_bigrams - p.oov, 0) > 0
                    THEN round(CAST(p.fam AS DOUBLE) / (p.n_bigrams - p.oov), 6)
                    ELSE 0.0 END AS avg_model_count,
               CASE WHEN coalesce(round(CAST(p.oov AS DOUBLE) / p.n_bigrams, 6),
                                  0.0) > 0.35
                    THEN 1 ELSE 0 END AS low_quality
        FROM d LEFT JOIN per p USING (doc_id)
        WHERE d.doc_id % 7 = 0
        ORDER BY d.doc_id""",
    "kv_stream_replication": """
        SELECT 'p' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS key,
               c_name AS value
        FROM customer
        WHERE c_custkey <= 60
          AND c_custkey % 11 != 0
          AND (c_custkey < 10 OR c_custkey >= 25)
        ORDER BY key""",
    "stream_dedup_ingest": _stream_dedup_ingest_sql(),
    "stream_semantic_filter": _stream_semantic_filter_sql(),
    "kv_stream_enrich": """
        WITH prof AS (
          SELECT u AS user_id, length('profile-' || CAST(u AS VARCHAR)) AS value_chars
          FROM unnest(range(0, 100)) AS t(u)
          WHERE u % 10 != 0
        ), e AS (
          SELECT ev.user_id, p.value_chars
          FROM events ev LEFT JOIN prof p ON ev.user_id = p.user_id
        )
        SELECT value_chars IS NOT NULL AS enriched,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               CAST(sum(coalesce(value_chars, 0)) AS BIGINT) AS total_chars
        FROM e GROUP BY 1 ORDER BY enriched""",
    "kv_stream_ingest": """
        SELECT CAST(doc_id AS VARCHAR) AS key,
               CAST(length(text) AS INT) AS value_chars
        FROM documents
        WHERE doc_id % 37 != 0   -- tombstoned on the stream
          AND doc_id % 23 != 0   -- stream-carried TTL expired before NOW
        ORDER BY key""",
    "q_stream_rollup": f"""
        SELECT (epoch_us(ts) // 1000000 // {ROLLUP_BUCKET_SECONDS}) * {ROLLUP_BUCKET_SECONDS} AS bucket,
               event_type AS grp,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events GROUP BY 1, 2 ORDER BY bucket, grp""",
    "q_stream_interval_join": """
        SELECT v.user_id, epoch_us(v.ts) AS l_us, epoch_us(c.ts) AS r_us
        FROM events v
        JOIN events c ON c.user_id = v.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
        ORDER BY v.user_id, l_us, r_us""",
    "q_stream_dedup": """
        SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
        FROM events GROUP BY event_type ORDER BY event_type""",
    # identical truncated-second gap rule as the stream's whole-second state
    "q_stream_sessionize": """
        WITH sec AS (
          SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s FROM events
        ), flagged AS (
          SELECT user_id,
                 CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w >= 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM sec
          WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
        )
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM flagged GROUP BY user_id ORDER BY user_id""",
}


# the streaming HLL merges to the bit-identical sketch (register max is
# order-insensitive), so it shares the batch row's oracle verbatim
from octopusdb_spark.queries.advanced import ORACLES as _ADVANCED_ORACLES  # noqa: E402

ORACLES["q_stream_hll"] = _ADVANCED_ORACLES["q_hll_sketch"]

# the CDX stream twin reads the same index rows against the same segments
# through the same slicing primitive — one oracle, by construction
from octopusdb_spark.queries.multimodal import ORACLES as _MM_ORACLES  # noqa: E402

ORACLES["stream_warc_cdx"] = _MM_ORACLES["source_warc_cdx"]

# the image stream twin shares the batch row's closed-form dHash chain
# (one SQL fragment, one Python constant — stream, batch, and oracle
# cannot drift); arrivals are +40 brightness shifts, so the invariance
# is itself under the hash: a wrong DCT/grid would change rejections
from octopusdb_spark.queries.dedup import _DHASH_CHAIN_SQL  # noqa: E402

ORACLES["stream_image_dedup"] = f"""
    WITH g AS (
      SELECT doc_id, source, ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    params AS (  -- arrivals (%5==0) are ((doc_id%30)//5)-keyed twin
                 -- pairs d / d+30; statics ride their text bytes
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS delta,
             CASE WHEN doc_id % 5 = 0
                  THEN ((doc_id % 30) // 5) % 23 + 1
                  ELSE b0 % 5 + 1 END AS ax,
             CASE WHEN doc_id % 5 = 0
                  THEN (((doc_id % 30) // 5) * 7) % 19 + 1
                  ELSE b1 % 5 + 1 END AS ay,
             CASE WHEN doc_id % 5 = 0
                  THEN ((doc_id % 30) // 5) % 3 + 1
                  ELSE b2 % 3 + 1 END AS k,
             CASE WHEN doc_id % 5 = 0
                  THEN (((doc_id % 30) // 5) * 31) % 97
                  ELSE doc_id % 97 END AS c
      FROM g
    ),
    {_DHASH_CHAIN_SQL.lstrip()},
    rejected AS (  -- reject on a static match OR any smaller-doc_id
                   -- arrival (the updatable-index semantics)
      SELECT DISTINCT a.media_id AS doc_id
      FROM dh a JOIN dh o
        ON a.media_id % 5 = 0
       AND (o.media_id % 5 != 0 OR o.media_id < a.media_id)
       AND bit_count(xor(a.dhash, o.dhash)) <= 3
    )
    SELECT g.source, count(*) AS n_arrivals,
           count(r.doc_id) AS n_rejected,
           count(*) - count(r.doc_id) AS n_accepted
    FROM g LEFT JOIN rejected r USING (doc_id)
    WHERE g.doc_id % 5 = 0
    GROUP BY g.source ORDER BY g.source"""

QUERIES = {
    "stream_image_dedup": q_stream_image_dedup,
    "stream_warc_ingest": q_stream_warc_ingest,
    "stream_warc_cdx": q_stream_warc_cdx,
    "q_stream_hll": q_stream_hll,
    "stream_lm_filter": q_stream_lm_filter,
    "kv_stream_replication": q_kv_stream_replication,
    "stream_dedup_ingest": q_stream_dedup_ingest,
    "stream_semantic_filter": q_stream_semantic_filter,
    "kv_stream_ingest": q_kv_stream_ingest,
    "kv_stream_enrich": q_kv_stream_enrich,
    "q_stream_sessionize": q_stream_sessionize,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_rollup": q_stream_rollup,
    "q_stream_interval_join": q_stream_interval_join,
}
