"""Structured Streaming ingest into the KV layout.

The reference has no streaming query model — its "stream" is the channel-fed
single-writer batch pipeline (`kv/db.go:224-285`, doWrites goroutine batching
up to 3×1000 requests). The Spark-native analog: a streaming source micro-
batched through ``foreachBatch``, each batch becoming one atomic
segment-append + manifest commit — identical durability contract, but with
Spark's exactly-once checkpointing on top.

Also provides the event-time windowed aggregation path (watermark + window)
that a 100 TB ingest pipeline runs alongside raw ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octopusdb_spark.kv.store import KVStore


def ingest_stream_to_kv(
    stream_df: DataFrame,
    store: KVStore,
    checkpoint_dir: str,
    key_col: str = "key",
    value_col: str = "value",
    expires_col: str | None = None,
    target_segments: int = 2,
    compact_every: int = 4,
    merge_col: str | None = None,
    cf: str | None = None,
):
    """Run a streaming DataFrame into the KV store: each micro-batch is one
    atomic segment-append + manifest commit (single-writer discipline
    preserved — the foreachBatch callback runs serially, like the
    reference's doWrites goroutine). Returns the StreamingQuery; caller
    awaits termination.

    Full batch-write-path parity (`kv/db.go:79-87`): the micro-batch goes
    through ``KVStore.ingest_df``, so big payloads are value-separated,
    NULL values become tombstones, and ``expires_col`` carries TTL —
    identical semantics to a ``set_batch``/``ingest_df`` of the same rows.

    Exactly-once: foreachBatch replays batches after failures; the commit
    is made idempotent by recording (checkpoint_dir, batch_id) in the
    manifest (`ManifestState.stream_commits`) and skipping batches already
    committed.

    Maintenance: every ``compact_every`` committed batches, run a full
    ``maintenance_tick`` — leveled compaction while over-trigger plus
    stats-driven value GC, the reference compacter + GC tickers
    (`kv/lsm/compact.go:65-85`, `kv/vlog_gc.go:17-46`) — so both L0 and
    value-log garbage stay bounded on a long-lived stream.

    ``merge_col`` names a boolean column marking merge-operand rows: the
    streaming counter-increment path (RocksDB ``Merge`` at ingest) — a
    flagged row appends a delta operand instead of a full value, O(1) per
    event with no read-modify-write in the hot loop; reads on a store
    opened with ``merge_op`` fold them, and ``maintenance_tick`` on a
    merge-opened store bounds the operand set via ``fold_merges``-style
    compaction retention. Within a micro-batch, per-key order follows row
    order exactly as in ``ingest_df``.

    ``cf`` routes the whole stream into one column family: keys are
    namespace-prefixed in-plan per micro-batch (one codegen concat), the
    rest of the write path — value separation, tombstones, TTL, merge
    operands, idempotent commits, maintenance — is identical. The family
    must exist; the per-batch catalog check fails the query fast if it
    was dropped mid-stream.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cols = [
            F.col(key_col).cast(store.key_type).alias("key"),
            F.col(value_col).cast("binary").alias("value"),
        ]
        if expires_col is not None:
            cols.append(F.col(expires_col).cast("long").alias("expires_at"))
        if merge_col is not None:
            cols.append(F.col(merge_col).cast("boolean").alias("_merge_flag"))
        rows = batch_df.select(*cols)
        writer = store if cf is None else store.cf(cf)
        n = writer.ingest_df(
            rows,
            expires_col="expires_at" if expires_col is not None else None,
            target_segments=target_segments,
            commit_tag=(checkpoint_dir, int(batch_id)),
            merge_col="_merge_flag" if merge_col is not None else None,
        )
        # run the tick on its cadence even for empty/replayed batches: a
        # no-op tick costs only manifest metadata checks, while skipping a
        # boundary after a crash-replay would delay maintenance a full cycle
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            store.maintenance_tick()

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    stream_df: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark for late
    data — the standard streaming rollup (state is bounded by the
    watermark; at scale this is the only safe unbounded-stream agg)."""
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
