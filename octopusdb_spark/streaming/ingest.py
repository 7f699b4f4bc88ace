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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopusdb_spark.kv.manifest import ManifestState, SegmentInfo
from octopusdb_spark.kv.store import DATA_SCHEMA, KVStore


def ingest_stream_to_kv(
    stream_df: DataFrame,
    store: KVStore,
    checkpoint_dir: str,
    key_col: str = "key",
    value_col: str = "value",
):
    """Run a streaming DataFrame into the KV store: each micro-batch is one
    segment + one manifest commit (single-writer discipline preserved — the
    foreachBatch callback runs serially, like the reference's doWrites
    goroutine). Returns the StreamingQuery; caller awaits termination.

    stream_df must provide key_col (string) and value_col (binary/string).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("binary").alias("value"),
        )
        state = store.manifest.state
        seq0 = state.next_seq
        seg_id, path = store.manifest.new_segment_path("data")
        out = rows.withColumn(
            "seq", F.lit(seq0) + F.monotonically_increasing_id()
        ).select(
            "key",
            "value",
            F.lit(0).alias("meta"),
            F.lit(0).cast("long").alias("expires_at"),
            F.col("seq").alias("version"),
            "seq",
            F.lit(None).cast("string").alias("value_ptr"),
        )
        out.write.mode("overwrite").parquet(path)
        stats = (
            store.spark.read.schema(DATA_SCHEMA)
            .parquet(path)
            .agg(
                F.min("key").alias("mn"),
                F.max("key").alias("mx"),
                F.count("*").alias("cnt"),
                F.max("seq").alias("mxseq"),
            )
            .collect()[0]
        )
        if not stats["cnt"]:
            return
        new_state = ManifestState(
            version=state.version,
            next_seq=int(stats["mxseq"]) + 1,
            segments=list(state.segments),
        )
        new_state.segments.append(
            SegmentInfo(
                segment_id=seg_id,
                kind="data",
                level=0,
                path=path,
                min_key=stats["mn"],
                max_key=stats["mx"],
                row_count=stats["cnt"],
                size_bytes=0,
                created_seq=seq0,
            )
        )
        store.manifest.commit(new_state)

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
