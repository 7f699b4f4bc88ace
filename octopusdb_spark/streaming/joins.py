"""Stream-stream joins with watermark-bounded state.

The canonical correlation shape for unbounded streams (e.g. impressions ⋈
clicks): both sides carry watermarks and the join condition bounds the
event-time distance, so Spark can expire buffered rows once the watermark
passes — state is O(arrival rate × interval), independent of stream length.
An unbounded-condition stream-stream join would buffer forever; this module
only exposes the bounded form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands within
    ``[left_ts, left_ts + within]``. Both watermarks are mandatory — they
    are what lets the state store evict matched/expired rows."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, f"_r_{key}")
    cond = (
        (F.col(key) == F.col(f"_r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(f"_r_{key}")


def enrich_stream_with_kv(
    stream_df: DataFrame,
    store,
    key_col: str = "key",
    now: int | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Stream-static enrichment: join a stream against the KV store's live
    view — the dimension-lookup pattern (events enriched with the stored
    profile/feature value for their key). The static side is pinned to the
    manifest state captured when this plan is built (segment paths are
    resolved once): a consistent store snapshot for the whole query. For
    per-batch freshness, rebuild the join inside ``foreachBatch``; pin
    ``as_of`` for an explicit historical snapshot. The KV view is a
    broadcast-size dimension in typical use; at 100 TB of KV the optimizer
    falls back to a shuffled join keyed by the stream's key column."""
    view = store.view(now=now, as_of=as_of).select(
        F.col("key").alias(key_col),
        F.col("value").alias("kv_value"),
        F.col("version").alias("kv_version"),
    )
    return stream_df.join(view, key_col, "left")
