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
