"""Custom stateful streaming operators.

The reference engine has no streaming model at all (its write "pipeline" is
a Go channel feeding one goroutine, `kv/db.go:224-285`), so these are pure
capability extensions: the two stateful patterns a 100 TB ingest pipeline
needs that plain windowed aggregation can't express —

- ``sessionize_stream``: event-time sessionization with a gap timeout via
  ``applyInPandasWithState`` (arbitrary per-key state, Arrow-batched; state
  size is bounded because sessions close on gap or watermark timeout);
- ``dedup_stream``: exactly-once key dedup within a watermark horizon via
  ``dropDuplicatesWithinWatermark`` (state auto-expires with the watermark,
  so it runs forever without unbounded state growth).

Both are watermark-bounded — the only safe shape for unbounded streams.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# state travels as epoch-seconds longs — simple, Arrow-friendly, tz-proof
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user sessionization over an event stream: a session extends while
    consecutive events are within ``gap_seconds``; it closes (and emits one
    row) when a later event breaches the gap or the watermark passes
    session_end + gap. The streaming twin of the batch ``q_sessionize``
    query (lag + cumulative-sum), but incremental with O(1) state per live
    user.

    The update closure is deliberately self-contained (helper nested, no
    module globals) so cloudpickle ships it by value — executors do not
    need octopusdb_spark on their PYTHONPATH to run this operator."""

    def _session_rows(sessions: list) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [s[4] for s in sessions],
                "session_start": pd.to_datetime([s[0] for s in sessions], unit="s"),
                "session_end": pd.to_datetime([s[1] for s in sessions], unit="s"),
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
            }
        )

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_s, last_s, n, total = state.get
            state.remove()
            yield _session_rows([(start_s, last_s, n, total, user_id)])
            return

        ts, vals = [], []
        for pdf in pdfs:
            ts.extend(int(t.timestamp()) for t in pdf[ts_col])
            vals.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts)), key=lambda i: ts[i])

        cur = list(state.get) if state.exists else None  # [start, last, n, total]
        closed = []
        for i in order:
            t, v = ts[i], vals[i]
            # >= matches the batch q_sessionize gap rule exactly, so
            # streaming and batch sessionization agree row-for-row
            if cur is not None and t - cur[1] >= gap_seconds:
                closed.append((*cur, user_id))
                cur = None
            if cur is None:
                cur = [t, t, 1, v]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v

        state.update(tuple(cur))
        # event-time timeout: fire once the watermark passes end-of-gap
        state.setTimeoutTimestamp((cur[1] + gap_seconds) * 1000)
        if closed:
            yield _session_rows(closed)

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication: first arrival per key wins; duplicate
    state is dropped automatically once the watermark passes, so memory is
    bounded by (arrival rate x watermark horizon), not stream length. The
    streaming twin of the batch ``dedup_exact`` query."""
    return stream_df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
