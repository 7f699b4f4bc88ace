"""Multimodal decode / feature-extract pipeline plumbing.

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata. The decode step itself needs codec libraries that are not in
this container, so the codec boundary is STUBBED (deterministic fake,
clearly marked) — everything Spark-side is real and tested: schema contract,
Arrow batch shape, ``mapInPandas`` partition-parallel processing, and the
select/filter pushdown around it.

At scale: decode runs inside executors over Arrow record batches (one Python
worker per core, zero driver involvement); payload columns are only read in
the partitions that survive metadata pushdown.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("feat_mean", T.DoubleType(), False),
        T.StructField("feat_dim", T.IntegerType(), False),
    ]
)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Partition-parallel feature extraction via mapInPandas: Arrow batches
    in, Arrow batches out — the canonical multimodal pipeline shape.

    The decode stub is nested so cloudpickle ships it by value — executors
    don't need this package on their PYTHONPATH (library-consumer safe).
    """

    def decode_stub(payload: bytes, media_type: str) -> list:
        """STUB: stands in for a real codec (PIL/librosa/ffmpeg not in this
        container). Deterministic fake features: byte-level moments. Replace
        with a real decoder when the libs exist; the Spark plumbing around
        it does not change."""
        if media_type not in ("image", "audio", "video"):
            raise NotImplementedError(f"unknown media type: {media_type}")
        n = max(len(payload), 1)
        mean = sum(payload[: min(n, 4096)]) / min(n, 4096)
        return [float(mean), float(n % 251), float(payload[0] if payload else 0)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_stub(bytes(p), mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                    "feat_mean": [f[0] for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: records the intended transform in metadata; payload
    passes through untouched (no codec in container). The schema contract
    and lazy-plan shape are the real, tested parts."""
    return media_df.withColumn("meta_width", F.lit(width)).withColumn(
        "meta_height", F.lit(height)
    )


def frame_sample_plan(media_df: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling plan for video rows: explodes the sample timeline from
    metadata (no decode needed for planning) — one row per (media, frame_ts).
    The decode of each sampled frame would ride the same mapInPandas path."""
    return (
        media_df.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("meta_duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms")
    )
