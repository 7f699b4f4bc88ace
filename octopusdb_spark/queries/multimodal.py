"""Multimodal-column operators — images/audio/video as opaque binary columns
with typed metadata (driver mandate; no reference analog).

The driver testdata has no binary columns, so the payloads are derived
deterministically (utf-8 bytes of `documents.text`) — what matters and what
is tested is the Spark-side plumbing: binary schema, byte-level functions,
batch-shaped Pandas processing (see octopusdb_spark/functions/multimodal.py
for the mapInPandas decode pipeline with the stubbed codec).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.queries.common import t


def q_multimodal_bytes(spark, sf_dir):
    """Binary-column metadata extraction: byte length, head bytes (the
    "magic number" sniff), and a content digest — all JVM-side byte ops."""
    docs = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.lower(F.substring(F.hex(payload), 1, 8)).alias("head_hex"),  # first 4 bytes as hex
        F.md5(payload).alias("digest"),
        (F.length(payload) >= 256).alias("exceeds_inline_threshold"),
    ).orderBy("doc_id")


def q_multimodal_chunking(spark, sf_dir):
    """Fixed-size byte chunking: how many 64-byte chunks each payload splits
    into and the size of the tail chunk — the partitioning arithmetic of a
    blob-chunk store (vlog record framing, `kv/file/vlog.go:150-191`)."""
    docs = t(spark, sf_dir, "documents")
    blen = F.length(F.encode(F.col("text"), "utf-8"))
    return docs.select(
        "doc_id",
        blen.alias("byte_len"),
        F.ceil(blen / F.lit(64)).cast("bigint").alias("n_chunks"),
        F.when(blen % 64 == 0, 64).otherwise(blen % 64).alias("tail_chunk_bytes"),
    ).orderBy("doc_id")


def q_multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plan run under the gate: documents stand in as
    typed media rows (doc_id % 3 == 2 -> video, duration = n_chars * 10 ms),
    `functions/multimodal.py::frame_sample_plan` explodes each video's
    sample timeline (every 250 ms, metadata only — no decode), and the
    checked output is the per-media frame manifest (count, first/last ts).
    The decode of each sampled frame rides the same mapInPandas path as
    `extract_features`; at 100 TB the plan stage is a pure metadata
    projection + explode, embarrassingly parallel."""
    from octopusdb_spark.functions.multimodal import frame_sample_plan

    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        (F.col("n_chars") * 10).cast("long").alias("meta_duration_ms"),
    )
    frames = frame_sample_plan(media, every_ms=250)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.min("frame_ts_ms").cast("long").alias("first_ts"),
            F.max("frame_ts_ms").cast("long").alias("last_ts"),
        )
        .orderBy("media_id")
    )


ORACLES = {
    "multimodal_frame_sample": """
        SELECT doc_id AS media_id,
               CAST((n_chars * 10) // 250 + 1 AS BIGINT) AS n_frames,
               CAST(0 AS BIGINT) AS first_ts,
               CAST(((n_chars * 10) // 250) * 250 AS BIGINT) AS last_ts
        FROM documents
        WHERE doc_id % 3 = 2
        ORDER BY media_id""",
    "multimodal_bytes": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               lower(substr(hex(encode(text)), 1, 8)) AS head_hex,
               md5(text) AS digest,
               octet_length(encode(text)) >= 256 AS exceeds_inline_threshold
        FROM documents ORDER BY doc_id""",
    "multimodal_chunking": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks,
               CASE WHEN octet_length(encode(text)) % 64 = 0 THEN 64
                    ELSE octet_length(encode(text)) % 64 END AS tail_chunk_bytes
        FROM documents ORDER BY doc_id""",
}

QUERIES = {
    "multimodal_bytes": q_multimodal_bytes,
    "multimodal_chunking": q_multimodal_chunking,
    "multimodal_frame_sample": q_multimodal_frame_sample,
}
