"""Sources & sinks: the engine's external-format surface.

The reference only speaks its own on-disk formats (SST `kv/file/sstable.go`,
WAL `kv/file/wal.go`, vlog `kv/file/vlog.go`); the Spark engine exposes the
standard lake formats instead — parquet (primary), csv, json, orc — with
format inference, schema enforcement, and scale-sane write defaults.

Scale notes: parquet writes keep dictionary encoding + snappy defaults and
optionally bloom filters on join keys; `partition_by` produces
partition-pruned layouts; `max_records_per_file` bounds file sizes the way
the reference's compaction targets `fileSz` (`kv/lsm/compact.go:732-743`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_TO_FMT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}


def infer_format(path: str) -> str:
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    return _EXT_TO_FMT.get(ext.lower(), "parquet")


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    media_type: str = "image",
) -> DataFrame:
    """Ingest raw media files as opaque binary rows — the on-ramp into the
    multimodal pipeline (`functions/multimodal.py` MEDIA_SCHEMA shape).
    Spark's built-in binaryFile source reads (path, modificationTime,
    length, content); we derive a stable media_id from the path hash so
    downstream joins don't depend on listing order. Payloads stay columnar
    Arrow batches end-to-end; at scale, `pathGlobFilter` prunes at listing
    time, before any bytes are read."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("long").alias("meta_duration_ms"),
        F.col("path").alias("source_path"),
        F.col("length").alias("source_bytes"),
    )


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read an external table with format inference. CSV defaults to
    header+inferSchema unless an explicit schema is given (explicit schema
    skips the inference pass — always do this at scale)."""
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
        if path.rstrip("/").endswith(".tsv"):
            options.setdefault("sep", "\t")
    return reader.options(**options).load(path)


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list,
    n_buckets: int,
    sort_cols: list | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key —
    the co-located-join layout. Two tables bucketed by the same key into
    the same bucket count join WITHOUT a shuffle: the bucketed scan already
    satisfies the join's required hash distribution, so Spark plans a
    sort-merge join with no Exchange on either side. At 100 TB this is the
    difference between re-shuffling the fact table on every join and
    paying the shuffle once at write time. (Bucketing requires the table
    catalog — ``saveAsTable``, not a path write.)"""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "error",
    partition_by: list | None = None,
    max_records_per_file: int | None = None,
    bloom_filter_cols: list | None = None,
    **options,
) -> None:
    fmt = fmt or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if max_records_per_file is not None:
        options["maxRecordsPerFile"] = str(max_records_per_file)
    for col in bloom_filter_cols or []:
        options[f"parquet.bloom.filter.enabled#{col}"] = "true"
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
