"""Stateful streaming operators: sessionization via applyInPandasWithState
(gap-close + watermark-timeout emission) and watermark-bounded dedup."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from octopusdb_spark.streaming.stateful import dedup_stream, sessionize_stream

BASE = 1_700_000_000


def _write_events(spark, path, rows):
    (
        spark.createDataFrame(rows, "user_id long, value double, epoch long")
        .withColumn("ts", F.col("epoch").cast("timestamp"))
        .drop("epoch")
        .write.parquet(path)
    )


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def test_sessionize_stream_gap_close(spark, tmp_path):
    # user 1: two sessions split by a 2h gap; user 2: one session.
    rows = [
        (1, 1.0, BASE),
        (1, 2.0, BASE + 60),
        (1, 4.0, BASE + 7200),  # breaches the 30-min gap -> closes session 1
        (2, 8.0, BASE + 30),
    ]
    src = str(tmp_path / "events")
    _write_events(spark, src, rows)
    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(src)
    name = f"sess_{int(time.time())}"
    _run_to_memory(sessionize_stream(stream, gap_seconds=1800, watermark_delay="1 minute"), name)
    out = {
        (r["user_id"], int(r["session_start"].timestamp())): (r["n_events"], r["total_value"])
        for r in spark.table(name).collect()
    }
    # the gap-closed session must have been emitted with its 2 events summed
    assert out[(1, BASE)] == (2, 3.0)


def test_sessionize_multibatch_state_carries(spark, tmp_path):
    # same session spread over two micro-batches: state must carry across.
    src = str(tmp_path / "ev2")
    _write_events(spark, str(tmp_path / "ev2/b1.parquet"), [(7, 1.0, BASE)])
    _write_events(spark, str(tmp_path / "ev2/b2.parquet"), [(7, 2.0, BASE + 60), (7, 9.0, BASE + 9000)])
    stream = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    name = f"sess2_{int(time.time())}"
    _run_to_memory(sessionize_stream(stream, gap_seconds=1800, watermark_delay="1 minute"), name)
    rows = spark.table(name).filter(F.col("user_id") == 7).collect()
    merged = {int(r["session_start"].timestamp()): (r["n_events"], r["total_value"]) for r in rows}
    assert merged[BASE] == (2, 3.0)  # both batches merged into one session


def test_dedup_stream_first_wins(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    rows = [
        (1, 10.0, BASE),
        (1, 99.0, BASE + 5),  # duplicate key within watermark -> dropped
        (2, 20.0, BASE + 10),
    ]
    _write_events(spark, src, rows)
    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(src)
    name = f"dedup_{int(time.time())}"
    _run_to_memory(dedup_stream(stream, ["user_id"], watermark_delay="1 minute"), name)
    got = sorted((r["user_id"], r["value"]) for r in spark.table(name).collect())
    assert [u for u, _ in got] == [1, 2]
