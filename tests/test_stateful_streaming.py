"""Stateful streaming operators: sessionization via applyInPandasWithState
(gap-close + watermark-timeout emission) and watermark-bounded dedup."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from octopusdb_spark.streaming.stateful import dedup_stream, sessionize_stream

BASE = 1_700_000_000


def _write_events(spark, path, rows):
    # one part file per dir: with maxFilesPerTrigger=1, a dir split across
    # part files would split across micro-batches in arbitrary order
    (
        spark.createDataFrame(rows, "user_id long, value double, epoch long")
        .withColumn("ts", F.col("epoch").cast("timestamp"))
        .drop("epoch")
        .coalesce(1)
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
    import os

    src = str(tmp_path / "ev2")
    _write_events(spark, str(tmp_path / "ev2/b1.parquet"), [(7, 1.0, BASE)])
    _write_events(spark, str(tmp_path / "ev2/b2.parquet"), [(7, 2.0, BASE + 60), (7, 9.0, BASE + 9000)])
    # FileStreamSource orders batches by mtime; pin them so b1 always
    # precedes b2 (a tie would let b2's watermark drop b1's older event)
    for i, d in enumerate(["b1.parquet", "b2.parquet"]):
        for root, _, files in os.walk(str(tmp_path / "ev2" / d)):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000_000 + i * 100,) * 2)
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


def test_streaming_matches_batch_sessionize(spark, tmp_path):
    """Every session the stream emits must be identical to the batch
    (lag + cumulative-sum) sessionization of the same events."""
    import random

    rng = random.Random(42)
    rows, ts = [], {}
    for uid in range(6):
        t = BASE + uid * 17
        for _ in range(40):
            t += rng.choice([30, 120, 600, 2000, 4000])  # mix of gaps
            rows.append((uid, float(uid + 1), t))
        ts[uid] = t
    # flusher: a far-future event per user pushes the watermark past every
    # real session; its own (still-open) session is excluded from compare
    flush_at = max(ts.values()) + 500_000
    rows += [(uid, 0.0, flush_at) for uid in range(6)]

    src = str(tmp_path / "bsrc")
    _write_events(spark, src, [(u, v, e) for u, v, e in rows])

    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(src)
    name = f"bvs_{int(time.time())}"
    _run_to_memory(sessionize_stream(stream, gap_seconds=1800, watermark_delay="1 minute"), name)
    streamed = {
        (r["user_id"], int(r["session_start"].timestamp())): (
            int(r["session_end"].timestamp()),
            r["n_events"],
            r["total_value"],
        )
        for r in spark.table(name).collect()
    }

    # batch twin: same gap rule via lag + cumulative sum
    from pyspark.sql import Window

    ev = spark.read.parquet(src).withColumn("es", F.col("ts").cast("long"))
    w = Window.partitionBy("user_id").orderBy("es")
    sess = (
        ev.withColumn("prev", F.lag("es").over(w))
        .withColumn(
            "new_s",
            (F.col("prev").isNull() | ((F.col("es") - F.col("prev")) >= 1800)).cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("es").alias("start"),
            F.max("es").alias("end"),
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
        )
        .filter(F.col("start") < flush_at)  # drop the open flusher sessions
    )
    batch = {
        (r["user_id"], r["start"]): (r["end"], r["n"], r["total"]) for r in sess.collect()
    }
    assert streamed == batch
    assert len(batch) > 20  # non-trivial corpus


def test_stream_stream_interval_join(spark, tmp_path):
    from octopusdb_spark.streaming.joins import interval_join_streams

    lsrc, rsrc = str(tmp_path / "impr"), str(tmp_path / "clicks")
    (
        spark.createDataFrame(
            [(1, BASE), (1, BASE + 5000), (2, BASE + 100)], "user_id long, e long"
        )
        .select("user_id", F.col("e").cast("timestamp").alias("l_ts"))
        .coalesce(1)
        .write.parquet(lsrc)
    )
    (
        spark.createDataFrame(
            [(1, BASE + 120), (2, BASE + 7000), (3, BASE)], "user_id long, e long"
        )
        .select("user_id", F.col("e").cast("timestamp").alias("r_ts"))
        .coalesce(1)
        .write.parquet(rsrc)
    )
    left = spark.readStream.schema("user_id long, l_ts timestamp").parquet(lsrc)
    right = spark.readStream.schema("user_id long, r_ts timestamp").parquet(rsrc)
    joined = interval_join_streams(left, right, within="10 minutes", watermark="1 minute")
    name = f"ssj_{int(time.time())}"
    _run_to_memory(joined, name)
    got = sorted(
        (r["user_id"], int(r["l_ts"].timestamp()), int(r["r_ts"].timestamp()))
        for r in spark.table(name).collect()
    )
    # user 1: click at +120 matches impression at BASE (within 10 min) only;
    # user 2: click at +7000 is outside +100's window; user 3: no impression
    assert got == [(1, BASE, BASE + 120)]
