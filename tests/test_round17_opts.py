"""Focused tests for the round-17 optimization internals:

1. ``common._scan_splits`` — the hardened ``spread()`` gate (VERDICT r16
   #3/#5): answers from the frame's FILE SOURCES (no analyzed-plan -> RDD
   conversion), no-ops at >= defaultParallelism input splits, and cannot
   be fooled into reading a post-shuffle partition count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.queries.common import _scan_splits, spread


def test_spread_noop_at_high_split_count_via_file_path(spark, tmp_path):
    """The scale-adaptivity contract: a scan with >= defaultParallelism
    input splits gets NO exchange — answered from the file listing alone."""
    target = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "many_files.parquet")
    spark.range(10_000).repartition(target * 2).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= target
    assert _scan_splits(df) >= target
    out = spread(df, "id")
    assert out is df  # structural no-op: same object, no exchange added


def test_spread_fires_on_single_file_scan(spark, tmp_path):
    p = str(tmp_path / "one_file.parquet")
    spark.range(1_000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).select(F.col("id").alias("doc_id"))
    target = spark.sparkContext.defaultParallelism
    assert _scan_splits(df) < target
    out = spread(df, "doc_id")
    assert out is not df
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(1_000))


def test_scan_splits_ignores_downstream_shuffle(spark, tmp_path):
    """The r16 probe read ``df.rdd.getNumPartitions()``, which on a frame
    containing a shuffle answers with the post-shuffle count (e.g. 200),
    not the scan's split count. The hardened gate answers for the scan."""
    p = str(tmp_path / "shuffled_src.parquet")
    spark.range(1_000).coalesce(1).write.parquet(p)
    big = spark.sparkContext.defaultParallelism * 8
    df = spark.read.parquet(p).repartition(big, "id")
    assert df.rdd.getNumPartitions() == big  # what the old probe saw
    assert _scan_splits(df) < big  # the scan itself is a single small file


def test_scan_splits_falls_back_without_file_sources(spark):
    """In-memory frames (no input files) keep the old RDD-probe answer."""
    df = spark.range(100).coalesce(1)
    assert df.inputFiles() == []
    assert _scan_splits(df) == 1
    target = spark.sparkContext.defaultParallelism
    par = spark.range(1_000).repartition(target, "id")
    assert _scan_splits(par) >= target
    assert spread(par, "id") is par


def _mk_assigned(spark, rows):
    """rows: list of (cent_id, vec_id, embedding list)."""
    import math

    data = [
        (c, v, [float(x) for x in e], math.sqrt(sum(x * x for x in e)))
        for c, v, e in rows
    ]
    return spark.createDataFrame(
        data, "cent_id int, vec_id long, embedding array<float>, norm double"
    )


def _brute_drops(rows, thresh):
    """Reference drop set: lower-id cluster-mate with cosine >= thresh."""
    import math

    by_c = {}
    for c, v, e in rows:
        by_c.setdefault(c, []).append((v, e))
    dropped = set()
    for members in by_c.values():
        for vi, ei in members:
            for vj, ej in members:
                if vi >= vj:
                    continue
                dot = sum(a * b for a, b in zip(ei, ej))
                ni = math.sqrt(sum(a * a for a in ei))
                nj = math.sqrt(sum(a * a for a in ej))
                cos = dot / (ni * nj) if ni * nj else float("nan")
                if math.isnan(cos) or cos >= thresh:
                    dropped.add(vj)
    return dropped


def test_semdedup_blockpair_fanout_matches_single_task(spark):
    """VERDICT r16 #2: an oversized cluster's pair grid must fan out as
    block-pair tasks and produce the IDENTICAL drop set as the one-task
    pass (and as a brute-force reference)."""
    import random

    from octopusdb_spark.queries.similarity import (
        SEMDEDUP_THRESH,
        _semdedup_dropped,
    )

    rng = random.Random(17)
    rows = []
    # cluster 1: oversized (200 rows), seeded with near-duplicate planted
    # pairs so cross-block drops in BOTH id directions are exercised
    base = [rng.uniform(-1, 1) for _ in range(8)]
    for v in range(200):
        if v % 7 == 0:
            e = [x + rng.uniform(-0.01, 0.01) for x in base]  # near-dup set
        else:
            e = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((1, v, e))
    # cluster 2: small (stays single-task even at tiny fanout)
    for v in range(300, 310):
        rows.append((2, v, [rng.uniform(-1, 1) for _ in range(8)]))

    assigned = _mk_assigned(spark, rows)
    one_task = {
        r["vec_id"]
        for r in _semdedup_dropped(assigned, fanout_rows=10**9).collect()
    }
    fanned = {
        r["vec_id"]
        for r in _semdedup_dropped(assigned, fanout_rows=32).collect()
    }
    assert fanned == one_task == _brute_drops(rows, SEMDEDUP_THRESH)
    assert one_task  # non-vacuous: the planted near-dups must drop

