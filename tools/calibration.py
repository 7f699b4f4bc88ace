"""Fixed synthetic calibration workload, CONSTANT across rounds — the
box-drift yardstick shared by bench.py and tools/maintenance_bench.py.

This machine has shown ~2x uniform slowdowns under sustained load (see
BASELINE.md); dividing a run's timings by its calibration median separates
environment drift from plan regressions. Recording the median in EVERY
bench context (VERDICT r6 #6) means the healthy-box anchor is captured
automatically whenever the box recovers. Deliberately registry-independent
(no query code path).

TWO probes since round 9 (VERDICT r8 #2): the round-8 drift hit real
queries uniformly 1.22x while the CPU-bound md5 probe stayed FLAT
(1.415 vs 1.424) — whatever degraded lives on the shuffle/disk path the
md5 probe never touches. So:

- ``median``: the original CPU probe, UNCHANGED since round 6 — 20M md5
  hashes + a 65k-group count on 32 fixed partitions, 3 runs. Keys kept
  identical so every historical BENCH_r{N}.json stays comparable.
- ``shuffle_median``: a shuffle-heavy probe — 20M rows sort-merge-joined
  against a 4M-row build side on a 4M-key space (hints pin SMJ so AQE
  can't broadcast it away), then a second-shuffle aggregation. Exercises
  shuffle write/read, serialization, and the local-disk path.

A drift that moves shuffle_median but not median is environment, not a
regression — the round-8 signature, now measurable directly.
"""

from __future__ import annotations

import time


def _cpu_probe(spark) -> None:
    (
        spark.range(0, 20_000_000, 1, 32)
        .selectExpr("substr(md5(cast(id as string)), 1, 4) AS s")
        .groupBy("s")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def _shuffle_probe(spark) -> None:
    # Both sides big enough that neither is broadcastable; merge hints pin
    # the sort-merge path regardless of AQE. The join shuffles both sides
    # on k; the groupBy forces a second full shuffle of the join output.
    left = spark.range(0, 20_000_000, 1, 32).selectExpr(
        "id % 4000000 AS k", "id AS v"
    )
    right = spark.range(0, 4_000_000, 1, 32).selectExpr(
        "id AS k", "id % 251 AS g"
    )
    (
        left.hint("merge")
        .join(right.hint("merge"), "k")
        .groupBy("g")
        .sum("v")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def _timed_runs(fn, spark, n: int = 3) -> list[float]:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark)
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def calibration(spark) -> dict:
    cpu_runs = _timed_runs(_cpu_probe, spark)
    shuffle_runs = _timed_runs(_shuffle_probe, spark)
    return {
        "metric": "calibration_fixed_workload",
        "unit": "sec",
        "runs": cpu_runs,
        "median": sorted(cpu_runs)[1],
        "shuffle_runs": shuffle_runs,
        "shuffle_median": sorted(shuffle_runs)[1],
    }
