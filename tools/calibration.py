"""Fixed synthetic calibration workload, CONSTANT across rounds — the
box-drift yardstick shared by bench.py and tools/maintenance_bench.py.

This machine has shown ~2x uniform slowdowns under sustained load (see
BASELINE.md); dividing a run's timings by its calibration median separates
environment drift from plan regressions. Recording the median in EVERY
bench context (VERDICT r6 #6) means the healthy-box anchor is captured
automatically whenever the box recovers. Deliberately registry-independent
(no query code path): 20M md5 hashes + a 65k-group count on 32 fixed
partitions, 3 runs.
"""

from __future__ import annotations

import time


def calibration(spark) -> dict:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("substr(md5(cast(id as string)), 1, 4) AS s")
            .groupBy("s")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        runs.append(round(time.perf_counter() - t0, 3))
    return {
        "metric": "calibration_fixed_workload",
        "unit": "sec",
        "runs": runs,
        "median": sorted(runs)[1],
    }
