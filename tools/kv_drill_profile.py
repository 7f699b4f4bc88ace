"""Phase-level profiler for the KV store drills (round 16, guide §1).

Replays q_kv_merge_operator's store-call sequence with per-phase wall
clock and Spark job counts, so write-path changes can be attributed to
the exact phase (ingest / set_batch / view-collect / fold / compact).

Usage: python tools/kv_drill_profile.py [--reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octopusdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, sf_dir, tag):
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from octopusdb_spark.kv.store import Entry, KVStore
    from octopusdb_spark.queries.common import NOW, t

    sc = spark.sparkContext
    phases = []

    def phase(name, fn):
        group = f"kvprof-{tag}-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        phases.append((name, round(dt, 3), jobs))
        return out

    bases = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 40)
        .select(
            F.concat(F.lit("m"), F.lpad(F.col("c_custkey").cast("string"), 6, "0")).alias("key"),
            (F.col("c_custkey") * 1000).cast("string").cast("binary").alias("value"),
        )
    )
    ops = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 40)
        .select(
            F.concat(F.lit("m"), F.lpad(F.col("o_custkey").cast("string"), 6, "0")).alias("key"),
            (F.col("o_orderkey") % 100).cast("string").cast("binary").alias("value"),
            F.lit(True).alias("is_op"),
        )
    )
    base = tempfile.mkdtemp(prefix=f"kvprof_{uuid.uuid4().hex[:12]}_")
    try:
        store = KVStore(spark, f"{base}/kv", merge_op="add")
        phase("ingest_bases", lambda: store.ingest_df(bases, target_segments=2))
        phase(
            "set_batch_tomb",
            lambda: store.set_batch([Entry(f"m{k:06d}", None) for k in range(10, 41, 10)]),
        )
        phase(
            "ingest_ops",
            lambda: store.ingest_df(ops, merge_col="is_op", target_segments=2),
        )
        phase("info", lambda: store.info())
        phase(
            "merge_batch",
            lambda: store.merge_batch([(f"m{k:06d}", b"5") for k in range(7, 41, 7)]),
        )
        phase("view_collect_1", lambda: store.view(now=NOW).collect())
        phase("fold_merges", lambda: store.fold_merges(now=NOW))
        phase("compact", lambda: store.compact(now=NOW))
        phase("info2", lambda: store.info())
        phase("view_collect_2", lambda: store.view(now=NOW).collect())
    finally:
        shutil.rmtree(base, ignore_errors=True)
    sc.setJobGroup("", "")
    return phases


def main() -> None:
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    spark = get_spark("kv-drill-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).rdd.getNumPartitions()
    all_runs = []
    for i in range(reps):
        t0 = time.perf_counter()
        phases = run_once(spark, SF_DIR, str(i))
        total = time.perf_counter() - t0
        all_runs.append((total, phases))
        print(f"--- rep {i}: total {total:.2f}s")
        for name, dt, jobs in phases:
            print(f"    {name:18s} {dt:6.3f}s  jobs={jobs}")
    best = min(all_runs, key=lambda x: x[0])
    print(f"best total {best[0]:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
