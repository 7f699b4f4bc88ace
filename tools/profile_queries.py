"""Per-query optimization profiler (round 16, guide §1).

For each named query (default: the bench HEADLINE list), runs the noop-sink
timing N times (first reading discarded as cold), captures
``.explain("formatted")`` to plans/<outdir>/<name>.txt, and prints a compact
table: median seconds, Exchange count, join strategies, Python-eval nodes,
and the Spark job count consumed by the query (jobs are the local-mode
fixed-overhead currency — each one is a scheduling round trip).

Usage:
    python tools/profile_queries.py [--reps=3] [--plans=plans/r16/work] [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octopusdb_spark.queries import REGISTRY
from octopusdb_spark.session import TABLE_NAMES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "py": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    reps = 3
    plans_dir = None
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--plans="):
            plans_dir = a.split("=", 1)[1]
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag: {a}")
        else:
            names.append(a)
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)

    spark = get_spark("octopusdb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    for tname in TABLE_NAMES:
        try:
            if tname == "events":
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(f"{SF_DIR}/{tname}.parquet").limit(1).count()
        except Exception:
            pass

    def _ident(it):
        for p in it:
            yield p

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1).rdd.getNumPartitions()  # warm the RDD SerDe (spread's probe)

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = REGISTRY[name]
        runs = []
        jobs_used = None
        for i in range(reps):
            group = f"profile-{name}-{i}"
            sc.setJobGroup(group, f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            jobs_used = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("", "")
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # drill queries with side effects may differ
            plan = f"(explain failed: {e})"
        if plans_dir:
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        st = plan_stats(plan)
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"runs": runs, "median": med, "jobs": jobs_used, **st}
        print(
            f"{name:34s} med={med:6.2f}s runs={runs} jobs={jobs_used:3d} "
            f"ex={st['exchanges']:2d} win={st['window']:2d} py={st['py']} "
            f"smj={st['smj']} bhj={st['bhj']} bnlj={st['bnlj']}",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
