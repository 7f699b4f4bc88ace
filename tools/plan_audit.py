"""Physical-plan audit: sweep every registered query for scale anti-patterns.

For each entry in the registry, build the DataFrame against sf0.001 (plan
shape is SF-independent) and inspect the analyzed/physical plan text for the
patterns that kill 100 TB runs:

- ``cartesian``      CartesianProduct / BroadcastNestedLoopJoin on a data
                     path (all-pairs blowup). Queries that are *by design*
                     exact all-pairs baselines declare themselves in
                     ALLOWED_CARTESIAN with the reason.
- ``single_partition`` an ``Exchange SinglePartition`` — the whole input
                     funnels through one task (the physical signature of an
                     unpartitioned window or global agg-as-stream). Final
                     global sorts use range partitioning and orderBy+limit
                     compiles to TakeOrderedAndProject, so neither triggers
                     this; post-limit windows on tiny frames are bounded
                     and allow-listed with the bound.
- ``python_row_udf`` BatchEvalPython = row-at-a-time Python on the plan;
                     Arrow-batched variants (ArrowEvalPython, MapInPandas,
                     FlatMapGroupsInPandas) are the sanctioned forms.
- ``global_sort``    a final global Sort is fine for result presentation,
                     but a Sort feeding further joins/aggs forces a full
                     range shuffle; only reported (info), not failed.

Exit code 1 if any non-allow-listed finding appears; prints one JSON line.
Usage: python tools/plan_audit.py [query_name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octopusdb_spark.queries import REGISTRY
from octopusdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

# query -> reason a cartesian/nested-loop join is the documented intent
ALLOWED_CARTESIAN = {
    "sim_quantized_cosine": "brute-force scoring by design (int8 variant of the exact baseline; Q small)",
    "sim_topk_cosine": "exact brute-force baseline (Q small, corpus pruned)",
    "dedup_embedding_cosine": "exact re-score of <=O(B^2*20) candidate rows",
    "q_asof_join": "small build side; per-key ranges joined then filtered",
    "sim_ann_ivf": "broadcast NLJ against the fixed K-centroid table (K tiny)",
    "q_weighted_sample": "scalar total-weight subquery (1-row broadcast)",
    "q11_volume_share_shape": "TPC-H Q11 global-total scalar subquery (1-row broadcast)",
    "kv_changefeed": "snapshot-cutoff scalar subquery (1-row broadcast)",
    "kv_changefeed_preimage": "snapshot-cutoff scalar subquery (1-row broadcast), shared with kv_changefeed",
    "sim_ann_ivf_kmeans": "broadcast NLJ against the fixed K-centroid table per Lloyd round (K tiny), same as sim_ann_ivf",
    "sim_ann_pq": "broadcast NLJ against the 5-query ADC lookup tables (the PQ compressed scan; corpus side reads only codes+norm)",
    "q22_global_sales": "TPC-H Q22 uncorrelated scalar subquery (1-row broadcast)",
    "q_time_gapfill": "dense bucket axis x event types: days*5 rows, broadcast",
    "q_source_balanced_sample": "global-min target scalar subquery (1-row broadcast)",
}

# query -> reason an Exchange SinglePartition is bounded anyway
ALLOWED_SINGLE_PARTITION = {
    "q_token_budget_packing": "phase-2 prefix sum windows over BUCKET TOTALS (rows = bucket count, not doc count); per-doc windows are bucket-keyed",
    "dedup_embedding_cosine": "rank window runs on 20 rows post-limit",
    "sim_topk_cosine": "rank window on <= 25 rows post-limit",
    "q_p95_disc": "per-flag count frame: one row per returnflag (3 rows)",
    "q_time_gapfill": "SinglePartition is the global min/max bounds agg; the LOCF window itself is keyed by event_type",
    "sim_ann_ivf_kmeans": "optimizer-injected runtime bloom_filter_agg (global 1-row aggregate); every row_number window is keyed by vec_id/query_id",
    "q_source_balanced_sample": "SinglePartition is the global min over per-source counts (rows = source count); the sampling window is keyed by source",
}

# row-at-a-time Python is banned on data paths; declared capability demos
# are the exception
ALLOWED_ROW_PYTHON = {
    "text_tokenize_udtf": "Python UDTF is the declared off-hot-path capability demo",
}


def audit_one(spark, name, fn):
    findings = []
    try:
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        analyzed = df._jdf.queryExecution().analyzed().toString()
    except Exception as e:
        return [{"kind": "error", "detail": str(e)[:200]}]
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
        if name not in ALLOWED_CARTESIAN:
            findings.append({"kind": "cartesian", "detail": "unallowed all-pairs join"})
    # A SinglePartition exchange is benign under a global aggregate (the
    # partial-agg phase bounds it to one row per upstream partition); it is
    # a scale bug when a Window consumes it — every raw row lands in one
    # task. Flag only the Window co-occurrence.
    if (
        "Exchange SinglePartition" in plan
        and re.search(r"\bWindow\b", plan)
        and name not in ALLOWED_SINGLE_PARTITION
    ):
        findings.append(
            {"kind": "single_partition_window", "detail": "window over one task's rows"}
        )
    if "BatchEvalPython" in plan and name not in ALLOWED_ROW_PYTHON:
        findings.append({"kind": "python_row_udf", "detail": "row-at-a-time Python UDF"})
    if "!" in analyzed:
        findings.append({"kind": "unresolved", "detail": "analyzer placeholder in plan"})
    return findings


def main() -> int:
    names = sys.argv[1:] or list(REGISTRY)
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report, n_bad = {}, 0
    for name in names:
        findings = audit_one(spark, name, REGISTRY[name])
        if findings:
            report[name] = findings
            n_bad += 1
    print(json.dumps({"queries_audited": len(names), "flagged": report}))
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
