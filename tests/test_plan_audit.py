"""Physical-plan regression gate: representative headline queries must stay
free of scale anti-patterns (cartesian joins, single-task windows, row-wise
Python). The full sweep is `python tools/plan_audit.py`; this keeps the
worst offenders from regressing silently inside the test suite."""

from __future__ import annotations

from tools.plan_audit import audit_one

from octopusdb_spark.queries import REGISTRY

SUBSET = [
    "kv_latest_live",
    "q3_shipping_priority",
    "q_sessionize",
    "graph_pagerank",
    "dedup_minhash_lsh",
    "dedup_cluster_keep",
    "sim_ann_bucketed",
    "q_range_join_bucketed",
    "text_decontaminate",
    "q21_waiting_shape",
]


def test_headline_plans_clean(spark):
    flagged = {}
    for name in SUBSET:
        findings = audit_one(spark, name, REGISTRY[name])
        if findings:
            flagged[name] = findings
    assert not flagged, f"plan anti-patterns: {flagged}"
