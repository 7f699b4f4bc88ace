"""Query registry: merges every query module's (spark_fn, oracle_sql) pairs.

``REGISTRY`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLE_SQL`` maps name -> DuckDB SQL string (absent = rows-only check).
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "octopusdb_spark.queries.kv_semantics",
    "octopusdb_spark.queries.relational",
    "octopusdb_spark.queries.tpch_extra",
    "octopusdb_spark.queries.advanced",
    "octopusdb_spark.queries.analytics_extra",
    "octopusdb_spark.queries.scale_patterns",
    "octopusdb_spark.queries.graph",
    "octopusdb_spark.queries.text",
    "octopusdb_spark.queries.dedup",
    "octopusdb_spark.queries.similarity",
    "octopusdb_spark.queries.multimodal",
    "octopusdb_spark.queries.quality",
    "octopusdb_spark.queries.stream_twin",
]

REGISTRY: dict = {}
ORACLE_SQL: dict = {}

for _m in _MODULES:
    try:
        mod = import_module(_m)
    except ModuleNotFoundError:
        continue
    for name, fn in getattr(mod, "QUERIES", {}).items():
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name} in {_m}")
        REGISTRY[name] = fn
    ORACLE_SQL.update(getattr(mod, "ORACLES", {}))

# The driver's correctness gate checks the FIRST 50 registry entries in
# insertion order. Round-9 rotation: the full stale cohort — every query
# whose most recent green driver row is round 6 or older (47 at r6 plus
# multimodal_bytes at r5, the oldest row in the repo; list computed from
# CORRECTNESS_r01..r08) — then fills from the r7 cohort on code paths
# round 9 touches (the snapshot-pinned remote `changes` paging, the
# BPE-ish token counting).
# PROTOCOL: a query added to the registry after this list is frozen must
# be inserted at the HEAD at that moment (displacing the last fill
# entry), not next round.
_PRIORITY = [
    # added round 9 (head-insert at add time, per protocol)
    "kv_failover",             # replica promotion + re-bootstrap drill
    "q_token_budget_packing_bpe",  # tokenizer-fidelity shard packing
    "text_dup_runs",           # maximal shared-run span dedup (Lee et al.)
    # stale cohort (r5/r6 last-green), oldest first
    "multimodal_bytes",        # r5 — displaced by a head-insert in r8
    "kv_value_separation", "kv_version_history", "kv_changefeed",
    "kv_stream_enrich",
    "q3_shipping_priority", "q5_local_supplier_volume", "q8_market_share",
    "q9_profit_shape", "q10_returned_items", "q11_volume_share_shape",
    "q13_custdist", "q15_top_supplier", "q16_supplier_cnt_shape",
    "q18_large_volume", "q20_excess_shipping_shape", "q21_waiting_shape",
    "q_window_family", "q_approx_distinct", "q_array_hof",
    "q_hash_sampled_stats", "q_pandas_udaf_trimmed_mean",
    "q_range_join_bucketed", "q_rollup_merge", "q_skew_salted_join",
    "q_source_balanced_sample", "q_stratified_sample", "q_weighted_sample",
    "graph_components", "graph_khop", "graph_mutual_follows",
    "graph_triangles", "graph_two_hop",
    "dedup_cluster_keep", "dedup_containment", "dedup_exact_normalized",
    "dedup_ngram_jaccard",
    "sim_ann_ivf_kmeans", "sim_ann_pq",
    "text_fingerprint", "text_langid", "text_quality",
    "text_source_profile", "text_tfidf_keywords", "text_token_count",
    "quality_filter_reasons", "quality_pattern_scan",
    # (fills q_token_budget_packing, kv_remote_reads and the stale
    # pipeline_pretrain_corpus displaced by the kv_failover /
    # q_token_budget_packing_bpe / text_dup_runs head-inserts;
    # pipeline_pretrain_corpus chosen as the stale sacrifice because its
    # code paths are freshly covered by the r8-green pipeline_pretrain_v2,
    # which composes the same shared stage helpers)
]


def _reorder(mapping: dict) -> dict:
    # A typo here would silently shrink the driver-checked head — fail loudly
    # instead (ADVICE r4). REGISTRY is checked rather than `mapping` because
    # ORACLE_SQL legitimately lacks rows-only queries.
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"_PRIORITY names absent from REGISTRY: {missing}"
    assert len(_PRIORITY) == len(set(_PRIORITY)) == 50, (
        f"_PRIORITY must be 50 unique names (driver window size), got {len(_PRIORITY)}"
    )
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


REGISTRY = _reorder(REGISTRY)
ORACLE_SQL = _reorder(ORACLE_SQL)
