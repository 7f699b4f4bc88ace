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
# insertion order. Round-10 rotation: after the r8/r9 sweeps the only
# freshness debt is the r7-last-green cohort (50 names) plus
# pipeline_pretrain_corpus (r6, the oldest row) — 51 candidates computed
# from CORRECTNESS_r01..r09 for 49 slots behind the kv_merge_operator
# head-insert. Two sacrifices, chosen where another fresh row exercises
# the identical code path: kv_merge_sorted_runs (same plan and oracle
# SQL as the r8-green kv_latest_live, both ride kv_live/_newest) and
# q_token_budget_packing (whitespace counter; the r9-green
# q_token_budget_packing_bpe runs BOTH counters through the same shared
# prefix-sum packing windows).
# PROTOCOL: a query added to the registry after this list is frozen must
# be inserted at the HEAD at that moment (displacing the last fill
# entry), not next round.
_PRIORITY = [
    # added round 10 (head-inserts at add time, per protocol): the
    # streaming SemDeDup filter, batch SemDeDup semantic dedup (both ride
    # the memoized trained quantizer), column families (create/read/drop/
    # recreate/purge, pytest-first-then-promote), and the merge operator
    # promoted once its CDC half shipped. Each insert displaced the
    # then-last fill entry (text_repetition, text_pii_redact,
    # text_ngram_topk — all r7-stale; their code paths stay pinned by
    # pytest and prior green rounds).
    "stream_semantic_filter",
    "dedup_semantic",
    "kv_column_families",
    "kv_merge_operator",
    # r6-stale (oldest row in the repo)
    "pipeline_pretrain_corpus",
    # r7-stale cohort
    "kv_changefeed_preimage", "kv_pinned_reads", "kv_prefix_scan",
    "kv_range_delete", "kv_range_seek", "kv_remote_reads",
    "kv_replication", "kv_stream_ingest", "kv_tombstoned_keys",
    "kv_ttl_classes",
    "q1_pricing_summary", "q2_min_cost_shape", "q4_order_priority",
    "q6_forecast_revenue", "q7_volume_shipping", "q12_ship_lag_shape",
    "q14_promo_effect", "q17_small_quantity", "q19_discounted_revenue",
    "q22_global_sales",
    "q_approx_percentile", "q_asof_join", "q_avg_order_gap",
    "q_cohort_retention", "q_cube_orders", "q_event_time_windows",
    "q_funnel", "q_grouping_sets", "q_mode_event_type", "q_moving_avg",
    "q_rollup_acctbal", "q_running_totals", "q_scalar_functions",
    "q_semi_join", "q_session_window", "q_sessionize", "q_set_ops",
    "q_time_gapfill", "q_time_rollup", "q_top_customers_per_nation",
    "q_train_val_split",
    "sim_ann_ivfpq", "sim_quantized_cosine",
    "stream_dedup_ingest",
    "text_chunk_overlap",
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
