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
# insertion order. Rounds 2 and 3 both covered the same 50 (the round-2
# priority head), so the other half — the KV semantics family, the TPC-H
# core, and the events/relational set — has had no driver row since round
# 1. Rotate that half to the front for round 4; it also contains every
# query touched by this round's events.ts schema change (timestamp NANOS →
# MICROS in the generated parquet), so the hard gate re-confirms exactly
# the code that changed. Next round: rotate again.
_PRIORITY = [
    # KV semantics (driver-checked r1, not since; kv_latest_live is entry())
    "kv_latest_live", "kv_point_lookup", "kv_tombstoned_keys",
    "kv_ttl_classes", "kv_prefix_scan", "kv_range_seek",
    "kv_merge_sorted_runs", "kv_value_separation", "kv_version_history",
    # events-family (ts_us derivation changed this round)
    "q_sessionize", "q_session_window", "q_event_time_windows", "q_funnel",
    "q_cohort_retention", "q_moving_avg", "q_mode_event_type",
    "q_time_gapfill", "q_time_rollup", "q_asof_join", "q_avg_order_gap",
    # TPC-H core + extras
    "q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q7_volume_shipping",
    "q10_returned_items", "q14_promo_effect", "q17_small_quantity",
    "q18_large_volume", "q19_discounted_revenue", "q22_global_sales",
    # relational / analytics core
    "q_top_customers_per_nation", "q_rollup_acctbal", "q_cube_orders",
    "q_grouping_sets", "q_set_ops", "q_scalar_functions", "q_running_totals",
    "q_semi_join",
    # brand-new this round (no driver row ever)
    "q8_market_share", "q9_profit_shape", "q11_volume_share_shape",
    "q12_ship_lag_shape", "text_repetition", "text_ngram_topk",
    "sim_quantized_cosine", "q_token_budget_packing", "q_approx_percentile",
    "kv_changefeed",
]


def _reorder(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


REGISTRY = _reorder(REGISTRY)
ORACLE_SQL = _reorder(ORACLE_SQL)
