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
# insertion order. Round-7 rotation (VERDICT r6 "Next round #1"): lead
# with the 38 queries whose most recent driver row is round 4 (two rounds
# stale — the only coverage gap left), then fill with every code path
# round 7 touches (durable pre-images, memoized ANN training, residual
# IVF-PQ, streaming TTL, the created_seq compaction fix, pinned reads).
# PROTOCOL: a query added to the registry after this list is frozen must
# be inserted at the HEAD at that moment (displacing the last fill
# entry), not next round.
_PRIORITY = [
    # added round 7 (head-insert at add time, per protocol below)
    "kv_range_delete",         # O(1) range tombstone under the gate
    "kv_replication",          # changefeed ship+apply as a driver row
    "q2_min_cost_shape",       # completes the TPC-H 22-query shape suite
    "kv_remote_reads",         # A24 service as a hash-checked driver row
    "stream_dedup_ingest",     # streaming MinHash near-dup rejection
    "text_pii_redact",         # PII scrub with per-class audit counts
    "text_chunk_overlap",      # token-window chunking with overlap
    "q_train_val_split",       # hash-stable train/val/test + strat audit
    "kv_pinned_reads",         # pin() contract promoted to a driver row
    # stale since round 4 (the full list from VERDICT r6 What's-missing #1)
    "kv_prefix_scan", "kv_range_seek", "kv_tombstoned_keys",
    "kv_ttl_classes", "kv_merge_sorted_runs", "q_event_time_windows",
    "q_funnel", "q_mode_event_type", "q_moving_avg", "q_cohort_retention",
    "q1_pricing_summary", "q_top_customers_per_nation", "q_rollup_acctbal",
    "q_set_ops", "q_scalar_functions", "q_running_totals", "q_sessionize",
    "q_session_window", "q_avg_order_gap", "q12_ship_lag_shape",
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q14_promo_effect", "q17_small_quantity", "q19_discounted_revenue",
    "q22_global_sales", "q_asof_join", "q_cube_orders", "q_grouping_sets",
    "q_approx_percentile", "q_time_rollup", "q_time_gapfill", "q_semi_join",
    "q_token_budget_packing", "text_repetition", "text_ngram_topk",
    "sim_quantized_cosine",
    # code paths touched round 7
    "kv_changefeed_preimage",  # durable pre-images across compaction
    # (kv_version_history displaced by kv_range_delete — r6 green; the
    # at_version path is exercised by kv_changefeed_preimage's durable
    # pre-image resolution)
    "kv_stream_ingest",        # TTL rides the streaming write path
    "sim_ann_ivfpq",           # residual encoding + rank_centroids refactor
    # displaced by the seven head-inserts: kv_point_lookup, kv_latest_live,
    # kv_gc_discard_stats, kv_value_separation, sim_ann_ivf_kmeans,
    # sim_ann_pq, kv_changefeed (all green r5/r6; the displaced ANN rows
    # share rank_centroids and the trained-structure memos with
    # sim_ann_ivfpq, which stays in the window; kv_changefeed's
    # changes_since path is exercised by kv_changefeed_preimage AND the
    # new kv_replication row)
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
