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
# insertion order. Round-6 rotation: (a) the three round-5 additions that
# landed after the round-5 window froze and so have ZERO lifetime driver
# rows, (b) everything whose last driver row is round 3, (c) every query
# whose code path changed this round (TPC-H forced-hint removal, the
# kv_value_separation payload-hint removal, the as_of prune gate, the
# shared capped-shingle frame, trained PQ codebooks), (d) fill from the
# round-4-stale remainder. PROTOCOL: a query added to the registry after
# this list is frozen must be inserted at the HEAD at that moment
# (displacing the last fill entry), not next round.
_PRIORITY = [
    # NEW this round (inserted at head per protocol, displacing the last
    # fill entries q6_forecast_revenue / q4_order_priority /
    # kv_merge_sorted_runs / kv_ttl_classes)
    "kv_stream_ingest", "pipeline_pretrain_corpus", "sim_ann_ivfpq",
    "kv_stream_enrich",
    # never driver-checked (added after the round-5 window froze)
    "dedup_exact_normalized", "q_source_balanced_sample",
    "quality_filter_reasons",
    # stale since round 3
    "q13_custdist", "q15_top_supplier", "q21_waiting_shape",
    "q_approx_distinct", "q_rollup_merge", "q_pandas_udaf_trimmed_mean",
    "q_window_family", "q_weighted_sample", "q_array_hof",
    "q_range_join_bucketed", "q_skew_salted_join", "q_hash_sampled_stats",
    "q_stratified_sample", "graph_mutual_follows", "graph_two_hop",
    "graph_triangles", "graph_components", "text_token_count",
    "text_langid", "text_quality", "text_fingerprint",
    "text_source_profile", "text_tfidf_keywords", "quality_pattern_scan",
    # code paths touched this round
    "kv_value_separation",    # forced payload broadcast removed
    "kv_version_history",     # as_of prune gated on the max_seq marker
    "kv_changefeed",          # epoch-split compaction changes its pruning
    "kv_changefeed_preimage",
    "sim_ann_pq",             # trained per-subspace codebooks
    "sim_ann_ivf_kmeans",     # kmeans_centroids now releases round blocks
    "dedup_ngram_jaccard",    # shared capped-shingle memo
    "dedup_containment", "dedup_cluster_keep",
    "graph_khop",             # frontier/dist block release
    # forced-hint removal representatives (all 15 share the one-line change
    # class; the judge's full oracle sweep covers the rest)
    "q3_shipping_priority", "q5_local_supplier_volume", "q18_large_volume",
    "q10_returned_items", "q8_market_share", "q9_profit_shape",
    "q11_volume_share_shape", "q16_supplier_cnt_shape",
    "q20_excess_shipping_shape",
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
