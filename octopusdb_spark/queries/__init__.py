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
# insertion order. Round-5 rotation closes the only lifetime coverage
# hole (dedup_simhash_pairs — registry position 100 every prior round,
# never inside any window) and refreshes the 10 queries whose last driver
# row was round 1, then fills with (a) every query whose code path changed
# this round (KV store broadcast gating / single-pass ingest / changefeed
# pre-image; Jaccard hot-shingle cap) and (b) the graph/sim/text families
# last checked in round 3. Next round: rotate the remainder back in.
_PRIORITY = [
    # never driver-checked in any round, plus this round's new queries
    "dedup_simhash_pairs", "kv_changefeed_preimage", "q_stream_sessionize",
    "sim_ann_ivf_kmeans", "sim_ann_pq", "q_stream_dedup",
    "q_stream_rollup", "q_stream_interval_join",
    "q16_supplier_cnt_shape", "q20_excess_shipping_shape",
    "dedup_containment",
    # stale since round 1
    "q_orders_by_month", "q_json_extract", "q_pivot_event_types",
    "q_anti_join", "q_median_quantity", "q_p95_disc", "q_string_agg",
    "q_correlation", "q_pandas_udf_score", "q_linear_regression",
    # KV paths touched this round (broadcast gating, ingest, changefeed)
    "kv_latest_live", "kv_point_lookup", "kv_value_separation",
    "kv_changefeed", "kv_gc_discard_stats", "kv_binary_key_scan",
    # dedup family (Jaccard/cluster hot-shingle cap touched this round)
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_minhash_capped", "dedup_simhash", "dedup_cluster_keep",
    "dedup_embedding_cosine",
    # similarity family (last checked round 3)
    "sim_topk_cosine", "sim_ann_bucketed", "sim_ann_ivf",
    "sim_label_centroids",
    # graph family (last checked round 3)
    "graph_degrees", "graph_pagerank", "graph_adjacency", "graph_khop",
    # text family picks (last checked round 3)
    "text_stats", "text_tokenize_udtf",
    "text_decontaminate", "text_shard_assignment",
    # multimodal + quality (last checked round 3)
    "multimodal_bytes", "multimodal_chunking", "quality_column_profile",
    "quality_duplicate_keys",
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
