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
# insertion order. Round-8 rotation: lead with everything added this
# round, then the 39 queries whose most recent driver row is round 5
# (the stalest cohort — every r4-stale query was refreshed in r7), then
# fill with r6-stale queries on code paths round 8 touches (the
# changefeed expansion prune, the store-wide cache lock) plus the
# stalest remaining families.
# PROTOCOL: a query added to the registry after this list is frozen must
# be inserted at the HEAD at that moment (displacing the last fill
# entry), not next round.
_PRIORITY = [
    # added round 8 (head-insert at add time, per protocol)
    "text_langid_ngram",       # TextCat trigram-profile language ID
    "q_join_skew_profile",     # pre-flight skew diagnostic for big joins
    "graph_kcore",             # iterative peeling with convergence assert
    "multimodal_frame_sample", # frame-sampling plan under the gate
    "kv_compaction_filter",    # RocksDB CompactionFilter analog
    "pipeline_pretrain_v2",    # modern composed chain (LM/span/mix stages)
    "stream_lm_filter",        # in-stream LM scoring vs the batch model
    "text_dup_spans",          # cross-doc exact-substring span dedup
    "kv_stream_replication",   # continuous CDC shipping w/ held resume seq
    "kv_snapshot_holds",       # tracked holds gate tombstone retirement
    "text_lm_score",           # char-bigram corpus-likelihood filter
    "q_domain_mixture",        # temperature-weighted source mixture
    # stale since round 5 (the stalest cohort, all green there)
    "kv_latest_live", "kv_point_lookup", "kv_gc_discard_stats",
    "kv_binary_key_scan", "q_orders_by_month", "q_json_extract",
    "q_pivot_event_types", "q_anti_join", "q_median_quantity",
    "q_p95_disc", "q_string_agg", "q_correlation", "q_pandas_udf_score",
    "q_linear_regression", "graph_degrees", "graph_pagerank",
    "graph_adjacency", "text_stats", "text_tokenize_udtf",
    "text_decontaminate", "text_shard_assignment", "dedup_minhash_capped",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "sim_topk_cosine", "sim_ann_bucketed",
    "sim_ann_ivf", "sim_label_centroids", "dedup_embedding_cosine",
    # (multimodal_bytes displaced by the text_langid_ngram head-insert —
    # the multimodal family is freshly covered by multimodal_frame_sample
    # and multimodal_chunking this round)
    "multimodal_chunking", "quality_column_profile",
    "quality_duplicate_keys", "q_stream_sessionize", "q_stream_dedup",
    "q_stream_rollup", "q_stream_interval_join",
    # fills: r6-stale queries on code paths round 8 touches first
    # (fills q_window_family, q9_profit_shape, graph_components,
    # graph_triangles, kv_stream_enrich, kv_value_separation,
    # kv_version_history, kv_changefeed displaced by the
    # kv_stream_replication, text_dup_spans, stream_lm_filter,
    # pipeline_pretrain_v2, kv_compaction_filter, multimodal_frame_sample,
    # graph_kcore, q_join_skew_profile head-inserts)
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
