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
# insertion order. Round-12 rotation (VERDICT r11 #1): the lifetime
# ledger after r11 is 19 names last green r8 (already AT the 3-round
# staleness bound — tools/staleness_check.py fails unless they lead this
# window), 49 last green r9, 48 r10, 50 r11. Head = the 19 r8-stale
# names, then 31 fill from the r9 cohort (the next-oldest; the 18 r9
# names left out of this window go ahead of the r10 cohort in the r13
# rotation, which the staleness tool will enforce then). No sacrifices
# this round — every at-bound name is in the window.
# PROTOCOL: a query added to the registry after this list is frozen must
# be inserted at the HEAD at that moment (displacing the last fill
# entry), not next round. Displaced entries here are r9-green — one
# round of slack before their bound, so displacement is safe this round.
_PRIORITY = [
    # (mid-round inserts, newest first, each displacing the then-last
    # fill entry per protocol. r12 insert log: multimodal_decode CHANGED
    # — gained the baseline-JPEG lane (doc_id%6=5, the third entropy
    # codec), so its r11 green must be re-earned; displaced
    # graph_triangles, r9-green with slack until r13. graph_scc NEW —
    # converged FW-BW-Trim strongly connected components, closing the
    # GraphX-library gap — displaced graph_two_hop, same r9 cohort.
    # text_dup_suffix NEW — suffix-grade maximal shared substrings via
    # per-pair diagonal seed-and-extend — displaced graph_mutual_follows,
    # same r9 cohort. source_warc_cdx NEW — CDX-indexed WARC random
    # access with arithmetically-checked offsets — displaced
    # q_source_balanced_sample, same r9 cohort. sim_ann_ivfpq CHANGED —
    # residual codebooks 16->32 entries + shortlist 50->100, recall 0.68
    # -> 0.88 — green must be re-earned; displaced q_stratified_sample,
    # same r9 cohort. graph_lpa NEW — synchronous deterministic label
    # propagation, the final GraphX-library member — displaced
    # q_hash_sampled_stats, same r9 cohort. multimodal_jpeg_color NEW —
    # the full COLOR JPEG pipeline (YCbCr, 4:2:0, interleaved MCUs)
    # exact-value checked via constant MCUs — displaced
    # q_skew_salted_join, same r9 cohort. text_dedup_rewrite NEW — the
    # REMOVAL half of substring dedup (cleaned-corpus digest under the
    # min-doc ownership rule) — displaced q_range_join_bucketed, same
    # r9 cohort. q_hll_sketch NEW — HyperLogLog with exact-value
    # registers + estimate (the cardinality companion to
    # q_countmin_sketch) — displaced q_token_budget_packing_bpe, same
    # r9 cohort. q_stream_hll NEW — the streaming twin: mergeable
    # registers across micro-batches, bit-identical sketch, shared
    # oracle — displaced q_array_hof, same r9 cohort. stream_warc_cdx
    # NEW — the CDX random-access path as a continuous stream-static
    # pipeline, shared oracle — displaced q_weighted_sample, same r9
    # cohort. multimodal_flac NEW — FLAC, the fourth entropy codec
    # (Rice) and the first COMPRESSED audio container, lossless so the
    # oracle is pure sample arithmetic — displaced q_window_family,
    # same r9 cohort.)
    "multimodal_flac",
    "stream_warc_cdx",
    "q_stream_hll",
    "q_hll_sketch",
    "text_dedup_rewrite",
    "multimodal_jpeg_color",
    "graph_lpa",
    "sim_ann_ivfpq",
    "source_warc_cdx",
    "text_dup_suffix",
    "graph_scc",
    "multimodal_decode",
    # r8-stale cohort (the full 19 — the entire remaining gap between
    # pytest-green and oracle-green; all at the bound)
    "kv_latest_live", "kv_point_lookup",
    "q_orders_by_month", "q_median_quantity", "q_p95_disc",
    "pipeline_pretrain_v2",
    "text_stats", "text_tokenize_udtf", "text_decontaminate",
    "text_shard_assignment", "text_lm_score", "text_dup_spans",
    "text_langid_ngram",
    "dedup_simhash",
    "sim_topk_cosine", "sim_ann_bucketed", "sim_ann_ivf",
    "sim_label_centroids",
    "stream_lm_filter",
    # r9 fill (31 of 49, oldest-first policy; the other 18 lead r13)
    "kv_version_history", "kv_value_separation", "kv_changefeed",
    "kv_failover",
    "q18_large_volume", "q3_shipping_priority", "q5_local_supplier_volume",
    "q16_supplier_cnt_shape", "q20_excess_shipping_shape",
    "q8_market_share", "q9_profit_shape", "q11_volume_share_shape",
    "q13_custdist", "q15_top_supplier", "q21_waiting_shape",
    "q10_returned_items",
    "q_approx_distinct", "q_rollup_merge", "q_pandas_udaf_trimmed_mean",
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
