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
# insertion order. Round-13 rotation (VERDICT r12 #1): the lifetime
# ledger after r12 is 30 names last green r9 (AT the 3-round staleness
# bound — tools/staleness_check.py fails unless they lead this window),
# 48 r10, 48 r11, 50 r12. Head = the full 30-name r9 cohort, then 20
# fill from the r10 cohort (oldest-first; the 28 r10 names left out of
# this window — plus any displaced below — lead the r14 rotation, which
# the staleness tool will enforce then). No sacrifices this round —
# every at-bound name is in the window.
# PROTOCOL: a query added to the registry after this list is frozen must
# be inserted at the HEAD at that moment (displacing the last fill
# entry), not next round. Displaced entries here are r10-green — safe
# through this round's bound, and the staleness tool projects them into
# the r14 lead automatically.
_PRIORITY = [
    # (mid-round inserts, newest first, each displacing the then-last
    # fill entry per protocol. r13 insert log: multimodal_flac CHANGED —
    # gaining LPC subframes (orders 1..32) and stereo decorrelation
    # (left/right/mid-side) this round, so its r12 green must be
    # re-earned; displaced q_scalar_functions, r10-green with slack
    # until r14. multimodal_mp4_meta NEW — ISO-BMFF box-walk metadata
    # source (versioned mvhd/tkhd layouts, 64-bit largesize, track mix,
    # truncated-mdat fallback all hash-checked; no bitstream decode by
    # documented boundary) — displaced q_set_ops, same r10 cohort.
    # text_line_dedup NEW — CCNet-style line-level boilerplate dedup
    # (12-word segmentation, in-doc first-occurrence + min-doc ownership
    # rules, kept-digest oracle) — displaced q_rollup_acctbal, same r10
    # cohort. sim_ann_drift NEW — persistent-index drift telemetry
    # (per-list residual-norm mean vs build-time + size skew from the
    # O(ledger) stats endpoint, fully arithmetic oracle) — displaced
    # q_top_customers_per_nation, same r10 cohort. multimodal_mp3_meta
    # NEW — MP3 frame-walk metadata (ID3v2 skip, per-frame header walk
    # through the ISO 11172-3 tables, padding-aware sizing, truncation
    # fallback; no entropy decode by documented boundary), the audio
    # half of the crawl-media metadata triad — displaced
    # q1_pricing_summary, same r10 cohort. sim_ann_filtered NEW —
    # metadata-FILTERED ANN (per-query label predicate pre-applied to
    # the IVF candidate frame, nprobe widened 2->4 for selectivity; the
    # production RAG retrieval shape) — displaced q_cohort_retention,
    # same r10 cohort; registry hits the 5-adds/round budget, no more
    # adds this round. kv_column_families CHANGED late-round — the drill
    # now opens its families with MIXED per-CF compaction policies and
    # runs policy-routed maintenance before the verifying compact; it is
    # ALREADY in this window (r10 fill), so the change re-earns green
    # with no displacement.)
    "sim_ann_filtered",
    "multimodal_mp3_meta",
    "sim_ann_drift",
    "text_line_dedup",
    "multimodal_mp4_meta",
    "multimodal_flac",
    # r9-stale cohort (the full 30 — all at the bound)
    "q_window_family", "q_weighted_sample", "q_array_hof",
    "q_token_budget_packing_bpe", "q_range_join_bucketed",
    "q_skew_salted_join", "q_hash_sampled_stats", "q_stratified_sample",
    "q_source_balanced_sample",
    "graph_mutual_follows", "graph_two_hop", "graph_triangles",
    "graph_components", "graph_khop",
    "text_token_count", "text_langid", "text_quality", "text_fingerprint",
    "text_source_profile", "text_tfidf_keywords", "text_dup_runs",
    "dedup_containment", "dedup_exact_normalized", "dedup_cluster_keep",
    "dedup_ngram_jaccard",
    "sim_ann_pq",
    "multimodal_bytes",
    "quality_pattern_scan", "quality_filter_reasons",
    "kv_stream_enrich",
    # r10 fill (19 of 48, oldest-first policy; the other 29 — plus any
    # displaced by this round's inserts — lead r14)
    "kv_prefix_scan", "kv_range_seek", "kv_tombstoned_keys",
    "kv_ttl_classes", "kv_changefeed_preimage", "kv_pinned_reads",
    "kv_replication", "kv_merge_operator", "kv_column_families",
    "kv_range_delete",
    "q_event_time_windows", "q_funnel", "q_mode_event_type",
    "q_moving_avg",
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
