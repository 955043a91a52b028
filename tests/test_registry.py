"""Registry consistency canaries: the driver consumes CHECK_PRIORITY
ordering and the queries()/oracle_sql() dicts verbatim, so a typo'd
priority entry or a new query drifting past the driver's ~50-query
check budget silently loses its CORRECTNESS row. These tests make that
loss loud."""

from __future__ import annotations

from simplemapreduceframework_spark import registry

registry.load_all()

# The driver's per-round correctness budget (50 in every observed
# round). New queries listed beyond this index never get a row.
_DRIVER_BUDGET = 50

# Round-17 check window (optimization round 1): the re-green rule is
# supreme and this round CHANGED query paths — the head leads with the
# 12 source-changed queries (q47/table_profile/events_outlier_mad/
# privacy_t_closeness/q45/q29/text_pmi_pairs/ann_lsh_bucketed and the
# four connected-components/label consumers) plus the 7 queries whose
# executed join strategy the session-level preferSortMergeJoin=false
# flip changed. The remaining 31 slots take the staged r13-vintage
# rotation (ROADMAP.md "Round 17 window staging") in order. Session 2
# changed bpe.py's _train path, adding bpe_first_merge_gate /
# bpe_learn_merges / bpe_encode to the head; 15 displaced staged rows
# roll to r18 in total. Contains four declared rows-only queries
# (ann_ivf_topk, approx_distinct, bpe_learn_merges, bpe_encode):
# expect 46 hash-green + 4 rows-only rows.
_ROUND17_MUST_CHECK = [
    "q47_reorder_streaks",
    "table_profile",
    "events_outlier_mad",
    "privacy_t_closeness",
    "q45_small_quantity_revenue",
    "q29_large_orders",
    "text_pmi_pairs",
    "ann_lsh_bucketed",
    "dedup_clusters",
    "dedup_canonical",
    "split_leakage_safe",
    "entity_golden_records",
    "bpe_encode_gate",
    "corpus_snapshot_diff",
    "graph_pagerank",
    "graph_pagerank_dangling",
    "hybrid_search_rrf",
    "q46_bulk_widget_suppliers",
    "text_lang_id",
    "bpe_first_merge_gate",
    "bpe_learn_merges",
    "bpe_encode",
    "ann_ivf_ndcg_gate",
    "ann_ivf_topk",
    "ann_quantized_gate",
    "approx_distinct",
    "asof_join_events",
    "curriculum_schedule",
    "customer_rfm_segments",
    "dedup_incremental",
    "dedup_winnow",
    "embedding_quantize",
    "events_cohort_retention",
    "events_hourly_seasonality",
    "events_outlier_zscore",
    "events_range_join_bucketed",
    "events_session_stats",
    "events_state_intervals",
    "events_transition_matrix",
    "events_trend_slope",
    "fuzzy_match_parts",
    "multimodal_decode",
    "multimodal_frame_sample",
    "part_monthly_demand_features",
    "pipeline_chunked_corpus",
    "q1_pricing_summary",
    "q38_disjunctive_predicate",
    "q39_nation_volume",
    "q40_window_distribution",
    "q41_top_supplier",
]


def test_priority_entries_exist_and_are_unique():
    missing = [q for q in registry.CHECK_PRIORITY if q not in registry.QUERIES]
    assert not missing, f"CHECK_PRIORITY names unknown queries: {missing}"
    dupes = {
        q
        for q in registry.CHECK_PRIORITY
        if registry.CHECK_PRIORITY.count(q) > 1
    }
    assert not dupes, f"duplicate CHECK_PRIORITY entries: {dupes}"


def test_new_queries_sit_inside_the_driver_budget():
    window = registry.CHECK_PRIORITY[:_DRIVER_BUDGET]
    out = [q for q in _ROUND17_MUST_CHECK if q not in window]
    assert not out, (
        f"new queries outside the driver's {_DRIVER_BUDGET}-query check "
        f"window (would never get a CORRECTNESS row): {out}"
    )


def test_every_query_has_oracle_or_documented_rows_only():
    rows_only = set(registry.QUERIES) - set(registry.ORACLES)
    assert rows_only == registry.ROWS_ONLY
    # rows-only stays a short, deliberate list (each needs a twin gate)
    assert len(rows_only) <= 6, sorted(rows_only)


def test_ordering_puts_priority_head_first():
    ordered = list(registry.all_queries())
    head = [q for q in registry.CHECK_PRIORITY if q in registry.QUERIES]
    assert ordered[: len(head)] == head


def test_bench_manifest_matches_headline_order():
    """The driver-captured bench line carries per-query timings as a
    bare centisecond array; BENCH_MANIFEST.json is the committed
    name<->index map. A HEADLINE edit without a manifest regen would
    silently mislabel every timing in the round record."""
    import json
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:  # r16 ADVICE: no duplicate-path build-up
        sys.path.insert(0, root)
    from bench import HEADLINE

    with open(os.path.join(root, "BENCH_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["order"] == HEADLINE
    assert manifest["t_unit"] == "centiseconds"
    # every headline query is a registered query
    missing = [q for q in HEADLINE if q not in registry.QUERIES]
    assert not missing, missing
    # the emitted line must stay below the driver's tail capture
    # (exactly 2000 bytes in every committed BENCH_r*.json). The r18
    # line = t_cs array (worst-case 6 bytes per timing) + ~450 bytes
    # of metadata + the LINE_PRIORITY named dict, which bench.py
    # self-sizes under LINE_BYTE_BUDGET — pin the floor leaves room
    # for at least 25 named entries, and the budget under the capture.
    from bench import LINE_BYTE_BUDGET, LINE_PRIORITY

    assert LINE_BYTE_BUDGET <= 1900
    fixed = 6 * len(HEADLINE) + 450
    head_cost = sum(len(n) + 9 for n in LINE_PRIORITY[:25])
    assert fixed + head_cost < LINE_BYTE_BUDGET
    # the priority list names real headline queries, exactly once each
    assert sorted(LINE_PRIORITY) == sorted(HEADLINE)
