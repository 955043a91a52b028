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

# Round-14 check window (the first pure-maintenance round; staged at
# r13 close in ROADMAP.md "Round 14 window staging"): the 44 remaining
# r10-vintage rows — reference workloads, the TPC-H-style relational
# block, the dedup/BPE/ANN gates, the multimodal real-decoder rows —
# plus 6 padding slots filled with the oldest (r11-vintage)
# expensive/headline rows. Round-14 re-green enumeration: the round's
# source changes are session.py JVM-options plumbing (result- and
# plan-neutral infra, byte-identical plan-baseline regen) and the
# hygiene plan-canary additions in bench/scripts/tests (no engine
# query path touched) — zero displacement, the staged rotation stands.
_ROUND14_MUST_CHECK = [
    "wordcount",
    "wordset",
    "wordset_regex",
    "grouped_avg",
    "q2_filter_project",
    "q3_top_revenue_orders",
    "q4_order_priority_semijoin",
    "q5_region_revenue",
    "q6_selective_agg",
    "q7_anti_join",
    "q8_window_topn_per_group",
    "q9_running_total",
    "q10_rollup",
    "q11_cube",
    "q12_setops",
    "q13_distinct_agg",
    "q14_scalar_gauntlet",
    "q15_conditional_agg",
    "q16_having",
    "q17_multisort_limit",
    "q18_outer_join",
    "q19_cross_join",
    "q20_window_suite",
    "q21_json_extract",
    "q22_null_ordering",
    "q23_pivot",
    "q24_multiset_ops",
    "q25_array_agg",
    "q43_market_share",
    "q44_order_count_distribution",
    "q45_small_quantity_revenue",
    "q46_bulk_widget_suppliers",
    "events_tumbling_1h",
    "table_expectations",
    "dedup_minhash_pr_gate",
    "dedup_ngram_jaccard",
    "ann_ivf_indexed_gate",
    "bpe_learn_merges",
    "bpe_encode",
    "bpe_encode_gate",
    "bpe_first_merge_gate",
    "multimodal_meta",
    "multimodal_decode_real",
    "multimodal_audio_real",
    "entity_golden_records",
    "basket_rules",
    "graph_triangles",
    "hybrid_search_rrf",
    "incremental_mv_refresh",
    "text_bm25",
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
    out = [q for q in _ROUND14_MUST_CHECK if q not in window]
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
    sys.path.insert(0, root)
    from bench import HEADLINE

    with open(os.path.join(root, "BENCH_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["order"] == HEADLINE
    assert manifest["t_unit"] == "centiseconds"
    # every headline query is a registered query
    missing = [q for q in HEADLINE if q not in registry.QUERIES]
    assert not missing, missing
    # the emitted line must stay far below the driver's tail capture
    # (~2.4 KB observed in round 6): worst-case 6 bytes per timing
    # (5-digit centiseconds + comma) + ~400 bytes of metadata
    assert 6 * len(HEADLINE) + 400 < 1200
