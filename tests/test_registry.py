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

# Round-16 check window (pure maintenance continues; staged at r15
# close in ROADMAP.md "Round 16 window staging"): the 44 remaining
# r12-vintage rows — the sketch/approx-gate tier, the reference-compat
# trio, the q30-q34 relational block, events/streaming, sampling/
# training-assembly, the two remaining dedup rows, the text-analysis
# tier, the UDF/UDAF/UDTF trio, and the three remaining multimodal
# codec rows — plus 6 padding slots filled with the oldest
# (r13-vintage) expensive/headline rows (recursive CTE, pagerank,
# simjoin, profiling, hygiene). Round-16 re-green enumeration: the
# round's source changes close the three r15 ADVICE items (session.py
# flag-form match, bench.py explicit partition raises, tests/conftest
# guarded path setup) — no engine query path touched, zero
# displacement, the staged rotation stands.
_ROUND16_MUST_CHECK = [
    "ann_ivf_recall_gate",
    "ann_search_ivf_gate",
    "approx_distinct_gate",
    "bloom_semi_filter",
    "cms_heavy_hitters",
    "histogram_equi_depth",
    "stats_numeric",
    "mr_grouped_avg_compat",
    "mr_pickle_compat",
    "mr_wordcount_compat",
    "q30_min_cost_supplier",
    "q31_important_stock",
    "q32_suppliers_who_kept_waiting",
    "q33_global_sales_opportunity",
    "q34_event_funnel",
    "skewed_agg_salted",
    "events_range_join",
    "events_session_10m",
    "events_sliding_1h_30m",
    "events_stream_join_live",
    "streaming_dedup_live",
    "streaming_tumbling_live",
    "corpus_mix_weighted",
    "corpus_shuffle_shard",
    "pack_sequences",
    "sample_bottomk",
    "sample_stratified_bottomk",
    "split_train_test",
    "dedup_embedding_cosine",
    "dedup_substring_hashed",
    "text_fingerprint",
    "text_lang_id",
    "text_lm_coverage",
    "text_quality_score",
    "text_token_ids",
    "text_token_stats",
    "text_vocab",
    "text_winnow_fingerprints",
    "udaf_grouped_sum",
    "udf_scalar_disc_price",
    "udtf_tokenize",
    "multimodal_decode_lossless",
    "multimodal_decode_progressive",
    "multimodal_decode_subsampled",
    "q47_reorder_streaks",
    "graph_pagerank",
    "simjoin_prefix_filter",
    "table_profile",
    "corpus_health_report",
    "pipeline_hygiene",
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
    out = [q for q in _ROUND16_MUST_CHECK if q not in window]
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
    # the emitted line must stay far below the driver's tail capture
    # (~2.4 KB observed in round 6): worst-case 6 bytes per timing
    # (5-digit centiseconds + comma) + ~400 bytes of metadata
    assert 6 * len(HEADLINE) + 400 < 1200
