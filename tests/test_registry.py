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

# Round-15 check window (pure maintenance continues; staged at r14
# close in ROADMAP.md "Round 15 window staging"): the 44 remaining
# r11-vintage rows — the SQL-API relational block, the events/
# time-series tier, stats gates, the dedup/similarity/retrieval tier,
# graph/training-data, the privacy triad, text/tokenizer, the
# multimodal codec rows, and the streaming twins — plus 6 padding
# slots filled with the oldest (r12-vintage) expensive/headline
# dedup/pipeline rows. Round-15 re-green enumeration: the round's
# source changes are session.py _driver_java_options override
# semantics (result- and plan-neutral infra, byte-identical
# plan-baseline regen) and the plan-canary generalization in
# bench/scripts/tests (no engine query path touched) — zero
# displacement, the staged rotation stands.
_ROUND15_MUST_CHECK = [
    "q26_sql_api",
    "q27_promo_revenue",
    "q28_hierarchical_rollup",
    "q29_large_orders",
    "q35_grouping_sets",
    "q36_lateral_topn",
    "q37_range_frame_window",
    "events_attribution",
    "events_capped_contributions",
    "events_dedup",
    "events_funnel",
    "events_outlier_mad",
    "events_resample_ffill",
    "experiment_readout",
    "approx_percentiles_gate",
    "exact_percentiles",
    "stats_exact_moments",
    "sample_weighted_bottomk",
    "ann_cosine_topk",
    "basket_part_pairs",
    "corpus_snapshot_diff",
    "dedup_canonical",
    "dedup_exact",
    "dedup_substring",
    "doc_similarity_sparse",
    "embedding_pca_gate",
    "retrieval_eval_bm25",
    "text_bm25_batch",
    "graph_pagerank_dangling",
    "split_leakage_safe",
    "train_negative_sampling",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    "text_normalize_unicode",
    "tokenizer_fertility",
    "multimodal_audio_adpcm",
    "multimodal_audio_flac",
    "multimodal_decode_color",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "streaming_capped_contrib_live",
    "streaming_mv_refresh_live",
    "streaming_normalize_live",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "ann_lsh_bucketed",
    "pipeline_clean_corpus",
    "pipeline_prepare_training_data",
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
    out = [q for q in _ROUND15_MUST_CHECK if q not in window]
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
