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

# Round-12 check window: pure vintage rotation, zero source-changed
# re-greens (the only non-test diffs this round are comment rewording
# and regenerated plan-baseline data — no query's executed plan
# changes). Head = the 3 frozen-codec r7 rows displaced by the r11
# re-greens, then 47 of the 50 r8-vintage rows with the gate rows and
# the compat mr_* capability-declaration trio first. The 3-row tail
# deferred to r13: ann_ivf_topk / approx_distinct (rows-only; their
# hash-gated twins re-green this round) and multimodal_decode (frozen
# code, siblings fresh). 50 of the 50-row budget; zero new queries.
_ROUND12_MUST_CHECK = [
    "multimodal_decode_lossless",
    "multimodal_decode_progressive",
    "multimodal_decode_subsampled",
    "ann_ivf_recall_gate",
    "ann_search_ivf_gate",
    "approx_distinct_gate",
    "mr_grouped_avg_compat",
    "mr_pickle_compat",
    "mr_wordcount_compat",
    "ann_lsh_bucketed",
    "bloom_semi_filter",
    "cms_heavy_hitters",
    "corpus_mix_weighted",
    "corpus_shuffle_shard",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_substring_hashed",
    "events_range_join",
    "events_session_10m",
    "events_sliding_1h_30m",
    "events_stream_join_live",
    "histogram_equi_depth",
    "pack_sequences",
    "pipeline_clean_corpus",
    "pipeline_prepare_training_data",
    "q30_min_cost_supplier",
    "q31_important_stock",
    "q32_suppliers_who_kept_waiting",
    "q33_global_sales_opportunity",
    "q34_event_funnel",
    "sample_bottomk",
    "sample_stratified_bottomk",
    "skewed_agg_salted",
    "split_train_test",
    "stats_numeric",
    "streaming_dedup_live",
    "streaming_tumbling_live",
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
    out = [q for q in _ROUND12_MUST_CHECK if q not in window]
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
