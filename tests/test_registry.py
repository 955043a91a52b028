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

# Queries introduced or gate-changed in round 7 — each MUST sit inside
# the checked window until it has a (fresh) driver row: the three r6
# hash-red rows re-projected to strings plus the three whose semantics
# were pinned in the same commit, and the four new round-7 queries.
_ROUND7_MUST_CHECK = [
    "events_resample_ffill",
    "incremental_mv_refresh",
    "streaming_mv_refresh_live",
    "events_outlier_mad",
    "graph_pagerank_dangling",
    "events_funnel",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_decode_color",
    "multimodal_decode_subsampled",
    "multimodal_decode_progressive",
    "multimodal_audio_adpcm",
    "multimodal_audio_flac",
    "multimodal_decode_lossless",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    "basket_rules",
    "doc_similarity_sparse",
    "events_attribution",
    "dedup_canonical",
    "corpus_snapshot_diff",
    "events_capped_contributions",
    "experiment_readout",
    "streaming_capped_contrib_live",
    "entity_golden_records",
    "text_normalize_unicode",
    "dedup_substring",
    "tokenizer_fertility",
    "embedding_pca_gate",
    "approx_percentiles_gate",
    "sample_weighted_bottomk",
    "streaming_normalize_live",
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
    out = [q for q in _ROUND7_MUST_CHECK if q not in window]
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
