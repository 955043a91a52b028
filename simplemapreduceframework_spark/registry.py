"""Query registry: the single source of truth for the declared surface.

Every operator from SURVEY.md section 2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports these
dicts to the driver, and tests iterate them for local oracle parity.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Queries intentionally registered without an oracle (non-SQL-expressible
# or approximate); the driver records a rows-only check for these.
ROWS_ONLY: set[str] = set()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            ROWS_ONLY.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        bpe,
        dedup,
        graph,
        linalg,
        linkage,
        llmfilters,
        multimodal,
        pipeline,
        referenceq,
        relational,
        relational2,
        relational3,
        relational4,
        retrieval,
        similarity,
        streamingq,
        textanalysis,
        textnorm,
        timeseries,
        traindata,
        udfs,
    )
    from .compat import compatq  # noqa: F401
    from .sources import maintenance  # noqa: F401  (incremental MV query)


# Driver-check ordering. The verify driver checks queries in dict order
# with a per-round cap (50 per round), so the head is whatever most
# needs a fresh CORRECTNESS row. Round 9 continues the archival
# rotation (VERDICT r8 items 1 and 5): the head is EXACTLY the 47
# queries whose latest driver row is r5-vintage (predating the
# decimal-ban enforcement gate, session-memo unification, and the r8
# join-pin refactors), fragile families first, plus bpe_encode_gate
# (the r6-vintage evidence row for the rows-only BPE queries) and the
# two queries whose source changed this round (simjoin_prefix_filter's
# index switched to int64 shingle keys; dedup_ngram_jaccard's size
# joins pin past the corpus threshold) — exactly the 50-row window.
# The 44 remaining r6-vintage queries are staged immediately after and
# rotate in round 10, completing the archive refresh.
CHECK_PRIORITY: list[str] = [
    # --- r9 head: r5-vintage rows, fragile families first ----------
    # streaming twins
    "streaming_decontaminate_live",
    "streaming_enrich_live",
    "streaming_hygiene_live",
    "streaming_ingest_pipeline_live",
    "streaming_session_live",
    "streaming_sliding_live",
    "streaming_stateful_totals_live",
    # events / time series
    "events_cohort_retention",
    "events_hourly_seasonality",
    "events_outlier_zscore",
    "events_range_join_bucketed",
    "events_session_stats",
    "events_state_intervals",
    "events_transition_matrix",
    "events_trend_slope",
    # ANN / dedup / BPE gates
    "ann_ivf_ndcg_gate",
    "ann_quantized_gate",
    "dedup_winnow",
    "embedding_quantize",
    "bpe_first_merge_gate",
    "bpe_learn_merges",
    # retrieval + linkage
    "basket_part_pairs",
    "fuzzy_match_parts",
    "hybrid_search_rrf",
    "text_bm25",
    "text_bm25_batch",
    "text_bm25_indexed",
    # text hygiene
    "text_chunk",
    "text_decontaminate",
    "text_pii_scrub",
    "text_pmi_pairs",
    "text_quality_classifier",
    "text_repetition_filter",
    "pipeline_chunked_corpus",
    "pipeline_hygiene",
    # analytics / profiling
    "corpus_health_report",
    "curriculum_schedule",
    "customer_rfm_segments",
    "multimodal_frame_sample",
    "part_monthly_demand_features",
    "q38_disjunctive_predicate",
    "q39_nation_volume",
    "q40_window_distribution",
    "q41_top_supplier",
    "q42_product_profit",
    "table_profile",
    "table_skew_report",
    # --- r6-vintage BPE evidence row (VERDICT r8 item 5) -----------
    "bpe_encode_gate",
    # --- re-green after r9 source changes (int64 shingle keys; the
    # ngram size-join pin) — fills the 50-row window exactly ---------
    "simjoin_prefix_filter",
    "dedup_ngram_jaccard",
    # --- staged for r10 rotation: remaining r6-vintage rows --------
    "ann_ivf_indexed_gate",
    "asof_join_events",
    "bpe_encode",
    "dedup_incremental",
    "events_tumbling_1h",
    "graph_pagerank",
    "grouped_avg",
    "multimodal_audio_real",
    "multimodal_decode_real",
    "multimodal_meta",
    "q1_pricing_summary",
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
    "q47_reorder_streaks",
    "table_expectations",
    "wordcount",
    "wordset",
    "wordset_regex",
]



def _ordered(d: dict[str, Any]) -> dict[str, Any]:
    head = {k: d[k] for k in CHECK_PRIORITY if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)


def describe() -> dict[str, Any]:
    load_all()
    return {
        "n_queries": len(QUERIES),
        "n_oracled": len(ORACLES),
        "rows_only": sorted(ROWS_ONLY),
    }
