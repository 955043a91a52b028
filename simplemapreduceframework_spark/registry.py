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
# needs a fresh CORRECTNESS row. Round 8 is the archival-refresh round
# (VERDICT r7 item 1): the head is EXACTLY the 49 queries whose latest
# driver row is r4-vintage (predating the session_memo unification, the
# DecimalType ban, and the NULL-fixture contracts), fragile families
# first, plus the one new r8 query at position 50. The 47 r5-vintage
# queries are staged immediately after and rotate in round 9.
CHECK_PRIORITY: list[str] = [
    # --- r8 head: r4-vintage rows, fragile families first ---------
    # timestamp/streaming
    "events_range_join",
    "events_session_10m",
    "events_sliding_1h_30m",
    "events_stream_join_live",
    "streaming_dedup_live",
    "streaming_tumbling_live",
    # dedup / ANN / sketch arithmetic
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_recall_gate",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "ann_search_ivf_gate",
    "approx_distinct",
    "approx_distinct_gate",
    "bloom_semi_filter",
    "cms_heavy_hitters",
    # TPC-H subqueries + stats
    "q30_min_cost_supplier",
    "q31_important_stock",
    "q32_suppliers_who_kept_waiting",
    "q33_global_sales_opportunity",
    "q34_event_funnel",
    "stats_numeric",
    "histogram_equi_depth",
    "skewed_agg_salted",
    # compat layer + UDF tier
    "mr_wordcount_compat",
    "mr_grouped_avg_compat",
    "mr_pickle_compat",
    "udaf_grouped_sum",
    "udf_scalar_disc_price",
    "udtf_tokenize",
    # text analysis
    "text_fingerprint",
    "text_lang_id",
    "text_lm_coverage",
    "text_quality_score",
    "text_token_ids",
    "text_token_stats",
    "text_vocab",
    "text_winnow_fingerprints",
    # multimodal + pipelines + training assembly
    "multimodal_decode",
    "pipeline_clean_corpus",
    "pipeline_prepare_training_data",
    "corpus_mix_weighted",
    "corpus_shuffle_shard",
    "pack_sequences",
    "sample_bottomk",
    "sample_stratified_bottomk",
    "split_train_test",
    # --- new in r8 (position 50) -----------------------------------
    "dedup_substring_hashed",  # xxhash64-keyed ExactSubstr scale twin
    # --- staged for r9 rotation: r5-vintage rows --------------------
    "streaming_decontaminate_live",
    "streaming_enrich_live",
    "streaming_hygiene_live",
    "streaming_ingest_pipeline_live",
    "streaming_session_live",
    "streaming_sliding_live",
    "streaming_stateful_totals_live",
    "events_cohort_retention",
    "events_hourly_seasonality",
    "events_outlier_zscore",
    "events_range_join_bucketed",
    "events_session_stats",
    "events_state_intervals",
    "events_transition_matrix",
    "events_trend_slope",
    "ann_ivf_ndcg_gate",
    "ann_quantized_gate",
    "dedup_winnow",
    "embedding_quantize",
    "bpe_first_merge_gate",
    "bpe_learn_merges",
    "basket_part_pairs",
    "fuzzy_match_parts",
    "hybrid_search_rrf",
    "text_bm25",
    "text_bm25_batch",
    "text_bm25_indexed",
    "text_chunk",
    "text_decontaminate",
    "text_pii_scrub",
    "text_pmi_pairs",
    "text_quality_classifier",
    "text_repetition_filter",
    "pipeline_chunked_corpus",
    "pipeline_hygiene",
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
