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
        linkage,
        llmfilters,
        multimodal,
        pipeline,
        referenceq,
        relational,
        relational2,
        relational3,
        retrieval,
        similarity,
        streamingq,
        textanalysis,
        timeseries,
        traindata,
        udfs,
    )
    from .compat import compatq  # noqa: F401


# Driver-check ordering. The verify driver checks queries in dict order
# with a per-round cap (50 in round 1), so queries that have never
# produced a CORRECTNESS row, plus ones whose gate changed this round,
# are listed first; long-green queries fall to the tail where a cap
# costs nothing (their round-1 rows stand).
CHECK_PRIORITY: list[str] = [
    # round 5 late additions — never driver-checked, check first
    "text_bm25",  # new: BM25 top-k lexical retrieval
    "fuzzy_match_parts",  # new: blocked levenshtein record linkage
    "events_resample_ffill",  # new: hourly grid resample + forward fill
    "graph_pagerank",  # new: fixed-point PageRank over co-supply graph
    "streaming_session_live",  # new: stateful session windows on a live stream
    "events_outlier_mad",  # new: decimal-exact MAD robust outliers
    "events_state_intervals",  # new: SCD-2 state history from events
    "curriculum_schedule",  # new: easy-to-hard curriculum phases, no Window
    "hybrid_search_rrf",  # new: BM25 + dense cosine reciprocal-rank fusion
    "events_cohort_retention",  # new: weekly cohort retention triangle
    "table_profile",  # new: per-column ANALYZE-style profiling
    "text_pmi_pairs",  # new: adjacent-bigram PMI collocations
    "text_bm25_indexed",  # new: persisted inverted-index BM25, full value gate
    "q39_nation_volume",  # new: TPC-H Q7-shape double nation alias
    "streaming_enrich_live",  # new: stream-static broadcast enrichment
    "events_range_join_bucketed",  # new: (user, bucket)-co-partitioned range join
    "streaming_stateful_totals_live",  # new: applyInPandasWithState, full value gate
    "q40_window_distribution",  # new: percent_rank/cume_dist/nth_value gauntlet
    "table_skew_report",  # new: hot-key share report feeding the salting decision
    "text_quality_classifier",  # new: fixed-weight linear quality model scoring
    "text_bm25_batch",  # new: multi-query BM25 from one corpus pass
    "basket_part_pairs",  # new: market-basket support/lift pairs
    "events_trend_slope",  # new: exact-moment least-squares drift
    "q41_top_supplier",  # new: TPC-H Q15-shape scalar-max view reuse
    "customer_rfm_segments",  # new: quartile-threshold RFM scoring
    "multimodal_frame_sample",  # new: 1->N frame fan-out, content-gated
    "events_transition_matrix",  # new: Markov next-event probabilities
    "ann_ivf_ndcg_gate",  # new: ranking-order quality gate (can-fail tested)
    "bpe_first_merge_gate",  # new: BPE training iteration-1 hash gate
    "streaming_sliding_live",  # new: overlapping windows on a live stream
    "part_monthly_demand_features",  # new: lag/rolling forecast features
    "events_hourly_seasonality",  # new: diurnal profile per event type
    "q42_product_profit",  # new: TPC-H Q9-shape profit star with LIKE pruning
    "streaming_ingest_pipeline_live",  # new: dedup->enrich->filter composed stream
    "events_session_stats",  # new: per-user session engagement rollup
    # rows-only: the driver records only a weaker rows check, so it
    # cedes its cap slot to the hash-gated entries above (its REAL
    # verification is the first-merge gate + Python-reference tests)
    "bpe_learn_merges",
    # round 5: new or gate-changed this round — check first
    "text_pii_scrub",  # new: PII detection/redaction
    "text_repetition_filter",  # new: Gopher-style repetition filter
    "text_decontaminate",  # new: benchmark n-gram decontamination
    "pipeline_hygiene",  # new: composed repetition+decon+dedup pipeline
    "dedup_winnow",  # new: winnow-fingerprint near-dup pairs
    "embedding_quantize",  # new: int8 vector quantization, hash-gated
    "ann_quantized_gate",  # new: recall gate over int8-reconstructed search
    "streaming_hygiene_live",  # new: stateless hygiene filter on a live stream
    "streaming_decontaminate_live",  # new: broadcast-set decontamination at ingest
    "text_chunk",  # new: overlapping token chunking
    "q38_disjunctive_predicate",  # new: Q19-shape OR pushdown
    "events_outlier_zscore",  # new: decimal-exact per-group z-score flags
    "pipeline_chunked_corpus",  # new: hygiene -> chunking composition
    "corpus_health_report",  # new: one-row corpus monitoring dashboard
    "multimodal_decode_real",  # new: stdlib BMP/PPM decode roundtrip
    "ann_ivf_indexed_gate",  # new: persisted-index lifecycle gate
    "dedup_ngram_jaccard",  # bucket cap added to engine + oracle
    "text_lang_id",  # trigram-profile scorer, oracle updated
    "corpus_mix_weighted",  # floor semantics pinned on both sides
    # round 5: stale driver rows — the latest CORRECTNESS row for each
    # of these predates the testdata regeneration (r1/r2 vintage);
    # local parity is green on current fixtures, but the driver-visible
    # sf0.01 record should rotate. Timestamp-touching queries first:
    # BENCH_r03 proved that family is where fixture changes bite.
    "events_tumbling_1h",
    "asof_join_events",
    "q9_running_total",
    "q22_null_ordering",
    "q14_scalar_gauntlet",
    "multimodal_meta",
    "wordcount",
    "wordset",
    "wordset_regex",
    "q1_pricing_summary",
    "q2_filter_project",
    "q3_top_revenue_orders",
    "q4_order_priority_semijoin",
    "q5_region_revenue",
    "q6_selective_agg",
    "q7_anti_join",
    "q8_window_topn_per_group",
    "q10_rollup",
    "q11_cube",
    "q12_setops",
    "q13_distinct_agg",
    "q15_conditional_agg",
    "q16_having",
    "q17_multisort_limit",
    "q18_outer_join",
    "q19_cross_join",
    "grouped_avg",
    "q20_window_suite",
    "q21_json_extract",
    "q23_pivot",
    "q24_multiset_ops",
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
