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
        relational4,
        retrieval,
        similarity,
        streamingq,
        textanalysis,
        timeseries,
        traindata,
        udfs,
    )
    from .compat import compatq  # noqa: F401
    from .sources import maintenance  # noqa: F401  (incremental MV query)


# Driver-check ordering. The verify driver checks queries in dict order
# with a per-round cap (50 in round 1), so queries that have never
# produced a CORRECTNESS row, plus ones whose gate changed this round,
# are listed first; long-green queries fall to the tail where a cap
# costs nothing (their round-1 rows stand).
CHECK_PRIORITY: list[str] = [
    # round 6 head: the two r5-red rows, re-greened by pinning output
    # types (CAST pagerank's DuckDB-HUGEINT rank to BIGINT, resample's
    # ffill to DECIMAL(18,2) on both engines)
    "events_resample_ffill",
    "graph_pagerank",
    # round 6 new queries
    "graph_pagerank_dangling",  # new: directed graph, dangling-mass contract
    "bpe_encode_gate",  # new: corpus encode under the SQL-learnable merge
    "bpe_encode",  # new (rows-only): full-merge-table tokenization
    "multimodal_audio_real",  # new: RIFF/PCM WAV sample-level decode gate
    "dedup_incremental",  # new: batch-vs-persisted-fingerprint-store dedup
    "events_funnel",  # new: exact ordered-reachability funnel
    "table_expectations",  # new: declarative data-quality rule suite
    "incremental_mv_refresh",  # new: merge-delta summary == full rebuild
    "streaming_mv_refresh_live",  # new: foreachBatch merge over micro-batches
    "q43_market_share",  # new: TPC-H Q8 FILTER-clause share ratio
    "q44_order_count_distribution",  # new: TPC-H Q13 ON-predicate histogram
    "q45_small_quantity_revenue",  # new: TPC-H Q17 correlated AVG
    "q46_bulk_widget_suppliers",  # new: TPC-H Q20 nested IN + HAVING
    "q47_reorder_streaks",  # new: Spark-4 recursive CTE successor walk
    # upgraded (pixel-level gate) + never driver-checked backlog
    "multimodal_decode_real",  # upgraded: exact pixel sum/mean gate
    "ann_ivf_indexed_gate",  # never driver-checked
    # stale tail: latest CORRECTNESS row is round 1 (pre-testdata
    # regeneration). Local parity is green on current fixtures; rotate
    # the driver-visible record. Timestamp-touching family first:
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
    "q25_array_agg",
    "q26_sql_api",
    "q27_promo_revenue",
    "q28_hierarchical_rollup",
    "q29_large_orders",
    "ann_cosine_topk",
    "dedup_ngram_jaccard",
    "exact_percentiles",
    "stats_exact_moments",
    # stale r2/r3 rows — same rotation, one vintage newer
    "dedup_exact",
    "q35_grouping_sets",
    "q36_lateral_topn",
    "q37_range_frame_window",
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
