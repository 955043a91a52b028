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
# needs a fresh CORRECTNESS row. Round 10 COMPLETES the archival
# rotation (VERDICT r9 item 1): the head is exactly the 44 remaining
# r6-vintage rows (staged verbatim as last round's CHECK_PRIORITY
# [50:94]; r6 predates the decimal-ban enforcement gate, the join-pin
# refactors, and the int64 index work) plus the 2 queries registered
# this round (retrieval/dedup quality gates, VERDICT r9 item 5) and
# dedup_ngram_jaccard (source changed: pair list memoized) — 47 of
# the 50-row window. After this round every query's latest
# CORRECTNESS row is r7+ and the rotation debt is fully paid.
CHECK_PRIORITY: list[str] = [
    # --- r10 head: the final r6-vintage batch -----------------------
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
    # --- new this round (VERDICT r9 item 5): quality gates closing
    # the 'measured, not asserted' gaps in the retrieval/dedup tiers --
    "retrieval_eval_bm25",
    "dedup_minhash_pr_gate",
    # --- re-green after r10 source change: the exact-Jaccard pair
    # list is now persisted + memoized (second consumer arrived) -----
    "dedup_ngram_jaccard",
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
