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
# needs a fresh CORRECTNESS row. Re-green derivation rule (learned the
# hard way in r11, where the staged rationale under-counted the real
# changed set): at round close, diff the operator sources since the
# previous BENCH commit and enumerate EVERY query whose executed code
# path changed — that enumerated set outranks vintage rotation in this
# head; comment-only / test-only / docs diffs do not displace rows.
# Round 14 is the first pure-maintenance round (vintage debt retired
# at r13 close: no latest row is older than r10). Per ROADMAP.md
# "Round 14 window staging", with no query-source changes the cheapest
# way to keep every record fresh is rotating the 44 remaining
# r10-vintage rows through; the 6 slack slots pad with the oldest
# (r11-vintage) expensive/headline rows. Round-14 re-green
# enumeration (from the diff): the round's source changes are
# session.py (driver JVM options plumbing — result- and plan-neutral
# infra, byte-identical plan-baseline regen, same disposition as the
# r13 GCLocker landing) and bench/test/script plan-canary additions
# (no engine query path touched) — zero query displacement, so the
# staged rotation stands in full.
CHECK_PRIORITY: list[str] = [
    # --- 44 r10-vintage rows: reference workloads first --------------
    "wordcount",
    "wordset",
    "wordset_regex",
    "grouped_avg",
    # --- relational / TPC-H-style rows -------------------------------
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
    # --- events / tables ----------------------------------------------
    "events_tumbling_1h",
    "table_expectations",
    # --- dedup / BPE / ANN gates --------------------------------------
    "dedup_minhash_pr_gate",
    "dedup_ngram_jaccard",
    "ann_ivf_indexed_gate",
    "bpe_learn_merges",
    "bpe_encode",
    "bpe_encode_gate",
    "bpe_first_merge_gate",
    # --- multimodal real-decoder rows ---------------------------------
    "multimodal_meta",
    "multimodal_decode_real",
    "multimodal_audio_real",
    # --- 6 padding rows: oldest (r11) expensive/headline rows
    # --- (displaced by any source-changed re-greens at round close) ---
    "entity_golden_records",
    "basket_rules",
    "graph_triangles",
    "hybrid_search_rrf",
    "incremental_mv_refresh",
    "text_bm25",
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
