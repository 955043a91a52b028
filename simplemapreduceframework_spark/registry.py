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
# needs a fresh CORRECTNESS row. The round-9 archive rotation debt was
# settled in round 10 (every latest row is r7+); round 11 CONTINUES
# the steady-state rotation so no row's evidence goes stale: the head
# is 45 of the 48 queries whose latest CORRECTNESS row is r7-vintage
# (r7 predates the r8 join-pin refactors, the r9 int64 index work, and
# the r10 memoizations), plus re-greens for the 5 queries whose source
# changed this round (the persisted BM25 pivot is now shared by the
# WHOLE family — text_bm25 and hybrid_search_rrf joined
# text_bm25_batch/retrieval_eval_bm25 on it — and the co-purchase pair
# counts are persisted once and shared by basket_part_pairs /
# basket_rules / graph_triangles). Source-changed re-greens outrank
# vintage, so 3 frozen-codec r7 rows (multimodal_decode_lossless /
# _progressive / _subsampled — untouched code, re-verified by the
# local decode suite every round) slip to the round-12 head. 50 of the
# 50-row window; zero new queries this round.
CHECK_PRIORITY: list[str] = [
    # --- r11 head: 45 of the 48 r7-vintage rows ---------------------
    "ann_cosine_topk",
    "approx_percentiles_gate",
    "basket_rules",
    "corpus_snapshot_diff",
    "dedup_canonical",
    "dedup_exact",
    "dedup_substring",
    "doc_similarity_sparse",
    "embedding_pca_gate",
    "entity_golden_records",
    "events_attribution",
    "events_capped_contributions",
    "events_dedup",
    "events_funnel",
    "events_outlier_mad",
    "events_resample_ffill",
    "exact_percentiles",
    "experiment_readout",
    "graph_pagerank_dangling",
    "graph_triangles",
    "incremental_mv_refresh",
    "multimodal_audio_adpcm",
    "multimodal_audio_flac",
    "multimodal_decode_color",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    "q26_sql_api",
    "q27_promo_revenue",
    "q28_hierarchical_rollup",
    "q29_large_orders",
    "q35_grouping_sets",
    "q36_lateral_topn",
    "q37_range_frame_window",
    "sample_weighted_bottomk",
    "split_leakage_safe",
    "stats_exact_moments",
    "streaming_capped_contrib_live",
    "streaming_mv_refresh_live",
    "streaming_normalize_live",
    "text_normalize_unicode",
    "tokenizer_fertility",
    "train_negative_sampling",
    # --- re-green after the r11 source changes: the persisted BM25
    # pivot is shared by the whole family, and the co-purchase pair
    # counts are persisted once for the whole basket tier (the three
    # queries below join basket_rules / graph_triangles, already in
    # the vintage head above) ----------------------------------------
    "text_bm25_batch",
    "retrieval_eval_bm25",
    "text_bm25",
    "hybrid_search_rrf",
    "basket_part_pairs",
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
