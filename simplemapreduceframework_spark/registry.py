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
        dedup,
        multimodal,
        pipeline,
        referenceq,
        relational,
        relational2,
        relational3,
        similarity,
        streamingq,
        textanalysis,
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
    # round 4: new or changed this round — check first
    "corpus_mix_weighted",
    "ann_search_ivf_gate",
    "ann_ivf_recall_gate",
    "events_range_join",
    "streaming_tumbling_live",
    "streaming_dedup_live",
    "events_stream_join_live",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_vocab",
    # never driver-checked in round 1 (registered after the cap)
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_winnow_fingerprints",
    "text_fingerprint",
    "events_sliding_1h_30m",
    "events_session_10m",
    "mr_wordcount_compat",
    "mr_grouped_avg_compat",
    "udf_scalar_disc_price",
    "udaf_grouped_sum",
    "udtf_tokenize",
    # round-1 reds, fixed this round
    "dedup_simhash",
    "approx_distinct",
    # rows-only in round 1, oracle-gated (or re-shaped) this round
    "dedup_clusters",
    "stats_numeric",
    "ann_lsh_bucketed",
    "bloom_semi_filter",
    # new this round
    "q30_min_cost_supplier",
    "q31_important_stock",
    "q32_suppliers_who_kept_waiting",
    "mr_pickle_compat",
    "approx_distinct_gate",
    "multimodal_decode",
    "ann_ivf_topk",
    "pipeline_clean_corpus",
    "events_dedup",
    "split_train_test",
    "corpus_shuffle_shard",
    "pack_sequences",
    "cms_heavy_hitters",
    "skewed_agg_salted",
    "sample_bottomk",
    "sample_stratified_bottomk",
    "q33_global_sales_opportunity",
    "q34_event_funnel",
    "text_lm_coverage",
    "pipeline_prepare_training_data",
    "text_token_ids",
    "histogram_equi_depth",
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
