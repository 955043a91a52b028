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
# Round 12 is a pure vintage rotation with ZERO source-changed
# re-greens: the only non-test diffs this round are comment rewording
# (this file, graph.py) and regenerated plan-baseline test data, none
# of which change any query's executed plan. The head is therefore the
# 3 frozen-codec r7 rows displaced by the r11 re-greens
# (multimodal_decode_lossless / _progressive / _subsampled — untouched
# code, re-verified by the local decode suite every round) plus 47 of
# the 50 r8-vintage rows (r8 predates the r9 int64 index work and the
# r10/r11 shared-frame memoizations), gate rows and the compat mr_*
# capability-declaration trio first. The 3-row tail deferred to r13:
# ann_ivf_topk and approx_distinct (rows-only by design; their
# hash-gated twins ann_ivf_recall_gate / ann_search_ivf_gate /
# approx_distinct_gate all get fresh rows THIS round) and
# multimodal_decode (frozen code; its 3 codec siblings re-green this
# round and its 5 other siblings are r11-fresh). 50 of the 50-row
# window; zero new queries this round.
CHECK_PRIORITY: list[str] = [
    # --- r12 head: the 3 displaced frozen-codec r7 rows -------------
    "multimodal_decode_lossless",
    "multimodal_decode_progressive",
    "multimodal_decode_subsampled",
    # --- 47 of the 50 r8-vintage rows: gates + compat trio first ----
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
