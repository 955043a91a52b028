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
# with a per-round cap (50 in round 1), so queries that have never
# produced a CORRECTNESS row, plus ones whose gate changed this round,
# are listed first; long-green queries fall to the tail where a cap
# costs nothing (their round-1 rows stand).
CHECK_PRIORITY: list[str] = [
    # round 7 head: gates CHANGED since their last driver row. The three
    # r6 hash-red rows re-projected decimal -> fixed-scale string (the
    # no-DecimalType rule), plus the three whose semantics were pinned
    # in the same commit (MAD medians to string, dangling-PageRank NULL
    # edge contract, funnel broadcast fallback + NULL empty-top ratio).
    "events_resample_ffill",
    "incremental_mv_refresh",
    "streaming_mv_refresh_live",
    "events_outlier_mad",
    "graph_pagerank_dangling",
    "events_funnel",
    # round 7 new queries
    "multimodal_decode_gif",  # new: GIF LZW pixel decode gate
    "multimodal_decode_jpeg",  # new: baseline JPEG Huffman+IDCT gate
    "multimodal_decode_color",  # new: 4:4:4 color JPEG + YCbCr gate
    "multimodal_decode_subsampled",  # new: 4:2:0 multi-block MCU gate
    "multimodal_decode_progressive",  # new: SOF2 multi-scan decode gate
    "multimodal_audio_adpcm",  # new: IMA-ADPCM compressed-audio gate
    "multimodal_audio_flac",  # new: FLAC container/CRC/subframe gate
    "multimodal_decode_lossless",  # new: SOF3 predictive decode gate
    "privacy_k_anonymity",  # new: QI equivalence-class risk report
    "privacy_l_diversity",  # new: homogeneity-attack companion report
    "privacy_t_closeness",  # new: skew-attack TV-distance report
    "basket_rules",  # new: association rules (support/confidence/lift)
    "doc_similarity_sparse",  # new: sparse-cosine similarity index join
    "events_attribution",  # new: first/last-touch conversion attribution
    "dedup_canonical",  # new: per-cluster representative election
    "corpus_snapshot_diff",  # new: fingerprint-level dataset version diff
    "events_capped_contributions",  # new: DP-style contribution bounding
    "experiment_readout",  # new: A/B arm split + lift + pooled z
    "streaming_capped_contrib_live",  # new: live contribution bounding
    "entity_golden_records",  # new: ER transitive merge + golden election
    "simjoin_prefix_filter",  # new: lossless prefix-filtered Jaccard join
    "graph_triangles",  # new: degree-oriented triangle counting
    "train_negative_sampling",  # new: seeded contrastive negatives
    "split_leakage_safe",  # new: cluster-keyed train/test split
    "text_normalize_unicode",  # new: NFC normalize (pandas UDF, exact)
    "dedup_substring",  # new: cross-doc exact-substring duplication
    "tokenizer_fertility",  # new: per-lang chars/token report
    "embedding_pca_gate",  # new: distributed PCA variance-identity gate
    "approx_percentiles_gate",  # new: quantile-sketch rank-error gate
    "sample_weighted_bottomk",  # new: A-ES weighted sample w/o replacement
    "streaming_normalize_live",  # new: pandas-UDF NFC at ingest (live twin)
    # stale r1 rows (pre-testdata regeneration) — rotate the record
    "dedup_ngram_jaccard",
    "q26_sql_api",
    "q27_promo_revenue",
    "q28_hierarchical_rollup",
    "q29_large_orders",
    "stats_exact_moments",
    "exact_percentiles",
    "ann_cosine_topk",
    # stale r3 rows
    "dedup_exact",
    "q35_grouping_sets",
    "q36_lateral_topn",
    "q37_range_frame_window",
    # r4-vintage rotation (oldest remaining rows). Fragile families
    # first: timestamp/streaming, then dedup/ann arithmetic, then the
    # TPC-H subqueries and compat layer. The ~22 r4 rows that miss the
    # 50-slot cap rotate in round 8.
    "events_dedup",
    "events_range_join",
    "events_session_10m",
    "events_sliding_1h_30m",
    "events_stream_join_live",
    "streaming_dedup_live",
    "streaming_tumbling_live",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_recall_gate",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "ann_search_ivf_gate",
    "approx_distinct_gate",
    "approx_distinct",
    "q30_min_cost_supplier",
    "q31_important_stock",
    "q32_suppliers_who_kept_waiting",
    "q33_global_sales_opportunity",
    "q34_event_funnel",
    "stats_numeric",
    "histogram_equi_depth",
    "skewed_agg_salted",
    "mr_wordcount_compat",
    "mr_grouped_avg_compat",
    "mr_pickle_compat",
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
