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
# Round 15 continues pure maintenance. Per ROADMAP.md "Round 15
# window staging", the oldest records are the 44 remaining r11-vintage
# rows (the 50 r11 rows minus the 6 padded through r14), so rotate
# them; the 6 slack slots pad with the oldest (r12-vintage)
# expensive/headline rows (the dedup/pipeline tier). Round-15 re-green
# enumeration (from the diff): the round's source changes are
# session.py (_driver_java_options override semantics — a site base
# pinning GCLockerRetryAllocationCount now wins outright; result- and
# plan-neutral infra, byte-identical plan-baseline regen) and the
# bench/scripts/tests plan-canary generalization (MEMO_FAMILIES,
# family_plan_fingerprints — no engine query path touched) — zero
# query displacement, so the staged rotation stands in full.
CHECK_PRIORITY: list[str] = [
    # --- 44 r11-vintage rows: relational / SQL-API block first -------
    "q26_sql_api",
    "q27_promo_revenue",
    "q28_hierarchical_rollup",
    "q29_large_orders",
    "q35_grouping_sets",
    "q36_lateral_topn",
    "q37_range_frame_window",
    # --- events / time-series tier ------------------------------------
    "events_attribution",
    "events_capped_contributions",
    "events_dedup",
    "events_funnel",
    "events_outlier_mad",
    "events_resample_ffill",
    "experiment_readout",
    # --- stats / sampling / percentiles --------------------------------
    "approx_percentiles_gate",
    "exact_percentiles",
    "stats_exact_moments",
    "sample_weighted_bottomk",
    # --- dedup / similarity / retrieval tier ---------------------------
    "ann_cosine_topk",
    "basket_part_pairs",
    "corpus_snapshot_diff",
    "dedup_canonical",
    "dedup_exact",
    "dedup_substring",
    "doc_similarity_sparse",
    "embedding_pca_gate",
    "retrieval_eval_bm25",
    "text_bm25_batch",
    # --- graph / training-data tier ------------------------------------
    "graph_pagerank_dangling",
    "split_leakage_safe",
    "train_negative_sampling",
    # --- privacy triad --------------------------------------------------
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    # --- text / tokenizer tier ------------------------------------------
    "text_normalize_unicode",
    "tokenizer_fertility",
    # --- multimodal codec rows ------------------------------------------
    "multimodal_audio_adpcm",
    "multimodal_audio_flac",
    "multimodal_decode_color",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    # --- streaming twins -------------------------------------------------
    "streaming_capped_contrib_live",
    "streaming_mv_refresh_live",
    "streaming_normalize_live",
    # --- 6 padding rows: oldest (r12) expensive/headline rows
    # --- (displaced by any source-changed re-greens at round close) ---
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "ann_lsh_bucketed",
    "pipeline_clean_corpus",
    "pipeline_prepare_training_data",
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
