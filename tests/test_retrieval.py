"""Unit + plan tests for the sparse-retrieval tier (retrieval.py).
Oracle parity is covered by test_oracle_parity; these pin ranking
semantics and physical-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplemapreduceframework_spark import registry
from simplemapreduceframework_spark.operators.retrieval import (
    _BM25_TERMS,
    _TOPK,
)
from simplemapreduceframework_spark.plans import explain_str

registry.load_all()
Q = registry.QUERIES


def test_bm25_topk_sorted_and_bounded(spark, sf_dir):
    rows = Q["text_bm25"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOPK
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # ties (if any) break by ascending doc_id
    for a, b in zip(rows, rows[1:]):
        if a["bm25"] == b["bm25"]:
            assert a["doc_id"] < b["doc_id"]


def test_bm25_scores_only_docs_with_query_terms(spark, sf_dir):
    from simplemapreduceframework_spark.sources import load_table
    from simplemapreduceframework_spark.functions import tokens_regex

    top = {r["doc_id"] for r in Q["text_bm25"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    with_terms = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            F.arrays_overlap(
                tokens_regex(F.lower(F.col("text"))),
                F.array(*[F.lit(t) for t in _BM25_TERMS]),
            ).alias("hit"),
        )
        .filter("hit")
        .collect()
    }
    assert top <= with_terms


def test_bm25_positive_scores(spark, sf_dir):
    rows = Q["text_bm25"](spark, sf_dir).collect()
    assert all(r["bm25"] > 0 for r in rows)


def test_bm25_plan_is_topk_not_global_sort(spark, sf_dir):
    df = Q["text_bm25"](spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_hybrid_rrf_fuses_both_legs(spark, sf_dir):
    rows = Q["hybrid_search_rrf"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOPK
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # docs present in both legs outrank equal-rank single-leg docs;
    # at least one fused doc should carry both ranks on this corpus
    both = [r for r in rows if r["lex_rank"] and r["dense_rank"]]
    assert both
    for r in rows:
        want = (1.0 / (60 + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
            1.0 / (60 + r["dense_rank"]) if r["dense_rank"] else 0.0
        )
        assert r["rrf"] == want


def test_indexed_bm25_equals_scan_path(spark, sf_dir):
    scan = Q["text_bm25"](spark, sf_dir).collect()
    idx = Q["text_bm25_indexed"](spark, sf_dir).collect()
    key = lambda r: (r["doc_id"], r["bm25"])
    assert sorted(map(key, scan)) == sorted(map(key, idx))


def test_indexed_bm25_prunes_postings_partitions(spark, sf_dir):
    plan = explain_str(Q["text_bm25_indexed"](spark, sf_dir))
    # the postings scan must carry BOTH a partition filter on the
    # leading-char key and the pushed word IN filter — assert on the
    # scan node lines themselves, not anywhere in the plan
    scan_lines = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l or "PushedFilters" in l
    ]
    assert any(
        "PartitionFilters" in l and "p#" in l and "IN" in l
        for l in scan_lines
    ), plan
    assert any(
        "PushedFilters" in l and "In(word" in l for l in scan_lines
    ), plan
