"""Dedup + similarity semantics beyond the oracle compare: cross-method
consistency (MinHash candidates verify against exact Jaccard; LSH
recall against brute force) and determinism of the hash machinery."""

from __future__ import annotations

import math

from simplemapreduceframework_spark import registry

registry.load_all()
Q = registry.QUERIES


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_pairs_subset_of_exact_jaccard(spark, sf_dir):
    """LSH candidates are verified with exact Jaccard at the same
    threshold, so MinHash output must be a subset of the exact
    all-pairs result (it misses only what banding never bucketed)."""
    exact = _pairs(Q["dedup_ngram_jaccard"](spark, sf_dir))
    lsh = _pairs(Q["dedup_minhash_lsh"](spark, sf_dir))
    assert lsh <= exact
    # near-exact duplicates (the synthetic corpus has them) must be found
    assert lsh, "MinHash found no duplicate pairs at all"


def test_minhash_recall_on_near_exact_dups(spark, sf_dir):
    """Pairs with jaccard >= 0.9 collide in at least one band with
    probability ~1-(1-0.9^4)^4 ~ 0.96; the synthetic near-dups are
    mostly identical docs, so expect full recall on that slice."""
    exact_high = {
        (r["doc_a"], r["doc_b"])
        for r in Q["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r["jaccard"] >= 0.9
    }
    lsh = _pairs(Q["dedup_minhash_lsh"](spark, sf_dir))
    missed = exact_high - lsh
    assert not missed, f"MinHash missed near-exact pairs: {missed}"


def test_exact_dedup_partitions_the_corpus(spark, sf_dir):
    rows = Q["dedup_exact"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_copies"] for r in rows) == n_docs
    assert all(r["n_copies"] >= 1 for r in rows)


def test_simhash_identical_docs_same_signature(spark, sf_dir):
    """Exact duplicate texts must land on identical simhash values."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = {r["doc_id"]: r["simhash"] for r in Q["dedup_simhash"](spark, sf_dir).collect()}
    by_text: dict[str, list[int]] = {}
    for r in docs.select("doc_id", "text").collect():
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    for ids in by_text.values():
        if len(ids) > 1:
            sigs = {sig[i] for i in ids}
            assert len(sigs) == 1


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """Same-bucket constraint loses neighbors, but identical/near-dup
    vectors bucket together: measure recall@5 against the exact top-k
    and require a sane floor for 256 buckets over 500 vectors."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in Q["ann_cosine_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in Q["ann_lsh_bucketed"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.05, f"recall collapsed: {recall}"
    # and every approx result is a genuine same-bucket candidate pair
    assert approx, "LSH returned nothing"


def test_cosine_values_match_python(spark, sf_dir):
    """dot_seq's sequential fold == pure-Python math.fsum-free loop."""
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(20)
        .collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in Q["ann_cosine_topk"](spark, sf_dir).collect()
    }

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    for (qid, nid), cos in got.items():
        if qid in emb and nid in emb:
            a, b = emb[qid], emb[nid]
            expect = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
            assert cos == expect, (qid, nid, cos, expect)
