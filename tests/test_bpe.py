"""BPE trainer verification: the distributed loop must match the
plain-Python reference exactly — on the real corpus and on random
word tables (the pagerank-style property check for the iterative op
whose later iterations aren't SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplemapreduceframework_spark import registry
from simplemapreduceframework_spark.functions import tokens_regex
from simplemapreduceframework_spark.operators.bpe import (
    _N_MERGES,
    _train,
    bpe_reference,
    encode_word,
    merge_pair_in_word,
)
from simplemapreduceframework_spark.sources import load_table

registry.load_all()
Q = registry.QUERIES


def test_merge_is_leftmost_nonoverlapping():
    assert merge_pair_in_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_pair_in_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_pair_in_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_pair_in_word(["ab", "a", "b"], "a", "b") == ["ab", "ab"]
    assert merge_pair_in_word(list("xyz"), "a", "b") == ["x", "y", "z"]


def test_spark_bpe_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = {
        r["word"]: r["freq"]
        for r in docs.select(
            F.explode(tokens_regex(F.lower(F.col("text")))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    want = bpe_reference(words, _N_MERGES)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
        for r in Q["bpe_learn_merges"](spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


def test_encode_word_applies_merges_in_rank_order():
    merges = [(1, "a", "b", 9), (2, "ab", "c", 5), (3, "d", "abc", 2)]
    assert encode_word("abc", merges) == ["abc"]
    assert encode_word("dabc", merges) == ["dabc"]
    assert encode_word("abab", merges) == ["ab", "ab"]
    assert encode_word("xyz", merges) == ["x", "y", "z"]
    assert encode_word("a", merges) == ["a"]


def test_bpe_encode_matches_python_reference_on_corpus(spark, sf_dir):
    """Every doc's full-merge token sequence (via its md5) must equal
    encoding the doc with the Python reference: same word regex, same
    merge table, same leftmost-first application per rank."""
    import hashlib
    import re

    merges = _train(spark, sf_dir)
    assert merges, "training produced no merges"
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["token_hash"])
        for r in Q["bpe_encode"](spark, sf_dir).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        words = re.findall(r"\w+", (text or "").lower())
        toks = [t for w in words for t in encode_word(w, merges)]
        joined = " ".join(toks)
        want = (
            len(words),
            len(toks),
            hashlib.md5(joined.encode()).hexdigest(),
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_bpe_encode_roundtrips_and_compresses(spark, sf_dir):
    """Invariants: concatenating a word's tokens restores the word, and
    applying more merges never increases the corpus token count."""
    merges = _train(spark, sf_dir)
    for word in ["hello", "the", "a", "tokenization"]:
        assert "".join(encode_word(word, merges)) == word
    full = Q["bpe_encode"](spark, sf_dir)
    gate = Q["bpe_encode_gate"](spark, sf_dir)
    n_full = full.agg(F.sum("n_tokens")).collect()[0][0]
    n_gate = gate.agg(F.sum("n_tokens")).collect()[0][0]
    assert n_full <= n_gate  # 5 merges compress at least as much as 1


def test_spark_bpe_matches_reference_on_random_words(spark):
    """Random word tables (varied lengths, repeated substrings, ties)
    — the merge sequence must match the reference for every seed."""
    import random
    import string

    from simplemapreduceframework_spark.operators import bpe as bpe_mod

    for seed in range(3):
        rng = random.Random(seed)
        words = {
            "".join(
                rng.choice(string.ascii_lowercase[:5])
                for _ in range(rng.randrange(1, 9))
            ): rng.randrange(1, 50)
            for _ in range(rng.randrange(5, 25))
        }
        want = bpe_reference(words, 4)
        wdf = spark.createDataFrame(
            list(words.items()), "word string, freq bigint"
        )
        # drive the same loop the operator uses, on this word table
        syms = wdf.select(
            "word",
            "freq",
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        got = []
        for rank in range(1, 5):
            pairs = syms.select(
                "freq",
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
                        "ELSE CAST(array() AS "
                        "array<struct<l:string,r:string>>) END"
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("c"))
                .orderBy(
                    F.col("c").desc(), F.col("l").asc(), F.col("r").asc()
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, freq = best[0]["l"], best[0]["r"], int(best[0]["c"])
            got.append((rank, left, right, freq))
            syms = syms.withColumn(
                "syms",
                F.udf(
                    lambda s, _l=left, _r=right: merge_pair_in_word(
                        list(s), _l, _r
                    ),
                    "array<string>",
                )("syms"),
            )
        assert got == want, (seed, got, want)
