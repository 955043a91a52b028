"""BPE tokenizer training: learn byte-pair-encoding merges from the
corpus — the step that produces the merge table a tokenizer ships with
(text_vocab learns the id table; this learns the SUBWORD units).

Spark-first shape: BPE trains on the WORD-TYPE table (unique words
weighted by frequency), which is vocabulary-sized and bounded — never
the corpus — so each merge iteration is one dimension-scale pair-count
groupBy (partial-aggregated) plus a row-local merge map. The corpus is
touched exactly once, to build the weighted type table. The per-
iteration argmax is a constant-size TakeOrdered; the merge pair ships
to executors as two literals.

Determinism: pair counts are integer sums of word frequencies; the
best pair breaks ties lexicographically (count desc, left asc, right
asc); merges apply leftmost-first non-overlapping — the classic
sentencepiece/GPT-2 convention — so the merge table is a pure function
of the corpus. The iterative loop is not SQL-expressible (each merge
rewrites the symbol sequences), so the full table registers rows-only;
`bpe_first_merge_gate` hash-gates iteration 1 against DuckDB, and the
pure-Python reference in tests pins every later iteration.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens_regex
from ..registry import query
from ..sources import load_table

_N_MERGES = 5

# Learned-merge memo per (application, sf_dir): the training loop
# collects one scalar per iteration; repeated invocations (driver gate
# + first-merge gate + tests) reuse one training run.
_MERGE_CACHE: dict[tuple[str, str], list[tuple]] = {}


def merge_pair_in_word(syms: list[str], left: str, right: str) -> list[str]:
    """Apply one merge leftmost-first, non-overlapping."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_reference(words: dict[str, int], n_merges: int) -> list[tuple]:
    """Plain-Python BPE trainer (the contract the Spark loop must
    match): returns [(rank, left, right, pair_freq)]."""
    seqs = {w: [c for c in w] for w in words}
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, freq))
        seqs = {
            w: merge_pair_in_word(s, left, right) for w, s in seqs.items()
        }
    return merges


def _train(spark: SparkSession, sf_dir: str) -> list[tuple]:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _MERGE_CACHE:
        return _MERGE_CACHE[key]
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(tokens_regex(F.lower(F.col("text")))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # symbol sequences: one row per word TYPE (vocabulary-sized)
    syms = words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    ).persist()
    merges: list[tuple] = []
    for rank in range(1, _N_MERGES + 1):
        pairs = syms.select(
            "freq",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN "
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
                    "ELSE CAST(array() AS array<struct<l:string,r:string>>) END"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, freq = best[0]["l"], best[0]["r"], best[0]["c"]
        merges.append((rank, left, right, int(freq)))

        def apply_merge(
            batches: Iterator[pd.DataFrame], _l=left, _r=right
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = pdf["syms"].map(
                    lambda s: merge_pair_in_word(list(s), _l, _r)
                )
                yield pdf

        new_syms = syms.mapInPandas(
            apply_merge, "word string, freq bigint, syms array<string>"
        ).persist()
        syms.unpersist()
        syms = new_syms
    syms.unpersist()
    _MERGE_CACHE[key] = merges
    return merges


@query("bpe_learn_merges")  # rows-only: iterative, not SQL-expressible
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: rank, left symbol, right symbol,
    and the weighted pair frequency at the time of the merge. See
    module docstring for the verification strategy (first-merge SQL
    gate + Python-reference property tests)."""
    merges = _train(spark, sf_dir)
    return spark.createDataFrame(
        merges or [(0, "", "", 0)][:0],
        "merge_rank int, left string, right string, pair_freq bigint",
    )


@query(
    "bpe_first_merge_gate",
    oracle=r"""
WITH w AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT UNNEST(regexp_extract_all(lower(text), '\w+')) AS word
          FROM documents)
    GROUP BY word
),
p AS (
    SELECT substring(word, CAST(i AS INT), 1) AS l,
           substring(word, CAST(i AS INT) + 1, 1) AS r,
           SUM(freq) AS c
    FROM (SELECT word, freq, UNNEST(range(1, GREATEST(LENGTH(word), 1))) AS i
          FROM w)
    GROUP BY 1, 2
)
SELECT l AS left_sym, r AS right_sym, CAST(c AS BIGINT) AS pair_freq
FROM p
ORDER BY c DESC, l ASC, r ASC
LIMIT 1
""",
)
def bpe_first_merge_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible hash gate for BPE training's first iteration:
    the most frequent adjacent character pair (weighted by word-type
    frequency, ties lexicographic) IS SQL-expressible, so the engine's
    merge_rank=1 row must match DuckDB exactly. Later iterations are
    pinned by the Python-reference tests."""
    merges = _train(spark, sf_dir)
    first = merges[:1] or [(0, "", "", 0)][:0]
    return spark.createDataFrame(
        [(left, right, freq) for _, left, right, freq in first],
        "left_sym string, right_sym string, pair_freq bigint",
    )


from .._serde import pickle_by_value as _pbv  # noqa: E402
_pbv(__name__)
