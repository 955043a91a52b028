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
        if rank == _N_MERGES:
            # the post-merge symbol table is only consumed by the NEXT
            # iteration's pair count; after the last merge it is dead
            # work — skip the whole pass
            break

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
        # Materialize the child WHILE the parent is still cached:
        # unpersisting first evicted the parent before anything had
        # computed the (lazy) child, so iteration k re-derived the
        # whole mapInPandas chain from the corpus scan — the module
        # contract says the corpus is touched exactly once, and this
        # ordering is what makes that true (measured: ~25 s -> ~8 s
        # cold training at sf0.1). The count job is vocabulary-sized,
        # read from the parent's cache.
        new_syms.count()
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


# First-merge learning CTEs, shared by the first-merge gate and the
# encode gate (both must re-learn merge 1 inside DuckDB).
_FIRST_MERGE_CTES = r"""w AS (
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
)"""


@query(
    "bpe_first_merge_gate",
    oracle=f"""
WITH {_FIRST_MERGE_CTES}
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


def encode_word(word: str, merges: list[tuple]) -> list[str]:
    """Tokenize one word with the learned merge table: start from
    characters, apply each merge in rank order, leftmost-first
    non-overlapping — the standard BPE encode convention (the exact
    inverse-direction twin of the training loop's apply step)."""
    syms = [c for c in word]
    for _rank, left, right, _freq in merges:
        syms = merge_pair_in_word(syms, left, right)
    return syms


def _encode_docs(
    spark: SparkSession, sf_dir: str, merges: list[tuple]
) -> DataFrame:
    """Tokenize `documents` with a merge table: per doc, word count,
    BPE token count, and md5 over the space-joined token sequence.

    Spark-first shape: the corpus encodes by TYPE, not by occurrence —
    distinct words (vocabulary-sized) run the Python merge application
    once each in an Arrow-batched mapInPandas, then broadcast-join back
    onto the positional word stream; per-doc sequences reassemble
    row-locally (array_sort over collected (pos, tokens) structs).
    Wordless and NULL-text docs keep a row (0 words, md5('') hash) via
    the doc-id left join.
    """
    docs = load_table(spark, sf_dir, "documents")
    words_pos = docs.select(
        "doc_id",
        F.posexplode(tokens_regex(F.lower(F.col("text")))).alias(
            "pos", "word"
        ),
    )
    vocab = words_pos.select("word").distinct()

    def encode_batch(
        batches: Iterator[pd.DataFrame], _m=merges
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": pdf["word"].map(
                        lambda w: " ".join(encode_word(w, _m))
                    ),
                }
            )

    enc_vocab = vocab.mapInPandas(encode_batch, "word string, toks string")
    per_doc = (
        words_pos.join(F.broadcast(enc_vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.size(F.split(F.col("toks"), " ")))
            .cast("bigint")
            .alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(pos, toks))),"
                        " s -> s.toks)"
                    ),
                )
            ).alias("token_hash"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0).cast("bigint")).alias("n_words"),
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
            F.coalesce("token_hash", F.md5(F.lit(""))).alias("token_hash"),
        )
    )


@query("bpe_encode")  # rows-only: merge table is data-dependent (learned)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the FULL learned merge table to the corpus — the missing
    half of the tokenizer lifecycle (train via bpe_learn_merges, then
    encode). Verification: bpe_encode_gate hash-gates the identical
    machinery under the SQL-expressible single-merge table, and the
    Python-reference property tests pin multi-merge encoding."""
    return _encode_docs(spark, sf_dir, _train(spark, sf_dir))


@query(
    "bpe_encode_gate",
    oracle=f"""
WITH {_FIRST_MERGE_CTES},
bp0 AS (
    SELECT l, r FROM p ORDER BY c DESC, l ASC, r ASC LIMIT 1
),
-- always exactly one row, even when NO pair is learnable (every word a
-- single char): '' never equals a char, so the fold then merges
-- nothing — matching the engine's merges[:1] == [] path
bp AS (
    SELECT COALESCE((SELECT l FROM bp0), '') AS l,
           COALESCE((SELECT r FROM bp0), '') AS r
),
dw AS (
    SELECT doc_id,
           COALESCE(regexp_extract_all(lower(text), '\\w+'),
                    CAST([] AS VARCHAR[])) AS ws
    FROM documents
),
enc AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           -- array_to_string of an EMPTY list is NULL in DuckDB, not
           -- '' — coalesce so wordless docs hash md5('') like the
           -- engine's concat_ws
           COALESCE(array_to_string(
               list_transform(ws, wrd ->
                   replace(
                       list_reduce(regexp_split_to_array(wrd, ''),
                           (a, x) -> CASE
                               WHEN regexp_extract(a, '[^|]*$') = bp.l
                                    AND x = bp.r
                               THEN regexp_replace(a, '[^|]*$',
                                                   bp.l || bp.r)
                               ELSE a || '|' || x END),
                       '|', ' ')),
               ' '), '') AS s
    FROM dw CROSS JOIN bp
)
SELECT doc_id, n_words,
       CASE WHEN s = '' THEN CAST(0 AS BIGINT)
            ELSE CAST(len(string_split(s, ' ')) AS BIGINT) END AS n_tokens,
       md5(s) AS token_hash
FROM enc
""",
)
def bpe_encode_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible hash gate for the encode machinery: tokenize the
    corpus with ONLY merge 1 (which DuckDB can re-learn in SQL) and
    compare per-doc token counts and sequence hashes exactly. The
    oracle applies the merge as a `list_reduce` left fold — replacing
    the accumulator's tail symbol when (tail, next) equals the merge
    pair reproduces leftmost-first non-overlapping application (a
    merged token never equals its own left symbol, so no re-merge can
    cascade within one pass)."""
    merges = _train(spark, sf_dir)
    return _encode_docs(spark, sf_dir, merges[:1])


from .._serde import pickle_by_value as _pbv  # noqa: E402
_pbv(__name__)
