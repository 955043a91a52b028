"""The reference's own three test workloads reproduced on a text
fixture with inline Python oracles — the same validation pattern as
reference counting_words.py:15-36, word_set_example.py:15-34, and
fernan/solution.py:1-15."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

from simplemapreduceframework_spark.functions import tokens_regex, tokens_ws

TEXT = """The quick brown fox jumps over the lazy dog
the  quick   brown fox again
numbers 123 and words mix-42 here

punctuation, everywhere! (and parens) end.
"""


@pytest.fixture(scope="module")
def lines_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("textdata") / "data.txt"
    p.write_text(TEXT)
    return spark.read.text(str(p))


def test_wordcount_vs_inline_oracle(lines_df):
    got = {
        r["word"]: r["cnt"]
        for r in lines_df.select(F.explode(tokens_ws("value")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    expected = Counter(TEXT.split())
    assert got == dict(expected)


def test_wordset_vs_inline_oracle(lines_df):
    got = {
        r["word"]
        for r in lines_df.select(F.explode(tokens_ws("value")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .collect()
    }
    assert got == set(TEXT.split())
    # the reference's assertion: no duplicate keys in the result
    assert len(got) == len(set(got))


def test_wordset_regex_vs_inline_oracle(lines_df):
    r"""fernan variant: tokens via re.findall(r'\w+', text)."""
    got = {
        r["word"]
        for r in lines_df.select(F.explode(tokens_regex("value")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .collect()
    }
    assert got == set(re.findall(r"\w+", TEXT))


def test_grouped_avg_dog_recipe(spark):
    """The documented dog/AVG recipe (reference README.md:25-36) on an
    inline CSV fixture: engine AVG == hand sum/count."""
    rows = [("rex", 2), ("rex", 4), ("bella", 1), ("rex", 3), ("max", 10)]
    df = spark.createDataFrame(rows, "dog string, age int")
    got = {
        r["dog"]: r["avg_age"]
        for r in df.groupBy("dog").agg(F.avg("age").alias("avg_age")).collect()
    }
    assert got == {"rex": 3.0, "bella": 1.0, "max": 10.0}


def test_text_vocab_memoized_per_session(spark, sf_dir):
    """Repeated invocations must reuse the one persisted ranked vocab
    (bench runs it 3x; token-id consumers once more) instead of leaking
    a fresh persisted DataFrame into executor storage per call."""
    from simplemapreduceframework_spark import registry

    registry.load_all()
    fn = registry.QUERIES["text_vocab"]
    assert fn(spark, sf_dir) is fn(spark, sf_dir)
