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


def test_lang_id_multilingual_profiles(spark, tmp_path):
    """The trigram bootstrap must generalize past the English-only
    synthetic corpus: on a mixed es/fr/en fixture every language with
    lexicon seeds gets its own profile, docs classify by their actual
    language, and the DuckDB oracle agrees bit-for-bit."""
    import duckdb

    from simplemapreduceframework_spark import registry
    from simplemapreduceframework_spark.testing import fingerprint

    registry.load_all()
    base = {
        "es": "el la de y que en los por casa perro gato comida",
        "fr": "le la de et les des un une maison chien chat nourriture",
        "en": "the a of and to value table row house dog cat food",
    }
    rows = []
    for i in range(30):
        lang = ["es", "fr", "en"][i % 3]
        rows.append((i, f"{base[lang]} extra{i} palabra{i} mot{i}", f"src{i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    path = str(tmp_path / "multilingual")
    docs.write.parquet(f"{path}/documents.parquet")

    out = registry.QUERIES["text_lang_id"](spark, path)
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 30
    for i in range(30):
        want = ["es", "fr", "en"][i % 3]
        assert got[i]["pred_lang"] == want, (i, got[i])
        assert got[i]["method"] == "trigram"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{path}/documents.parquet/*.parquet'"
    )
    orc = con.execute(registry.ORACLES["text_lang_id"])
    ocols = [d[0] for d in orc.description]
    orows = [dict(zip(ocols, r)) for r in orc.fetchall()]
    con.close()
    srows = [r.asDict() for r in out.collect()]
    cols = sorted(out.columns)
    assert fingerprint(srows, cols) == fingerprint(orows, cols)
