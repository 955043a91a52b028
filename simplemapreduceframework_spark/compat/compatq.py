"""Compat-layer queries: reference workloads run through the RDD
MapReduce runner, oracle-checked against the same SQL as the DataFrame
versions — proof the compatibility surface computes what the reference
computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources import load_table
from .mapreduce import MapReduceJob


# Reference-contract user functions (our own implementations of the
# workloads in count_functions.py:1-17 and README.md:25-36 — the
# contract shapes, not copies).

def _wc_mapper(key, value):
    return [(w, 1) for w in value.split()]


def _wc_combiner(key, values):
    return key, sum(values)


def _wc_reducer(key, values):
    return key, sum(values)


def _avg_mapper(key, value):
    # 'table' mode: positional CSV columns (grp at 0, qty at 1), the
    # reference's documented recipe (README.md:30-33).
    cols = value.split(",")
    return [(cols[0], (float(cols[1]), 1))]


def _avg_combiner(key, values):
    return key, (sum(v[0] for v in values), sum(v[1] for v in values))


def _avg_reducer(key, values):
    total = sum(v[0] for v in values)
    count = sum(v[1] for v in values)
    return key, (total, count)


@query(
    "mr_wordcount_compat",
    oracle="""
SELECT word, COUNT(*) AS cnt
FROM (SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""",
)
def mr_wordcount_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the MapReduce compat runner (mapper emits
    (word,1), combiner/reducer sum — the reference's flagship job) —
    same oracle as the DataFrame `wordcount`, so the gate proves the
    RDD path and the SQL path agree."""
    lines = load_table(spark, sf_dir, "documents").select("text").rdd.map(
        lambda r: r[0]
    )
    job = MapReduceJob(
        spark, _wc_mapper, _wc_reducer, _wc_combiner, mode="faithful"
    )
    out = job.run_rdd(lines)
    return spark.createDataFrame(out, "word string, cnt long")


@query(
    "mr_grouped_avg_compat",
    oracle="""
SELECT l_returnflag AS grp,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM lineitem
GROUP BY l_returnflag
""",
)
def mr_grouped_avg_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's grouped-AVG SQL recipe (README.md:25-36) through
    the compat runner in 'table' mode: mapper emits (grp,(x,1)), the
    combiner partial-sums, the reducer finishes sum/count.

    Quantities are integral, so the float partial sums are exact in any
    accumulation order and the final division matches the decimal
    oracle bit-for-bit.
    """
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .rdd.map(lambda r: f"{r[0]},{r[1]}")
    )
    job = MapReduceJob(
        spark, _avg_mapper, _avg_reducer, _avg_combiner, mode="faithful"
    )
    finished = job.run_rdd(lines).map(lambda kv: (kv[0], kv[1][0] / kv[1][1]))
    return spark.createDataFrame(finished, "grp string, avg_value double")


from .._serde import pickle_by_value as _pbv  # noqa: E402
_pbv(__name__)
