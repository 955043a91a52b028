"""The UDF / UDAF / UDTF surface (SURVEY.md section 2.4): in the
reference, *the whole engine* is the UDF surface — mapper = UDTF,
combiner/reducer = UDAF, shipped as a .py file and imported per job
(reference tasktracker.py:86-109). Here each shape is a first-class
vectorized operator:

- scalar pandas UDF  <-> per-record mapper logic
- GROUPED_AGG pandas UDF <-> reducer (full value set per key)
- mapInPandas (UDTF) <-> mapper emitting multiple records

Each is oracle-gated: the Python-side math is constrained to
operations (float products, integral sums) that are bit-identical to
the SQL oracle, proving the vectorized path computes exactly what the
declarative one does.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from ..registry import query
from ..sources import load_table


@pandas_udf(DoubleType())
def _disc_price_udf(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Scalar (Series -> Series) pandas UDF: elementwise float64
    price * (1 - discount) — IEEE-identical to the SQL expression."""
    return price * (1.0 - discount)


@query(
    "udf_scalar_disc_price",
    oracle="""
SELECT l_orderkey, l_partkey, l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
)
def udf_scalar_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar UDF vs the equivalent SQL expression: same
    doubles, because both are one IEEE multiply + subtract per row.
    (In production you'd write this as the built-in expression — the
    query exists to pin the UDF machinery's exactness.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_partkey",
        _disc_price_udf(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "disc_price"
        ),
    )


@pandas_udf(DoubleType())
def _sum_qty_udaf(qty: pd.Series) -> float:
    """GROUPED_AGG (Series -> scalar) pandas UDF — the reference's
    reducer contract (complete value set per key,
    tasktracker.py:237-255), vectorized. Quantities are integral, so
    the float sum is exact in any accumulation order."""
    return float(np.sum(qty.to_numpy(dtype=np.float64)))


@pandas_udf(LongType())
def _count_udaf(qty: pd.Series) -> int:
    """GROUPED_AGG count (Spark disallows mixing pandas and JVM
    aggregates in one agg, so the count is a UDAF too)."""
    return int(len(qty))


@query(
    "udaf_grouped_sum",
    oracle="""
SELECT l_returnflag, SUM(l_quantity) AS total_qty, COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate through pandas_udf GROUPED_AGG, oracle-checked
    against the engine SUM."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _sum_qty_udaf(F.col("l_quantity")).alias("total_qty"),
        _count_udaf(F.col("l_quantity")).alias("n"),
    )


def _tokenize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """UDTF body: one input row -> N (doc_id, token) rows — exactly the
    reference mapper shape (count_functions.py:1-6), Arrow-batched."""
    for pdf in batches:
        toks = pdf["text"].str.split()
        out = pd.DataFrame(
            {"doc_id": pdf["doc_id"].repeat(toks.str.len()), "token": toks.explode()}
        )
        yield out.dropna()


@query(
    "udtf_tokenize",
    oracle="""
SELECT doc_id, token
FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS token
      FROM documents)
WHERE token <> ''
""",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function via mapInPandas (1 row -> N rows), the
    mapper contract vectorized; oracle = SQL UNNEST."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_tokenize_batches, "doc_id bigint, token string")


from .._serde import pickle_by_value as _pbv  # noqa: E402
_pbv(__name__)
