"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting handles most skew at runtime
(spark.sql.adaptive.skewJoin.enabled, on by default in session.py);
salting is the explicit tool for the pathological cases AQE can't fix —
a single hot key in an aggregation, or a skewed join where the hot
key's rows exceed one executor's memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, key: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Append a deterministic salt in [0, n_salts) derived from the full
    row's key plus a spread column: use for two-stage aggregation.

    For aggregations: groupBy(key, _salt).partial_agg -> groupBy(key).
    final_agg — the hot key's rows spread over n_salts reducers in
    stage 1, and only n_salts pre-aggregated rows hit the single
    reducer in stage 2.
    """
    return df.withColumn(
        salt_col, F.pmod(F.abs(F.hash(F.col(key), F.monotonically_increasing_id())), F.lit(n_salts))
    )


def salted_agg_sum(
    df: DataFrame, key: str, value: Column, n_salts: int, out: str
) -> DataFrame:
    """Two-stage salted SUM: immune to a single key holding an
    arbitrary fraction of the data."""
    stage1 = (
        salted(df, key, n_salts)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return stage1.groupBy(key).agg(F.sum("_partial").alias(out))


def explode_salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int,
) -> DataFrame:
    """Skewed fact ⋈ small dim without broadcast: salt the fact side,
    replicate the dim side n_salts times, join on (key, salt).

    Use when the dim is too big to broadcast but the fact key is skewed:
    each hot key spreads across n_salts partitions while the dim grows
    only by the salt factor.
    """
    f = salted(facts, key, n_salts)
    d = dim.crossJoin(
        F.broadcast(
            facts.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    return f.join(d, on=[key, "_salt"]).drop("_salt")
