"""Similarity search over the embedding column (BASELINE.json north
star): brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketed variant as the 100 TB scale path.

The embedding column is array<float>; all distance math is JVM-side
(zip_with/aggregate with a fixed fold order) so results are
deterministic and, for the brute-force query, bit-identical to the
DuckDB oracle's list_dot_product.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import cosine_sim
from ..registry import query
from ..sources import load_table

_N_QUERIES = 10
_TOP_K = 5


@query(
    "ann_cosine_topk",
    oracle=f"""
WITH n AS (
    SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm
    FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings)
),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_sim
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {_N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_TOP_K}
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact-recall baseline.

    The query set ({_N_QUERIES} vectors) broadcasts; the corpus is
    scanned once, and the per-query top-k is a WindowGroupLimit (heap
    per partition), so driver traffic is k rows per query. At 100 TB
    the corpus scan dominates -> use ann_lsh_bucketed.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("e")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = F.broadcast(q).join(emb, F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_sim(F.col("qe"), F.col("e")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
    )


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state,
    reproducible across runs and engines."""
    planes = []
    for p in range(n_planes):
        comps = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}_{d}".encode()).hexdigest()
            comps.append((int(h[:8], 16) % 2001 - 1000) / 1000.0)
        planes.append(comps)
    return planes


def lsh_bucket_column(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bucket = F.lit(0).cast("long")
    for bit, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(c) for c in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(
            dot >= 0, F.shiftleft(F.lit(1).cast("long"), bit)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


@query("ann_lsh_bucketed")
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH — the scale path.

    8 sign-bit hyperplanes put each vector in one of 256 buckets;
    queries only score candidates in their own bucket, so the pairwise
    work drops by ~the bucket count, and the candidate join is a
    key-equi join on the bucket id (shuffle-friendly, no cross join; on
    a cluster the corpus can be bucketed once and reused). Rows-only:
    approximation quality is asserted in tests as recall vs
    ann_cosine_topk, not via the SQL oracle.
    """
    planes = _hyperplanes(8, 64)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("e")
    )
    bucketed = emb.withColumn("bucket", lsh_bucket_column(F.col("e"), planes))
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    cand = F.broadcast(q).join(
        bucketed,
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_sim(F.col("qe"), F.col("e")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
    )
