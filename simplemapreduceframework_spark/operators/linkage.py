"""Record linkage / entity resolution: fuzzy matching of dirty entity
names via blocking + edit-distance verification — the classic
dedupe-entities step of a data-integration pipeline (same
block-then-verify shape as dedup.py's MinHash tier, but for SHORT keys
where edit distance, not Jaccard, is the right metric).

The reference has no linkage tier; this extends its grouped workloads
(reference client.py:24-27 table mode, README.md:25-36 grouped recipe)
to pairwise matching, Spark-first: collapse records to distinct names
BEFORE the quadratic step, block on a cheap deterministic key, and
verify candidate pairs with the built-in levenshtein (JVM codegen, no
Python).

All outputs are integers and strings — bit-exact across engines by
construction (levenshtein is unit-cost edit distance in both Spark and
DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_LEV_MAX = 2


@query(
    "fuzzy_match_parts",
    oracle=f"""
WITH names AS (
    SELECT p_name, COUNT(*) AS n_records
    FROM part GROUP BY p_name
),
blocked AS (
    SELECT p_name, n_records,
           string_split(p_name, ' ')[-1] AS block
    FROM names
)
SELECT a.p_name AS a_name, b.p_name AS b_name,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       a.n_records AS a_records, b.n_records AS b_records
FROM blocked a JOIN blocked b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
""",
)
def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching over part names: candidate merge pairs
    whose names agree on the blocking key (the trailing product noun)
    and sit within levenshtein distance 2 of each other, with each
    side's record count.

    Shape at scale: the groupBy collapses the fact-scale part table to
    its DISTINCT names (bounded by name-domain cardinality, not row
    count) before any pairing, so the quadratic verify runs on a
    dimension-sized input; the self-join is a single hash-partitioned
    equi-join on the block key. A skewed block (one dominant noun)
    is an AQE skew-join case; for truly open name domains the block
    key would widen (noun + adjective prefix) to bound block size,
    exactly like the shingle-bucket cap in dedup_ngram_jaccard.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("a_name"),
        F.col("n_records").alias("a_records"),
        F.col("block"),
    )
    b = names.select(
        F.col("p_name").alias("b_name"),
        F.col("n_records").alias("b_records"),
        F.col("block"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("a_name") < F.col("b_name"))
        .filter(F.levenshtein("a_name", "b_name") <= _LEV_MAX)
        .select(
            "a_name",
            "b_name",
            F.levenshtein("a_name", "b_name").cast("bigint").alias("dist"),
            "a_records",
            "b_records",
        )
    )
