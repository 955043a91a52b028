"""Table maintenance — the ingest/layout side of 100 TB performance.

Query speed at scale is mostly decided before the query runs: file
sizes (too many small files -> scheduler overhead and tiny row
groups; too few -> no scan parallelism) and value clustering (row
groups whose min/max spans the whole domain can never be skipped).
These utilities are the two standard maintenance passes, expressed
with vanilla Spark writers so they run anywhere:

- compact_parquet: rewrite to a target file size/count.
- sorted_rewrite: range-repartition + sort-within-partitions on the
  cluster columns, so each output file covers a narrow value range
  and parquet min/max row-group statistics actually prune (the
  single-dimension version of what Z-ordering does for several).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite `src` into `dst` with files sized near target_file_mb
    (the small-file compaction every long-lived table needs). Returns
    the chosen file count. Local-FS size estimate; on a cluster the
    same arithmetic runs over the FileSystem API.
    """
    n_files = max(1, math.ceil(_dir_bytes(src) / (target_file_mb << 20)))
    df = spark.read.parquet(src)
    writer = df.repartition(n_files) if n_files > 1 else df.coalesce(1)
    writer.write.mode("overwrite").parquet(dst)
    return n_files


def upsert_by_key(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_by: list[str] | None = None,
) -> None:
    """Row-level merge into a parquet table: rows in `updates` replace
    existing rows with the same key; all other rows persist (the MERGE
    / CDC-apply pattern on plain files — a table format like
    Iceberg/Delta does this transactionally; on raw parquet it is a
    read-union-dedup-rewrite).

    The dedup prefers updates via a priority column + per-key
    row_number — one hash exchange on the key. With partition_by set
    and updates touching few partitions, restrict the read+rewrite to
    those partitions (overwrite_partitions composes with this).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    current = spark.read.parquet(path)
    merged = (
        current.withColumn("_pri", F.lit(1))
        .unionByName(updates.withColumn("_pri", F.lit(0)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy("_pri")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_pri", "_rn")
    )
    # parquet cannot overwrite a path being read: stage then swap
    tmp = path.rstrip("/") + "._upsert_tmp"
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)


def sorted_rewrite(
    df: DataFrame,
    dst: str,
    cluster_by: list[str],
    n_files: int | None = None,
) -> None:
    """Range-repartition on the cluster columns, sort within each
    partition, write. Every output file then covers a narrow,
    non-overlapping range of the leading cluster column, so a reader
    filtering on it skips whole files/row groups via parquet min/max
    stats — the clustering pass that turns a scan-everything table
    into a pruned one.
    """
    parts = (
        df.repartitionByRange(n_files, *cluster_by)
        if n_files
        else df.repartitionByRange(*cluster_by)
    )
    parts.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(dst)
