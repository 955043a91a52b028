"""Sinks: the engine's write layer.

The reference's only sink is a pickled result file collected by the
client (reference jobtracker.py:349-359, client.py:398-442). Here the
sink surface is the full Spark writer API, with the two patterns that
matter at 100 TB:

- partitioned columnar writes (directory layout = partition pruning
  for every future reader), and
- streaming foreachBatch (exactly-once micro-batch delivery into any
  batch writer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Columnar sink. `partition_by` keys become directory partitions —
    at scale, choose low-cardinality keys (date, category) so each
    partition holds many row groups and readers prune by path."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC columnar sink — same partitioning contract as write_parquet
    (Hive-ecosystem interchange; predicate pushdown and column pruning
    work identically)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro row sink. Spark ships Avro as an external module
    (spark-avro jar) that this environment does not bundle; the call
    raises with deployment guidance when the data source is absent."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source: avro" in str(e):
            raise NotImplementedError(
                "Avro requires the spark-avro package "
                "(--packages org.apache.spark:spark-avro_2.13:<spark version>)"
            ) from e
        raise


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Dynamic partition overwrite — the update-by-key pattern at table
    scale (M3): only the directory partitions PRESENT IN df are
    replaced; all others are left untouched. This is the idempotent
    'recompute one day/source and swap it in' operation of a 100 TB
    pipeline (static overwrite would drop the whole table).

    partitionOverwriteMode is passed as a per-write option, so the
    session default stays static for other writers.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def stream_foreach_batch_parquet(
    result: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """Streaming sink via foreachBatch: each micro-batch lands as an
    append into a parquet dir; the checkpoint gives exactly-once
    (re-delivered batches overwrite by batch id in real deployments —
    append here since availableNow processes each file once)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
