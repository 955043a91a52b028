"""Sink layer: partitioned parquet (with pruning), CSV/JSON roundtrips,
and the streaming foreachBatch sink."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simplemapreduceframework_spark.plans import explain_str
from simplemapreduceframework_spark.sources import load_table, read_csv_table
from simplemapreduceframework_spark.sources.writers import (
    stream_foreach_batch_parquet,
    write_csv,
    write_json,
    write_parquet,
)


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(orders, out, partition_by=["o_orderstatus"])

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == expected


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = read_csv_table(
        spark, out, schema="n_nationkey int, n_name string, n_regionkey int", header=True
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    write_json(region, out)
    back = spark.read.json(out).select("r_regionkey", "r_name")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, region.collect()))


def test_streaming_foreach_batch_sink(spark, sf_dir, tmp_path):
    from simplemapreduceframework_spark.streaming import (
        read_events_stream,
        tumbling_counts_stream,
    )

    events = read_events_stream(spark, sf_dir)
    result = tumbling_counts_stream(events)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_foreach_batch_parquet(result, out, ckpt)
    q.awaitTermination()

    from simplemapreduceframework_spark import registry

    registry.load_all()
    batch = registry.QUERIES["events_tumbling_1h"](spark, sf_dir)
    written = spark.read.parquet(out)
    # update-mode micro-batches may rewrite windows; final state per
    # window must match the batch result
    final = written.groupBy("window_start", "event_type").agg(
        F.max("n_events").alias("n_events")
    )
    lhs = sorted(map(tuple, final.collect()))
    rhs = sorted(
        map(tuple, batch.select("window_start", "event_type", "n_events").collect())
    )
    assert lhs == rhs


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    """ORC sink/source: partitioned write, partition-pruned read, and
    value fidelity vs the parquet original."""
    from simplemapreduceframework_spark.sources import read_orc
    from simplemapreduceframework_spark.sources.writers import write_orc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    # partition pruning: a status filter must not scan other partitions
    plan = explain_str(back.filter(F.col("o_orderstatus") == "F"))
    assert "o_orderstatus" in plan
    a = {r["o_orderkey"]: float(r["o_totalprice"]) for r in back.collect()}
    b = {r["o_orderkey"]: float(r["o_totalprice"]) for r in orders.collect()}
    assert a == b


def test_avro_sink_is_gated(spark, tmp_path):
    """Avro is an external Spark module absent here: the sink must fail
    with deployment guidance, not a raw datasource error."""
    import pytest

    from simplemapreduceframework_spark.sources.writers import write_avro

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_avro(df, str(tmp_path / "avro_out"))


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """overwrite_partitions must replace ONLY the partitions present in
    the new frame; untouched partitions keep their original rows."""
    from simplemapreduceframework_spark.sources.writers import (
        overwrite_partitions,
        write_parquet,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_dyn")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    before = {
        r["o_orderkey"]: float(r["o_totalprice"])
        for r in spark.read.parquet(path).filter(F.col("o_orderstatus") != "F").collect()
    }
    # recompute just the F partition with modified values
    patch = orders.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") * 0
    )
    overwrite_partitions(patch, path, ["o_orderstatus"])
    after = spark.read.parquet(path)
    f_rows = after.filter(F.col("o_orderstatus") == "F").collect()
    assert f_rows and all(float(r["o_totalprice"]) == 0.0 for r in f_rows)
    others = {
        r["o_orderkey"]: float(r["o_totalprice"])
        for r in after.filter(F.col("o_orderstatus") != "F").collect()
    }
    assert others == before


def test_compact_parquet_file_sizing(spark, sf_dir, tmp_path):
    """Compaction rewrites a many-file table into the computed target
    file count with identical contents."""
    from simplemapreduceframework_spark.sources.maintenance import compact_parquet

    orders = load_table(spark, sf_dir, "orders")
    frag = str(tmp_path / "fragmented")
    orders.repartition(50).write.parquet(frag)  # small-file problem
    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, dst, target_file_mb=128)
    import glob

    files = glob.glob(f"{dst}/part-*")
    assert len(files) == n
    assert n < 50
    assert spark.read.parquet(dst).count() == orders.count()


def test_sorted_rewrite_clusters_ranges(spark, sf_dir, tmp_path):
    """After sorted_rewrite on o_orderkey, per-file key ranges must not
    overlap — the property that makes parquet min/max stats prune."""
    from simplemapreduceframework_spark.sources.maintenance import sorted_rewrite

    orders = load_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "clustered")
    sorted_rewrite(orders, dst, ["o_orderkey"], n_files=8)
    ranges = (
        spark.read.parquet(dst)
        .select("o_orderkey", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    assert len(ranges) == 8
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert lo_next > hi_prev, spans


def test_upsert_by_key(spark, sf_dir, tmp_path):
    """Row-level merge: updated keys take the new row, untouched keys
    keep theirs, and new keys append."""
    from simplemapreduceframework_spark.sources.maintenance import upsert_by_key

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_upsert")
    orders.write.parquet(path)
    keys = [r["o_orderkey"] for r in orders.limit(3).collect()]
    updates = spark.createDataFrame(
        [(keys[0], "X", 1.0), (keys[1], "X", 2.0), (-999, "X", 3.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    upsert_by_key(spark, path, updates, "o_orderkey")
    after = {r["o_orderkey"]: r for r in spark.read.parquet(path).collect()}
    n_before = orders.count()
    assert len(after) == n_before + 1  # one new key
    assert after[keys[0]]["o_orderstatus"] == "X"
    assert float(after[keys[0]]["o_totalprice"]) == 1.0
    assert after[-999]["o_orderstatus"] == "X"
    assert after[keys[2]]["o_orderstatus"] != "X"  # untouched row preserved


def test_schema_evolution_read(spark, tmp_path):
    """Files written under an older schema surface the new column as
    NULL under mergeSchema — additive evolution without history
    rewrite."""
    from simplemapreduceframework_spark.sources import read_parquet_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        path + "/batch1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(path + "/batch2")
    df = read_parquet_evolving(spark, path + "/*")
    rows = {r["id"]: (r["v"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_json_roundtrip(spark, sf_dir, tmp_path):
    from simplemapreduceframework_spark.sources import read_json_table
    from simplemapreduceframework_spark.sources.writers import write_json

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    path = str(tmp_path / "orders_json")
    write_json(orders, path)
    back = read_json_table(spark, path, "o_orderkey long, o_orderstatus string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))


def test_incremental_mv_merge_equals_rebuild_with_new_month(spark, tmp_path):
    """merge_mv(stored, delta) must equal the full recompute even when
    the delta introduces a month/status group absent from the stored
    summary (the union path, not just the matched-key path)."""
    from pyspark.sql import functions as F

    from simplemapreduceframework_spark.sources.maintenance import (
        merge_mv,
        summarize_orders_monthly,
    )

    rows = [
        (1, "F", 10.0, "2024-01-15"),
        (2, "F", 20.0, "2024-01-20"),
        (3, "O", 5.0, "2024-02-01"),
        # delta-only additions, including a brand-new month
        (10, "F", 7.5, "2024-01-31"),
        (11, "P", 1.25, "2024-03-09"),
    ]
    orders = spark.createDataFrame(
        [(k, st, p, f"{d} 00:00:00") for k, st, p, d in rows],
        "o_orderkey long, o_orderstatus string, o_totalprice double, ts string",
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("ts").cast("timestamp").alias("o_orderdate"),
    )
    stored = summarize_orders_monthly(orders.filter(F.col("o_orderkey") < 10))
    delta = summarize_orders_monthly(orders.filter(F.col("o_orderkey") >= 10))
    merged = {
        (r["month"], r["o_orderstatus"]): (r["n_orders"], str(r["rev"]))
        for r in merge_mv(stored, delta).collect()
    }
    full = {
        (r["month"], r["o_orderstatus"]): (r["n_orders"], str(r["rev"]))
        for r in summarize_orders_monthly(orders).collect()
    }
    assert merged == full
    assert ("2024-03", "P") in merged  # the delta-only group survived


def test_table_expectations_reports_real_violations(spark, sf_dir):
    """The expectation suite must show the documented non-unique pk as
    FAILED with a positive violation count, and the clean rules as
    passed — proving it reports rather than rubber-stamps."""
    from simplemapreduceframework_spark import registry

    registry.load_all()
    rows = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in registry.QUERIES["table_expectations"](spark, sf_dir).collect()
    }
    pk = rows["lineitem.pk (l_orderkey,l_linenumber) unique"]
    assert pk[0] > 0 and pk[1] is False
    assert rows["lineitem.l_quantity not_null"] == (0, True)
    assert rows["lineitem.l_orderkey fk orders"] == (0, True)


def test_erase_by_key_proof_of_erasure(spark, tmp_path):
    """Right-to-erasure: named keys vanish from the rewritten files,
    everything else survives byte-identical, the report's counters
    reconcile, NULL table keys are untouched (an erasure request can't
    name NULL), and a NULL in the request list is dropped rather than
    silently matching nothing while looking serviced."""
    from pyspark.sql import functions as F

    from simplemapreduceframework_spark.sources.maintenance import (
        erase_by_key,
    )

    path = str(tmp_path / "users")
    rows = [(i, f"user{i}") for i in range(20)] + [(None, "ghost")]
    spark.createDataFrame(rows, "uid long, name string").write.parquet(path)

    req = spark.createDataFrame(
        [(3,), (7,), (7,), (None,), (999,)], "uid long"
    )
    report = erase_by_key(spark, path, req, "uid")
    assert report["n_before"] == 21
    assert report["n_erased"] == 2  # uids 3 and 7; 999 absent; NULL dropped
    assert report["n_after"] == 19
    assert report["n_surviving_matches"] == 0

    after = spark.read.parquet(path)
    got = {r["uid"] for r in after.collect()}
    assert 3 not in got and 7 not in got
    assert None in got  # the NULL-key row survives
    assert after.filter(F.col("name") == "user5").count() == 1


def test_erase_by_key_swap_discipline(spark, tmp_path):
    """The rewrite swap must (a) leave no .erase_tmp/.erase_bak debris
    on success — the table is renamed aside, replaced, THEN the backup
    deleted, so a crash at any point leaves a recoverable copy — (b)
    reject remote URIs up front (the swap is local-filesystem renames;
    advisor r7 medium), and (c) recover from a stale backup left by an
    earlier crashed swap."""
    import os

    from simplemapreduceframework_spark.sources.maintenance import (
        erase_by_key,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"u{i}") for i in range(10)], "uid long, name string"
    ).write.parquet(path)
    # stale backup from a hypothetical earlier crash between renames
    os.makedirs(path + ".erase_bak")
    req = spark.createDataFrame([(4,)], "uid long")
    report = erase_by_key(spark, path, req, "uid")
    assert report["n_erased"] == 1 and report["n_after"] == 9
    assert not os.path.exists(path + ".erase_tmp")
    assert not os.path.exists(path + ".erase_bak")

    with pytest.raises(ValueError, match="remote URI"):
        erase_by_key(spark, "s3://bucket/table", req, "uid")
    with pytest.raises(ValueError, match="not a directory"):
        erase_by_key(spark, str(tmp_path / "absent"), req, "uid")

    # (d) crash IN the swap window — live path absent, original aside
    # at .erase_bak — auto-restores before proceeding (advisor r8)
    os.rename(path, path + ".erase_bak")
    report = erase_by_key(
        spark, path, spark.createDataFrame([(5,)], "uid long"), "uid"
    )
    assert report["n_before"] == 9  # the restored original, post-first-erase
    assert report["n_erased"] == 1 and report["n_after"] == 8
    assert os.path.isdir(path)
    assert not os.path.exists(path + ".erase_bak")


def test_erase_by_key_partitioned_table(spark, tmp_path):
    """Erasure preserves the partition layout (partition_by passthrough)
    and the proof re-checks the rewritten files."""
    import os

    from simplemapreduceframework_spark.sources.maintenance import (
        erase_by_key,
    )

    path = str(tmp_path / "events_p")
    rows = [(i, i % 3, f"v{i}") for i in range(30)]
    (
        spark.createDataFrame(rows, "eid long, shard int, v string")
        .write.partitionBy("shard")
        .parquet(path)
    )
    req = spark.createDataFrame([(0,), (29,)], "eid long")
    report = erase_by_key(spark, path, req, "eid", partition_by=["shard"])
    assert report["n_erased"] == 2 and report["n_after"] == 28
    assert sorted(
        d for d in os.listdir(path) if d.startswith("shard=")
    ) == ["shard=0", "shard=1", "shard=2"]
