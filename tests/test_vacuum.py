"""vacuum(): one-call maintenance sweeps snapshots + every sidecar class,
and the CDC chain (streaming MoR upsert table -> snapshot source)
composes end-to-end."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.bloom_index import attach_bloom_index
from iceberg_file_writer_spark.ingest.deletion_vectors import (
    commit_delete_where_mor,
)
from iceberg_file_writer_spark.ingest.equality_deletes import commit_upsert
from iceberg_file_writer_spark.ingest.maintenance import vacuum
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    commit_compact,
    current_version,
    read_table_version,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _sidecar_dirs(t: str) -> dict:
    return {
        d: len(os.listdir(os.path.join(t, d)))
        for d in ("dv", "eq", "bloom")
        if os.path.isdir(os.path.join(t, d))
    }


def test_vacuum_sweeps_all_sidecar_classes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    commit_append(spark, orders, t, max_rows=500)
    attach_bloom_index(spark, t, ["o_orderkey"])
    commit_delete_where_mor(spark, t, "o_custkey % 10 = 0")  # DV sidecar
    ups = orders.where("o_custkey % 9 = 0").withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    commit_upsert(spark, t, ups, ["o_orderkey"])  # eq sidecar
    want = _canon(read_table_version(spark, t))
    before = _sidecar_dirs(t)
    assert before.get("dv") and before.get("eq") and before.get("bloom")
    # compaction retires the MoR state; vacuum then reclaims everything
    # the expired snapshots referenced (keep only the compacted head)
    commit_compact(spark, t)
    report = vacuum(t, keep_last=1, grace_seconds=0)
    assert report["dropped_manifests"] >= 3
    assert report["dropped_dv_dirs"] >= 1
    assert report["dropped_eq_dirs"] >= 1
    assert report["dropped_bloom_dirs"] >= 1
    after = _sidecar_dirs(t)
    assert not after.get("dv") and not after.get("eq")
    # current state is untouched
    assert _canon(read_table_version(spark, t)) == want


def test_vacuum_respects_tag_pins(spark, tmp_path):
    from iceberg_file_writer_spark.ingest.tags import create_tag, read_tag

    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    commit_append(spark, orders, t)
    ups = orders.limit(11).withColumn("o_totalprice", F.lit(0.0))
    commit_upsert(spark, t, ups, ["o_orderkey"])
    want = _canon(read_table_version(spark, t, 2))
    create_tag(t, "pin", version=2)
    commit_compact(spark, t)
    commit_append(spark, orders.limit(1), t)
    vacuum(t, keep_last=1, grace_seconds=0)
    # the tagged MoR snapshot still reads exactly: its eq sidecar and
    # data files survived every sweep
    assert _canon(read_tag(spark, t, "pin")) == want


def test_cdc_chain_upsert_table_streams_downstream(spark, tmp_path):
    """The storage layer composes with itself: a table fed by the
    streaming MoR upsert sink is itself an incremental STREAM — the
    snapshot source (skipNonAppends: upsert commits remove rows by
    shadowing) delivers exactly each batch's upserted rows downstream,
    i.e. the change feed of new values."""
    from iceberg_file_writer_spark.ingest.equality_deletes import (
        streaming_upsert_sink,
    )
    from iceberg_file_writer_spark.sources.snapshot_stream import (
        register_snapshot_source,
    )

    t = str(tmp_path / "tbl")
    sink = streaming_upsert_sink(t, ["user_id"])

    def batch(rows):
        return spark.createDataFrame(rows, "user_id long, value double")

    b0 = [(1, 1.0), (2, 2.0)]
    b1 = [(1, 10.0), (3, 3.0)]
    b2 = [(2, 20.0)]
    for i, rows in enumerate([b0, b1, b2]):
        sink(batch(rows), i)

    register_snapshot_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("maxVersionsPerBatch", "1")
        .option("skipNonAppends", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    feed = _canon(spark.read.parquet(out))
    assert feed == sorted(b0 + b1 + b2)
    # while the TABLE read resolves shadowing to latest-per-key
    assert _canon(read_table_version(spark, t)) == [
        (1, 10.0), (2, 20.0), (3, 3.0),
    ]
    assert current_version(t) == 3
