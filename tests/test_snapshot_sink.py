"""format("snapshot_table") streaming SINK: exactly-once appends into a
snapshot table through the DataSource writer API."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    current_version,
    read_manifest,
    read_table_version,
)
from iceberg_file_writer_spark.sources.snapshot_stream import (
    register_snapshot_source,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def orders(spark):
    return load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _stage_files(df, n: int) -> str:
    src = tempfile.mkdtemp(prefix="sink-src-")
    df.repartition(n).write.mode("overwrite").parquet(src)
    return src


def _kv_batch(rows):
    """RecordBatch input for driving the Arrow writer directly."""
    import pyarrow as pa

    return iter(
        [
            pa.RecordBatch.from_pylist(
                [{"k": k, "v": v} for k, v in rows],
                schema=pa.schema(
                    [pa.field("k", pa.int64()), pa.field("v", pa.float64())]
                ),
            )
        ]
    )


def _run_sink(spark, src_dir, schema, table, ckpt):
    register_snapshot_source(spark)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .writeStream.format("snapshot_table")
        .option("path", table)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_sink_appends_exactly_once_across_restarts(spark, tmp_path, orders):
    """Micro-batches become snapshots (one commit per batch, ledgered);
    a restart over the same checkpoint re-delivers nothing."""
    src = _stage_files(orders, 3)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    _run_sink(spark, src, orders.schema, t, ckpt)
    assert current_version(t) >= 3  # one snapshot per micro-batch
    assert _canon(read_table_version(spark, t)) == _canon(orders)
    m = read_manifest(t, current_version(t))
    assert len(m["batch_ids"]) == current_version(t)
    # restart with nothing new: no commits, no duplicates
    v = current_version(t)
    _run_sink(spark, src, orders.schema, t, ckpt)
    assert current_version(t) == v
    assert _canon(read_table_version(spark, t)) == _canon(orders)
    # footer stats were harvested at commit (file-skipping works on
    # sink-written tables)
    assert all(
        "o_orderkey" in (e.get("stats") or {}) for e in m["files"]
    )


def test_sink_composes_with_repo_verbs_and_source(spark, tmp_path, orders):
    """The sink's snapshots interleave with repo-side commits (ledger
    carried), and the snapshot SOURCE can tail a sink-written table —
    the format round-trips with itself."""
    half = orders.where("o_orderkey % 2 = 0")
    rest = orders.where("o_orderkey % 2 = 1")
    t = str(tmp_path / "tbl")
    commit_append(spark, half, t)  # repo verb first
    src = _stage_files(rest, 2)
    _run_sink(spark, src, orders.schema, t, str(tmp_path / "ckpt"))
    assert _canon(read_table_version(spark, t)) == _canon(orders)
    # now tail the table with the source: everything streams back
    out, ckpt2 = str(tmp_path / "out"), str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt2)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _canon(spark.read.parquet(out)) == _canon(orders)


def test_sink_respects_timestamp_stats(spark, tmp_path):
    """Timestamp columns written by the sink carry order-preserving
    stats (the TIMESTAMP_MICROS contract the repo's writers keep)."""
    ev = load_tables(spark, SF_DIR)["events"].select("event_id", "ts")
    src = _stage_files(ev, 2)
    t = str(tmp_path / "tbl")
    _run_sink(spark, src, ev.schema, t, str(tmp_path / "ckpt"))
    assert _canon(read_table_version(spark, t)) == _canon(ev)
    m = read_manifest(t, current_version(t))
    st = [e["stats"].get("ts") for e in m["files"] if e.get("stats")]
    assert st and all(s and s[0] <= s[1] for s in st)


def test_batch_writer_append_and_overwrite(spark, tmp_path, orders):
    """df.write.format('snapshot_table'): append publishes one snapshot;
    overwrite is a logical truncate-and-load — old files stay readable
    by time travel until expiry."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tbl")
    a = orders.where("o_orderkey % 2 = 0")
    b = orders.where("o_orderkey % 2 = 1")
    a.write.format("snapshot_table").option("path", t).mode("append").save()
    assert current_version(t) == 1
    b.write.format("snapshot_table").option("path", t).mode("append").save()
    assert _canon(read_table_version(spark, t)) == _canon(orders)
    small = orders.limit(5)
    small.write.format("snapshot_table").option("path", t).mode(
        "overwrite"
    ).save()
    assert current_version(t) == 3
    assert read_manifest(t, 3)["op"] == "overwrite"
    assert _canon(read_table_version(spark, t)) == _canon(small)
    # time travel still reads the pre-overwrite state
    assert _canon(read_table_version(spark, t, 2)) == _canon(orders)


def test_sink_crash_between_finalize_and_commit_is_invisible(
    spark, tmp_path, orders, monkeypatch
):
    """Driver dies AFTER renaming staged files into data/ but BEFORE the
    manifest commit: the files are unreferenced (every reader blind to
    them), the batch replays cleanly (exactly-once via the ledger path:
    no manifest ever recorded the dead attempt), and expire_snapshots'
    grace sweep collects the strands."""
    import iceberg_file_writer_spark.sources.snapshot_stream as ss
    from iceberg_file_writer_spark.ingest.snapshots import expire_snapshots

    t = str(tmp_path / "tbl")
    kv = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    commit_append(spark, kv, t)
    w = ss._SnapshotStreamWriter(kv.schema, {"path": t})
    msg = w.write(_kv_batch([(1, 2.0), (2, 3.0)]))
    boom = RuntimeError("driver died")
    real_commit = ss._commit
    monkeypatch.setattr(
        ss, "_commit", lambda *a, **k: (_ for _ in ()).throw(boom)
    )
    w2_files = set(os.listdir(os.path.join(t, "data")))
    with pytest.raises(RuntimeError, match="driver died"):
        w.commit([msg], 7)
    stranded = set(os.listdir(os.path.join(t, "data"))) - w2_files
    assert stranded  # renamed but never referenced
    assert current_version(t) == 1  # table unchanged
    assert read_table_version(spark, t).count() == 10
    # replay of batch 7 (Spark re-runs write + commit after recovery)
    monkeypatch.setattr(ss, "_commit", real_commit)
    msg2 = w.write(_kv_batch([(1, 2.0), (2, 3.0)]))
    w.commit([msg2], 7)
    assert current_version(t) == 2
    assert read_manifest(t, 2)["batch_ids"] == [7]
    # a second replay is a ledgered no-op
    msg3 = w.write(_kv_batch([(1, 2.0)]))
    w.commit([msg3], 7)
    assert current_version(t) == 2
    # the stranded attempt is crash debris: grace sweep collects it
    expire_snapshots(t, keep_last=2, data_grace_seconds=0)
    assert stranded.isdisjoint(os.listdir(os.path.join(t, "data")))


def test_batch_writer_schema_gate(spark, tmp_path, orders):
    """Write-compatibility: type flips always refuse; new columns need
    the explicit mergeSchema=true evolution opt-in; absent columns pass
    (they read back NULL); overwrite replaces the contract wholesale."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tbl")
    w = lambda df: df.write.format("snapshot_table").option("path", t)
    w(orders).mode("append").save()
    # type flip: o_orderkey as string
    flipped = orders.withColumn("o_orderkey", F.col("o_orderkey").cast("string"))
    with pytest.raises(Exception, match="type conflict"):
        w(flipped).mode("append").save()
    # unseen column without the opt-in
    extra = orders.limit(3).withColumn("o_priority", F.lit("HIGH"))
    with pytest.raises(Exception, match="mergeSchema"):
        w(extra).mode("append").save()
    # with the opt-in: additive evolution, old rows NULL-filled
    extra.write.format("snapshot_table").option("path", t).option(
        "mergeSchema", "true"
    ).mode("append").save()
    got = read_table_version(spark, t)
    assert got.where("o_priority IS NULL").count() == orders.count()
    # absent columns are fine
    w(orders.limit(2).select("o_orderkey", "o_custkey")).mode("append").save()
    # overwrite: a new contract, the flip is accepted as a fresh schema
    w(flipped.limit(4)).mode("overwrite").save()
    assert read_table_version(spark, t).count() == 4


def test_writer_commit_retries_through_conflict(spark, tmp_path, monkeypatch):
    """An interleaved writer steals the version slot between the sink's
    parent read and its O_EXCL manifest create: the commit retries on the
    new parent and both writers' rows survive."""
    import iceberg_file_writer_spark.sources.snapshot_stream as ss

    t = str(tmp_path / "tbl")
    kv = spark.createDataFrame([(1, 1.0)], "k long, v double")
    commit_append(spark, kv, t)
    w = ss._SnapshotStreamWriter(kv.schema, {"path": t})
    msg = w.write(_kv_batch([(2, 2.0)]))
    real_cv = ss.current_version
    state = {"raced": False}

    def racing_cv(path):
        v = real_cv(path)
        if not state["raced"]:
            state["raced"] = True
            # rival commits AFTER we read the parent: our first O_EXCL
            # create hits its manifest and raises CommitConflict
            commit_append(
                spark, spark.createDataFrame([(3, 3.0)], "k long, v double"), t
            )
        return v

    monkeypatch.setattr(ss, "current_version", racing_cv)
    w.commit([msg], 0)
    assert real_cv(t) == 3  # base + rival + ours
    assert _canon(read_table_version(spark, t)) == [
        (1, 1.0), (2, 2.0), (3, 3.0),
    ]
    assert read_manifest(t, 3)["batch_ids"] == [0]
