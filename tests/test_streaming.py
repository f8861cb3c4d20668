"""Streaming analytics: results checked against the oracle-verified batch duals.

Each streaming query is driven to completion over the static sf0.001
events table (file source → memory sink → processAllAvailable), then the
finalized result is compared to the equivalent batch computation — which
itself is covered by the DuckDB oracle in test_oracle_parity.py.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.streaming.windows import (
    session_windows,
    user_running_totals,
    windowed_event_stats,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Events as a parquet directory suitable for a file-source stream
    (timestamps normalized to micros by load_tables)."""
    path = str(tmp_path_factory.mktemp("events-stream"))
    ev = load_tables(spark, SF_DIR)["events"]
    ev.write.mode("overwrite").parquet(path)
    yield path, ev.schema
    shutil.rmtree(path, ignore_errors=True)


def _run_to_completion(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _read_stream(spark, events_stream_dir):
    path, schema = events_stream_dir
    return spark.readStream.schema(schema).parquet(path)


def test_windowed_stats_matches_batch(spark, events_stream_dir):
    stream = windowed_event_stats(_read_stream(spark, events_stream_dir))
    got = _run_to_completion(spark, stream, "win_stats")

    batch = (
        load_tables(spark, SF_DIR)["events"]
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # Append mode emits only watermark-finalized windows; every emitted
    # window must exactly match its batch dual, and most windows finalize.
    assert g <= b
    assert len(g) >= 0.8 * len(b)


def test_session_windows_run_and_bound(spark, events_stream_dir):
    stream = session_windows(_read_stream(spark, events_stream_dir), gap="30 minutes")
    got = _run_to_completion(spark, stream, "sess")
    rows = got.collect()
    assert rows, "no finalized sessions emitted"
    # sessions are per-user, disjoint, and each spans >= 1 event
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1


def test_stateful_running_totals(spark, events_stream_dir):
    stream = user_running_totals(_read_stream(spark, events_stream_dir))
    got = _run_to_completion(spark, stream, "totals").collect()
    assert got, "no stateful output"
    ev = load_tables(spark, SF_DIR)["events"]
    expect = {
        r.user_id: (r.n, round(r.v, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    # the LAST emitted row per user carries the final cumulative totals
    final = {}
    for r in got:
        final[r.user_id] = (r.total_events, round(r.total_value, 6))
    assert final == expect


def test_streaming_rate_limit_multiple_batches(spark, events_stream_dir, tmp_path):
    """maxFilesPerTrigger forces multiple micro-batches; totals still converge
    (the reference's bounded-channel backpressure analog, main.go:64)."""
    path, schema = events_stream_dir
    # re-write input as several files to make rate limiting meaningful
    multi = str(tmp_path / "multi")
    spark.read.schema(schema).parquet(path).repartition(8).write.parquet(multi)
    stream_df = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(multi)
    got = _run_to_completion(spark, user_running_totals(stream_df), "totals_rl").collect()
    n_events = sum(r.batch_events for r in got)
    assert n_events == spark.read.schema(schema).parquet(multi).count()


def test_rocksdb_state_store_runs_stateful_query(spark, events_stream_dir):
    """use_rocksdb_state_store: the scale-safe state-store configuration
    (disk-backed state, changelog checkpointing) runs a watermarked
    stateful aggregation to the same finalized result as the default
    provider. Skips if the provider cannot initialize in this environment."""
    from iceberg_file_writer_spark.session import use_rocksdb_state_store

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    use_rocksdb_state_store(spark)
    try:
        stream = windowed_event_stats(_read_stream(spark, events_stream_dir))
        try:
            got = _run_to_completion(spark, stream, "rocksdb_win_stats")
            n = got.count()
        except Exception as exc:  # pragma: no cover - env-dependent
            pytest.skip(f"RocksDB state store unavailable here: {exc}")
        # same finalized emission contract as the default provider
        # (test_windowed_stats_matches_batch): non-trivial, subset of the
        # batch dual
        batch = (
            load_tables(spark, SF_DIR)["events"]
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
                F.avg("value").alias("avg_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "event_type",
                "n_events",
                "total_value",
                "avg_value",
            )
        )
        g = {tuple(r) for r in got.collect()}
        b = {tuple(r) for r in batch.collect()}
        assert n > 0 and g <= b
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_transform_with_state_daily_totals(spark, events_stream_dir, tmp_path):
    """transformWithState variant of the finalized daily-totals operator
    (MapState + event-time timers, RocksDB provider). The API's Python
    state protocol needs the protobuf package; skip with the actionable
    reason where it isn't installed — the operator itself is implemented
    and this test is its executable spec."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pip install protobuf) for its state-server protocol; not "
            "available in this environment"
        )
    from iceberg_file_writer_spark.session import use_rocksdb_state_store
    from iceberg_file_writer_spark.streaming.windows import (
        user_daily_totals_closed,
        user_daily_totals_closed_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    use_rocksdb_state_store(spark)
    try:
        got = _run_to_completion(
            spark,
            user_daily_totals_closed_tws(_read_stream(spark, events_stream_dir)),
            "daily_tws",
        )
        ref = _run_to_completion(
            spark,
            user_daily_totals_closed(_read_stream(spark, events_stream_dir)),
            "daily_apis",
        )
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in ref.collect()}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_cdc_upsert_multi_batch_matches_batch_latest(spark, events_stream_dir, tmp_path):
    """The foreachBatch upsert sink must converge to the batch latest-state
    result regardless of micro-batch boundaries: stream the events from a
    many-file directory one file per trigger and compare the final state
    table to the batch window dual."""
    from iceberg_file_writer_spark.queries.streaming_ops import run_cdc_upsert

    path, schema = events_stream_dir
    multi = str(tmp_path / "events-multi")
    spark.read.schema(schema).parquet(path).repartition(5).write.parquet(multi)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    got = run_cdc_upsert(spark, src)

    ev = load_tables(spark, SF_DIR)["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows


def test_watermark_drop_accounting_surfaces_late_rows(spark, events_stream_dir, tmp_path):
    """Late files must be *visibly* dropped: stream a fresh file first so
    the watermark advances, then deliver a much older file and assert the
    state_metrics_summary accounting reports the dropped rows."""
    import time

    from iceberg_file_writer_spark.streaming.metrics import state_metrics_summary
    from iceberg_file_writer_spark.streaming.windows import windowed_event_stats

    path, schema = events_stream_dir
    ev = spark.read.schema(schema).parquet(path)
    cutoff = "2024-01-20 00:00:00"
    src_dir = str(tmp_path / "late-src")
    os.makedirs(src_dir)
    # batch 1: the recent half — advances the watermark to ~max(ts) - 10m
    ev.where(F.col("ts") >= cutoff).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "recent")
    )
    # batch 2: the old half — every row far below the advanced watermark
    ev.where(F.col("ts") < cutoff).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "old")
    )

    def files_of(d):
        return [
            os.path.join(str(tmp_path / d), f)
            for f in os.listdir(str(tmp_path / d))
            if f.endswith(".parquet")
        ]

    shutil.copy(files_of("recent")[0], os.path.join(src_dir, "a.parquet"))
    stream = windowed_event_stats(spark.readStream.schema(schema).parquet(src_dir))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        shutil.copy(files_of("old")[0], os.path.join(src_dir, "b.parquet"))
        time.sleep(0.1)
        q.processAllAvailable()
        m = state_metrics_summary(q)
    finally:
        q.stop()
    assert m["rows_dropped_by_watermark"] > 0, m
    assert m["batches"] >= 2, m
    assert m["last_watermark"] is not None, m


def test_streaming_priority_sample_batch_split_invariant(spark, tmp_path):
    """Forced 8-batch run (one file per trigger, files carved by doc_id
    range so early batches hold none of the winners) must produce exactly
    the batch priority sample — merge(topk(A), topk(B)) = topk(A ∪ B)."""
    from iceberg_file_writer_spark.queries.analytics_ext import (
        doc_priority_sample,
    )
    from iceberg_file_writer_spark.queries.streaming_ops import (
        run_streaming_priority_sample,
    )

    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    incoming = str(tmp_path / "prio-in")
    # range-partitioned files: each micro-batch sees one contiguous
    # doc_id slice, so no batch alone contains the global top-k
    docs.repartitionByRange(8, "doc_id").write.parquet(incoming)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(incoming)
    )
    got = {
        tuple(r)
        for r in run_streaming_priority_sample(spark, stream).collect()
    }
    want = {tuple(r) for r in doc_priority_sample(spark, SF_DIR).collect()}
    assert got == want
