"""Targeted copy-on-write deletes: only the keyed partitions are touched
(byte-for-byte untouched elsewhere), layout invariants survive the
rewrite, whole-partition deletes are metadata-only, and every crash
window of the two-rename swap is recoverable."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from iceberg_file_writer_spark.ingest.batch import (
    IngestConfig,
    ingest_batch,
    read_source,
    read_table,
)
from iceberg_file_writer_spark.ingest.maintenance import (
    apply_deletes,
    list_data_files,
    recover_deletes,
)
from tests.test_ingest import USERS_SMALL, _assert_invariants, _write_fixture_json

CFG = IngestConfig()


@pytest.fixture()
def table(spark, tmp_path):
    src = str(tmp_path / "input")
    n = _write_fixture_json(src)
    out = str(tmp_path / "table")
    ingest_batch(read_source(spark, src), out, CFG)
    return out, n


def _snapshot(table_path: str, exclude_user: str) -> dict[str, tuple[int, int]]:
    """(size, mtime_ns) of every data file outside the targeted partition."""
    return {
        p: (os.path.getsize(p), os.stat(p).st_mtime_ns)
        for p in list_data_files(table_path)
        if f"user_id={exclude_user}/" not in p
    }


def test_whole_partition_delete_is_metadata_only(spark, table):
    out, n = table
    before = _snapshot(out, "userid2")
    stats = apply_deletes(spark, out, ["userid2", "no-such-user"], CFG)
    assert stats == {
        "partitions_dropped": 1,
        "partitions_rewritten": 0,
        "rows_deleted": 50,
    }
    assert not os.path.isdir(os.path.join(out, "user_id=userid2"))
    assert _snapshot(out, "userid2") == before  # nothing else touched
    assert read_table(spark, out, CFG).count() == n - 50


def test_predicate_delete_rewrites_only_keyed_partitions(spark, table):
    out, n = table
    df = read_table(spark, out, CFG)
    cutoff = 5_000_000
    to_del = df.where(
        (df.user_id == "userid1") & (df.timestamp < cutoff)
    ).count()
    assert 0 < to_del < n
    before = _snapshot(out, "userid1")

    stats = apply_deletes(
        spark, out, ["userid1"], CFG, predicate=f"timestamp < {cutoff}"
    )
    assert stats["rows_deleted"] == to_del
    assert stats["partitions_rewritten"] == 1
    # untouched partitions byte-identical (same files, sizes, mtimes)
    assert _snapshot(out, "userid1") == before
    after = read_table(spark, out, CFG)
    assert after.count() == n - to_del
    assert after.where(f"user_id = 'userid1' AND timestamp < {cutoff}").count() == 0
    # layout invariants survive the rewrite (row bound, sort, compression)
    _assert_invariants(out, n - to_del, CFG)


def test_predicate_matching_nothing_leaves_partition_untouched(spark, table):
    out, n = table
    u = USERS_SMALL[0]
    before = {
        p: (os.path.getsize(p), os.stat(p).st_mtime_ns)
        for p in list_data_files(out)
    }
    stats = apply_deletes(spark, out, [u], CFG, predicate="timestamp < 0")
    assert stats == {
        "partitions_dropped": 0,
        "partitions_rewritten": 0,
        "rows_deleted": 0,
    }
    assert {
        p: (os.path.getsize(p), os.stat(p).st_mtime_ns)
        for p in list_data_files(out)
    } == before


def test_delete_crash_recovery(spark, table):
    out, n = table
    live = os.path.join(out, "user_id=userid3")
    # simulate a crash mid-swap: committed data stranded at .delete-old
    os.rename(live, live + ".delete-old")
    recover_deletes(out)
    assert os.path.isdir(live) and not os.path.exists(live + ".delete-old")
    assert read_table(spark, out, CFG).count() == n

    # crash after swap: old beside live -> old is dropped, live wins
    shutil.copytree(live, live + ".delete-old")
    os.makedirs(out + ".delete-tmp")  # stranded staging root too
    recover_deletes(out)
    assert not os.path.exists(live + ".delete-old")
    assert not os.path.exists(out + ".delete-tmp")
    assert read_table(spark, out, CFG).count() == n


# ---------------------------------------------------------------------------
# Partition-selective auto-compaction.
# ---------------------------------------------------------------------------


def _fragment_partition(spark, table_path: str, user: str, copies: int) -> None:
    """Append `copies` extra SMALL files to one partition (the streaming
    one-file-per-micro-batch fragmentation; rows sorted, so the per-file
    key-order invariant is preserved by construction)."""
    pdir = os.path.join(table_path, f"user_id={user}")
    df = (
        spark.read.parquet(pdir)
        .orderBy("timestamp")
        .limit(512)
        .coalesce(1)
        .sortWithinPartitions("timestamp")
    )
    for _ in range(copies):
        df.write.mode("append").parquet(pdir)


def test_auto_compact_rewrites_only_hot_partitions(spark, table):
    from iceberg_file_writer_spark.ingest.maintenance import (
        auto_compact,
        partition_file_counts,
    )

    out, n = table
    hot = "userid1"
    _fragment_partition(spark, out, hot, copies=4)
    before_rows = spark.read.parquet(out).groupBy().count().collect()[0][0]
    cold_before = _snapshot(out, hot)
    counts = partition_file_counts(out)
    hot_dir = os.path.join(out, f"user_id={hot}")
    assert counts[hot_dir] >= 5

    done = auto_compact(spark, out, CFG, min_files=5)
    assert done == [f"user_id={hot}"]
    # untouched partitions byte-identical (same files, sizes, mtimes)
    assert _snapshot(out, hot) == cold_before
    # hot partition consolidated to the footer-derived minimum file count
    import math

    import pyarrow.parquet as pq

    files = list_data_files(hot_dir)
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    # range-partition sampling makes per-range row counts uneven, so
    # maxRecordsPerFile may split a few ranges: bounded near-minimal,
    # never the pre-compaction fragmentation
    minimal = max(1, math.ceil(rows / CFG.max_rows_per_file))
    assert minimal <= len(files) <= 2 * minimal
    assert len(files) < counts[hot_dir]
    for f in files:
        pf = pq.ParquetFile(f)
        assert pf.metadata.num_rows <= CFG.max_rows_per_file
        ts = pf.read(columns=["timestamp"])["timestamp"].to_pylist()
        assert ts == sorted(ts), f
    # content unchanged
    assert spark.read.parquet(out).groupBy().count().collect()[0][0] == before_rows


def test_auto_compact_below_threshold_is_noop(spark, table):
    from iceberg_file_writer_spark.ingest.maintenance import auto_compact

    out, n = table
    before = {
        p: (os.path.getsize(p), os.stat(p).st_mtime_ns)
        for p in list_data_files(out)
    }
    assert auto_compact(spark, out, CFG, min_files=50) == []
    after = {
        p: (os.path.getsize(p), os.stat(p).st_mtime_ns)
        for p in list_data_files(out)
    }
    assert after == before


def test_auto_compact_crash_recovery(spark, table):
    """A stranded .compact-old with nothing live is restored; a stale
    staging root is dropped; a .compact-old beside a live dir is pruned."""
    import shutil

    from iceberg_file_writer_spark.ingest.maintenance import (
        auto_compact,
        recover_auto_compact,
    )

    out, n = table
    want = sorted(str(r) for r in spark.read.parquet(out).collect())
    hot_dir = os.path.join(out, "user_id=userid1")
    # crash mid-swap: partition renamed away, replacement never arrived
    os.rename(hot_dir, hot_dir + ".compact-old")
    os.makedirs(out + ".autocompact-tmp")
    recover_auto_compact(out)
    assert os.path.isdir(hot_dir)
    assert not os.path.exists(out + ".autocompact-tmp")
    assert sorted(str(r) for r in spark.read.parquet(out).collect()) == want
    # crash after swap: old beside live — entry-point recovery prunes it
    shutil.copytree(hot_dir, hot_dir + ".compact-old")
    assert auto_compact(spark, out, CFG, min_files=50) == []
    assert not os.path.exists(hot_dir + ".compact-old")
    assert sorted(str(r) for r in spark.read.parquet(out).collect()) == want


def test_delete_everything_leaves_readable_empty_table(spark, table):
    """Deleting every partition must leave a READABLE empty table: a
    zero-row keeper file preserves the data schema (and the partition
    column's type, via a dir value that actually occurred) — the
    hypothesis-found delete-everything edge, pinned."""
    from iceberg_file_writer_spark.ingest.maintenance import apply_deletes

    out, n = table
    users = ["userid1", *USERS_SMALL]
    stats = apply_deletes(spark, out, users)
    assert stats["rows_deleted"] == n
    after = spark.read.parquet(out)
    assert after.count() == 0
    assert "user_id" in after.columns and "timestamp" in after.columns
    # and the empty table accepts a predicate delete without erroring
    assert apply_deletes(spark, out, users, predicate="timestamp < 0") == {
        "partitions_dropped": 0,
        "partitions_rewritten": 0,
        "rows_deleted": 0,
    }


def test_storage_report_matches_footers(spark, tmp_path):
    """storage_report reads only footers; values must reconcile with a
    real scan of the table it describes."""
    from iceberg_file_writer_spark.ingest.batch import IngestConfig, ingest_batch
    from iceberg_file_writer_spark.ingest.maintenance import storage_report
    from iceberg_file_writer_spark.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    t = str(tmp_path / "tbl")
    cfg = IngestConfig(partition_column="event_type", key_column="ts",
                       max_rows_per_file=500)
    ingest_batch(ev, t, cfg, defaults={})
    rep = storage_report(t)
    by_part = {r["partition"]: r for r in rep}
    counts = {
        f"event_type={r.event_type}": r.n
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert set(by_part) == set(counts)
    for part, r in by_part.items():
        assert r["n_rows"] == counts[part]
        assert 0 < r["compression_ratio_permille"] <= 1000
        assert r["min_file_rows"] <= r["avg_rows_per_file"] <= r["max_file_rows"]
        assert r["max_file_rows"] <= 500  # layout bound preserved
        assert r["compressed_bytes"] > 0 and r["uncompressed_bytes"] > 0
