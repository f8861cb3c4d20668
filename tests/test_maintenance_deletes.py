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
