"""Merge-on-read deletes: tombstones instead of rewrites, exact reads
and time travel, sound interplay with CoW verbs and compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.deletion_vectors import (
    commit_delete_where_mor,
    dv_stats,
    expire_deletion_vectors,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    commit_compact,
    commit_delete_where,
    commit_merge,
    current_version,
    read_manifest,
    read_table_version,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _data_mtimes(t):
    d = os.path.join(t, "data")
    return {n: os.path.getmtime(os.path.join(d, n)) for n in os.listdir(d)}


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    commit_append(spark, orders, t, max_rows=200)
    return t, orders


def test_mor_delete_rewrites_nothing_and_reads_exact(spark, table):
    t, orders = table
    before = _data_mtimes(t)
    v = commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    assert v == 2
    assert _data_mtimes(t) == before  # ZERO data files rewritten
    want = orders.where("o_orderstatus <> 'F'")
    assert _canon(read_table_version(spark, t)) == _canon(want)
    # time travel: v1 still sees everything
    assert read_table_version(spark, t, 1).count() == orders.count()
    assert dv_stats(t)["tombstone_rows"] == orders.where(
        "o_orderstatus = 'F'"
    ).count()


def test_sequential_mor_deletes_accumulate(spark, table):
    t, orders = table
    commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    commit_delete_where_mor(spark, t, "o_custkey % 5 = 0")
    want = orders.where("o_orderstatus <> 'F' AND o_custkey % 5 <> 0")
    assert _canon(read_table_version(spark, t)) == _canon(want)
    # second delete's scan was DV-applied: no double tombstones
    n1 = orders.where("o_orderstatus = 'F'").count()
    n2 = orders.where("o_orderstatus <> 'F' AND o_custkey % 5 = 0").count()
    assert dv_stats(t)["tombstone_rows"] == n1 + n2
    # a delete matching nothing commits but adds no DV
    v = commit_delete_where_mor(spark, t, "o_orderkey = -1")
    assert v == 4 and dv_stats(t)["n_dvs"] == 2


def test_append_after_mor_carries_tombstones(spark, table):
    t, orders = table
    commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    extra = orders.limit(7).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    commit_append(spark, extra, t, max_rows=200)
    want = orders.where("o_orderstatus <> 'F'").unionByName(extra)
    assert _canon(read_table_version(spark, t)) == _canon(want)


def test_cow_delete_after_mor_does_not_resurrect(spark, table):
    t, orders = table
    commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    commit_delete_where(spark, t, "o_custkey % 3 = 0", max_rows=200)
    want = orders.where("o_orderstatus <> 'F' AND o_custkey % 3 <> 0")
    assert _canon(read_table_version(spark, t)) == _canon(want)


def test_merge_after_mor_does_not_resurrect(spark, table):
    t, orders = table
    commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    upd = orders.limit(10).withColumn("o_totalprice", F.lit(1.0))
    commit_merge(spark, t, upd, "o_orderkey", max_rows=200)
    survivors = orders.where("o_orderstatus <> 'F'").join(
        upd.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    want = survivors.unionByName(upd)
    assert _canon(read_table_version(spark, t)) == _canon(want)


def test_compact_retires_tombstones(spark, table):
    t, orders = table
    commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    want = _canon(read_table_version(spark, t))
    v = commit_compact(spark, t)
    m = read_manifest(t, v)
    assert m.get("dvs") == []  # tombstones retired
    assert _canon(read_table_version(spark, t)) == want
    # DV dirs unreferenced once history expires -> GC'd
    from iceberg_file_writer_spark.ingest.snapshots import expire_snapshots

    expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    assert expire_deletion_vectors(t, grace_seconds=0) == 1
    assert dv_stats(t) == {"n_dvs": 0, "tombstone_rows": 0}


def test_changes_between_sees_mor_deletes(spark, table):
    """A MoR delete changes no file list, but the CDC feed between the
    surrounding snapshots must still emit the tombstoned rows as '-'."""
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    t, orders = table
    v2 = commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    ch = changes_between(spark, t, 1, v2)
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert ch.where("change = '-'").count() == n_f
    assert ch.where("change = '+'").count() == 0
    assert ch.where("change = '-' AND o_orderstatus <> 'F'").count() == 0


def test_changes_between_compaction_of_mor_state_is_empty(spark, table):
    """Compacting a MoR snapshot rewrites files AND retires tombstones
    without changing a single visible row — its change feed is empty
    (deleted rows must NOT spuriously surface as '-' here: they already
    appeared at the delete_mor snapshot)."""
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    t, orders = table
    v2 = commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    v3 = commit_compact(spark, t)
    assert changes_between(spark, t, v2, v3).count() == 0
    # and the full 1 -> v3 feed equals the 1 -> v2 feed (delete only)
    n_f = orders.where("o_orderstatus = 'F'").count()
    ch = changes_between(spark, t, 1, v3)
    assert ch.where("change = '-'").count() == n_f
    assert ch.where("change = '+'").count() == 0


def test_changes_between_mixed_append_and_mor_delete(spark, table):
    """One feed spanning an append AND a MoR delete yields both signs
    exactly (carried-file DV delta composes with the file diff)."""
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    t, orders = table
    commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    extra = orders.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    v3 = commit_append(spark, extra, t, max_rows=200)
    ch = changes_between(spark, t, 1, v3)
    assert ch.where("change = '+'").count() == 5
    assert ch.where("change = '-'").count() == orders.where(
        "o_orderstatus = 'F'"
    ).count()
