"""SnapshotTable facade: a full lifecycle through the one-object API,
each step pinned equivalent to the underlying verb's contract."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.table_api import SnapshotTable
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def orders(spark):
    return load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_full_lifecycle_through_facade(spark, tmp_path, orders):
    t = SnapshotTable.create(
        spark, str(tmp_path / "ord"), orders, max_rows=300
    )
    assert t.version() == 1
    before_ms = int(time.time() * 1000)

    # MoR delete -> the read applies tombstones
    t.delete_where("o_custkey % 5 = 0", mode="mor")
    survivors = orders.where("o_custkey % 5 <> 0")
    assert _canon(t.read()) == _canon(survivors)

    # UPDATE via the facade's DML text routing (name = path basename)
    t.sql("UPDATE ord SET o_totalprice = 0.0 WHERE o_custkey % 5 = 1")
    zeroed = survivors.withColumn(
        "o_totalprice",
        F.when(F.col("o_custkey") % 5 == 1, 0.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    assert _canon(t.read()) == _canon(zeroed)

    # MoR upsert
    upd = orders.limit(5).withColumn("o_totalprice", F.lit(-3.0))
    t.upsert(upd, keys=["o_orderkey"])
    assert t.read().where("o_totalprice = -3.0").count() == 5

    # time travel + changes + history + inspect
    assert _canon(t.read(version=1)) == _canon(orders)
    assert _canon(t.read(asof_ms=before_ms)) == _canon(orders)
    assert t.changes(1, 2).count() > 0
    ops = [s["op"] for s in t.history()]
    assert ops[0] == "append" and "delete_mor" in ops and "upsert_mor" in ops
    assert t.inspect("snapshots").count() == t.version()

    # scan + bloom + tag + compact + vacuum
    t.tag("freeze")
    lo = int(orders.agg(F.min("o_orderkey")).first()[0])
    got = t.scan([("o_orderkey", "in", [lo])])
    assert _canon(got) == _canon(t.read().where(F.col("o_orderkey") == lo))
    t.compact()
    assert t.clustering_report()["n_dv_files"] == 0  # debt retired
    frozen = _canon(t.read_tag("freeze"))
    t.vacuum(keep_last=1, grace_seconds=0)
    assert _canon(t.read_tag("freeze")) == frozen  # tag pins through GC
    assert len(t.history()) >= 1


def test_facade_spec_create_prunes(spark, tmp_path):
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "value"
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "ev"), ev,
        spec=[("bucket", 4, "user_id")], max_rows=40,
    )
    uid = int(ev.agg(F.min("user_id")).first()[0])
    got = t.scan([("user_id", "=", uid)])
    from iceberg_file_writer_spark.ingest.partitioning import scan_partitioned

    kept, total = scan_partitioned.last_files
    assert kept < total
    assert _canon(got) == _canon(ev.where(F.col("user_id") == uid))


def test_facade_mode_validation(spark, tmp_path, orders):
    t = SnapshotTable.create(spark, str(tmp_path / "o"), orders)
    with pytest.raises(ValueError, match="cow.*mor|mor.*cow"):
        t.delete_where("true", mode="nope")


def test_create_spec_without_data_raises(spark, tmp_path):
    """create(spec=...) with no genesis data used to silently discard
    the spec (ADVICE r9) — now it refuses loudly."""
    with pytest.raises(ValueError, match="genesis data"):
        SnapshotTable.create(
            spark, str(tmp_path / "t"), spec=[("bucket", 4, "user_id")]
        )


def test_scan_time_travel_routes_by_requested_version(spark, tmp_path):
    """A scan of version N plans with version N's manifest (ADVICE r9):
    here v1 is UNpartitioned and the current version carries a spec —
    a v1 scan must route through the plain planner and still read v1's
    rows exactly."""
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "ev")
    t = SnapshotTable.create(spark, path, ev.where("event_id % 2 = 0"))
    v1 = t.version()
    # spec change: re-create the data under a bucket spec (new commit)
    from iceberg_file_writer_spark.ingest.partitioning import (
        commit_append_partitioned,
    )

    commit_append_partitioned(
        spark, ev.where("event_id % 2 = 1"), path,
        [("bucket", 4, "user_id")], max_rows=40,
    )
    uid = int(ev.agg(F.min("user_id")).first()[0])
    got = t.scan([("user_id", "=", uid)], version=v1)
    want = ev.where(
        (F.col("event_id") % 2 == 0) & (F.col("user_id") == uid)
    )
    assert _canon(got) == _canon(want)


def test_facade_analyze_stats_and_zorder_compact(spark, tmp_path):
    from iceberg_file_writer_spark.table_api import SnapshotTable
    from iceberg_file_writer_spark.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id", "user_id", "value"
    )
    t = SnapshotTable.create(spark, str(tmp_path / "ev"), ev)
    t.analyze(["user_id"])
    st = t.stats()
    assert st["n_rows"] == ev.count()
    assert st["columns"]["user_id"]["ndv"] == ev.select("user_id").distinct().count()
    before = sorted(tuple(r) for r in t.read().collect())
    t.compact(target_rows=200, zorder_by=("user_id", "value"))
    assert sorted(tuple(r) for r in t.read().collect()) == before


def test_facade_scan_routes_mapped_tables(spark, tmp_path):
    """r12: SnapshotTable.scan on a COLUMN-MAPPED table routes through
    the field-id pruned scan — bucket pruning survives a rename, and
    results stay row-identical to read_mapped + where."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        create_mapped_table,
        evolve_mapped,
        read_mapped,
        scan_mapped_partitioned,
    )

    t = str(tmp_path / "m")
    df = spark.range(3000).selectExpr("id", "id * 10 AS v")
    create_mapped_table(
        spark, df, t, max_rows=300, spec=[("bucket", 8, "id")]
    )
    evolve_mapped(t, renames={"id": "ident"})
    tab = SnapshotTable(spark, t)
    out = tab.scan([("ident", "=", 7)])
    kept, total = scan_mapped_partitioned.last_files
    assert kept < total
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in read_mapped(spark, t).where("ident = 7").collect()
    )
