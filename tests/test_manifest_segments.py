"""Two-level manifests: sealed content-addressed segments are REUSED
across appends (commit metadata cost O(delta)), reads resolve
transparently, expire GCs exactly the unreferenced segments."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import iceberg_file_writer_spark.ingest.snapshots as SN
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    commit_delete_where,
    current_version,
    expire_snapshots,
    read_manifest,
    read_table_version,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _segs(t):
    d = os.path.join(t, "_snapshots")
    return sorted(n for n in os.listdir(d) if n.startswith("seg-"))


def _raw(t, v):
    with open(os.path.join(t, "_snapshots", f"v{v:06d}.json")) as f:
        return json.load(f)


@pytest.fixture()
def small_segments(monkeypatch):
    """Shrink the seal threshold so a 20-file table exercises the
    two-level path."""
    monkeypatch.setattr(SN, "MANIFEST_SEGMENT_SIZE", 4)


def test_appends_reuse_sealed_segments(spark, small_segments, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # ~7 files per commit (1500 rows / 220)
    commit_append(spark, orders.where("o_orderkey % 2 = 0"), t, max_rows=120)
    n1 = len(read_manifest(t, 1)["files"])
    assert n1 > 4  # past the (shrunk) threshold: segmented
    segs1 = set(_segs(t))
    assert segs1 and "segments" in _raw(t, 1)
    mtimes1 = {
        s: os.path.getmtime(os.path.join(t, "_snapshots", s)) for s in segs1
    }

    commit_append(spark, orders.where("o_orderkey % 2 = 1"), t, max_rows=120)
    raw2 = _raw(t, 2)
    # every v1 sealed segment reused byte-identically (content addressing)
    assert set(raw2["segments"]) >= {s for s in raw2["segments"][: len(segs1)]}
    for s in segs1:
        if s in raw2["segments"]:
            assert (
                os.path.getmtime(os.path.join(t, "_snapshots", s)) == mtimes1[s]
            )
    assert set(raw2["segments"][: len(_raw(t, 1)["segments"])]) == set(
        _raw(t, 1)["segments"]
    )  # the sealed prefix is IDENTICAL — append re-sealed nothing before it
    # inline manifest stays O(delta): tail below one segment
    assert len(raw2.get("tail", [])) < SN.MANIFEST_SEGMENT_SIZE

    # reads resolve to the full list
    assert read_table_version(spark, t).count() == orders.count()
    m = read_manifest(t, 2)
    assert len(m["files"]) > n1  # v2 = v1's files + the new batch's
    paths = [e["path"] for e in m["files"]]
    assert len(paths) == len(set(paths))  # resolution duplicates nothing


def test_delete_and_time_travel_on_segmented_table(spark, small_segments, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    commit_append(spark, orders, t, max_rows=120)
    n_all = orders.count()
    commit_delete_where(spark, t, "o_orderstatus = 'F'", max_rows=120)
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert read_table_version(spark, t).count() == n_all - n_f
    assert read_table_version(spark, t, 1).count() == n_all


def test_expire_gcs_unreferenced_segments(spark, small_segments, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    commit_append(spark, orders.where("o_orderkey % 2 = 0"), t, max_rows=120)
    # CoW delete re-chunks: v2's segments differ from v1's
    commit_delete_where(spark, t, "o_custkey % 3 = 0", max_rows=120)
    commit_append(spark, orders.where("o_orderkey % 2 = 1"), t, max_rows=120)
    all_before = set(_segs(t))
    live_after = set()
    expire_snapshots(t, keep_last=2, data_grace_seconds=0)
    for v in (2, 3):
        live_after |= set(_raw(t, v).get("segments", []))
    assert set(_segs(t)) == live_after  # exactly the referenced ones kept
    assert all_before - live_after  # something was actually collected
    # the retained versions still read fine
    assert read_table_version(spark, t).count() > 0
    assert read_table_version(spark, t, 2).count() > 0


def test_manifest_memo_parses_each_version_once(spark, tmp_path):
    """Round-9 directive: planning used to json-parse the FULL file
    list per scan — the 100x metadata bottleneck. Resolved manifests
    are now memoized per (path, mtime, size): one parse per version per
    session, an in-place metadata attach (new mtime/size) re-parses,
    and callers' mutations never leak into the cache."""
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    commit_append(spark, orders, t, max_rows=200)
    p0 = SN.read_manifest_parses
    a = read_manifest(t, 1)
    p1 = SN.read_manifest_parses
    b = read_manifest(t, 1)
    assert SN.read_manifest_parses == p1 and p1 <= p0 + 1, (
        "second read of an unchanged manifest re-parsed it"
    )
    # caller mutations are private: the memo hands out copies
    a["files"][0]["stats"] = {"POISON": [0, 0, 0]}
    a["op"] = "poisoned"
    c = read_manifest(t, 1)
    assert c["op"] == "append" and "POISON" not in (
        c["files"][0].get("stats") or {}
    )
    assert b["op"] == "append"
    # an in-place attach atomically replaces the file -> fresh parse
    from iceberg_file_writer_spark.ingest.snapshots import attach_column_stats

    attach_column_stats(t, 1, ("o_custkey",))
    d = read_manifest(t, 1)
    assert SN.read_manifest_parses == p1 + 1
    assert all("o_custkey" in e["stats"] for e in d["files"])


def test_distributed_prune_matches_python_loop(spark, small_segments,
                                               tmp_path, monkeypatch):
    """Above the threshold, stats pruning runs executor-side over the
    sealed segment files; it must keep EXACTLY the entries the
    canonical driver loop keeps, and scan_table stays row-identical."""
    import iceberg_file_writer_spark.ingest.file_skipping as FS
    from iceberg_file_writer_spark.ingest.file_skipping import (
        prune_files,
        prune_files_distributed,
        scan_table,
    )

    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    clustered = orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    commit_append(spark, clustered, t, max_rows=120)
    raw = _raw(t, 1)
    assert "segments" in raw, "fixture not segmented"
    m = read_manifest(t, 1)
    med = int(orders.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).first()[0])
    for conj in (
        [("o_orderkey", ">=", med)],
        [("o_orderkey", "<", med), ("o_custkey", "notnull")],
        [("o_orderkey", "=", med)],
        [("o_totalprice", ">", 1e12)],        # prunes everything
        [("o_comment", "=", "absent-col")],   # no stats: keeps everything
        [("o_orderkey", "!=", med), ("o_orderkey", "isnull")],
    ):
        want = prune_files(m["files"], conj)
        got = prune_files_distributed(
            spark, t, raw["segments"], raw.get("tail") or [], conj
        )
        assert sorted(e["path"] for e in got) == sorted(
            e["path"] for e in want
        ), conj
    # scan_table routes through the distributed path above the threshold
    monkeypatch.setattr(FS, "DISTRIBUTED_PRUNE_THRESHOLD", 4)
    got_df = scan_table(spark, t, [("o_orderkey", ">=", med)])
    kept, total = scan_table.last_files
    assert kept < total == len(m["files"])
    want_df = read_table_version(spark, t, 1).where(f"o_orderkey >= {med}")
    assert sorted(map(tuple, got_df.collect())) == sorted(
        map(tuple, want_df.collect())
    )
