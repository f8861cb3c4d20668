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
