"""Write-audit-publish branches: staged commits invisible to main
readers, fast-forward-only atomic publish, divergence honesty, failed
audits leaving no trace, GC interplay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.branching import (
    BranchDiverged,
    commit_append_branch,
    create_branch,
    delete_branch,
    list_branches,
    publish_branch,
    read_branch,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    current_version,
    expire_snapshots,
    read_manifest,
    read_table_version,
    snapshot_log,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    commit_append(spark, orders.where("o_orderkey % 2 = 0"), t, max_rows=300)
    return t, orders


def test_stage_audit_publish_roundtrip(spark, table):
    t, orders = table
    half = orders.where("o_orderkey % 2 = 0")
    staged = orders.where("o_orderkey % 2 = 1")
    create_branch(t, "wap")
    commit_append_branch(spark, staged, t, "wap", max_rows=300)
    # audit surface sees base + staged; production sees base only
    assert _canon(read_branch(spark, t, "wap")) == _canon(orders)
    assert _canon(read_table_version(spark, t)) == _canon(half)
    assert current_version(t) == 1
    v = publish_branch(t, "wap")
    assert v == 2 and current_version(t) == 2
    assert _canon(read_table_version(spark, t)) == _canon(orders)
    assert list_branches(t) == {}
    m = read_manifest(t, 2)
    assert m["op"] == "publish" and m["published_branch"] == "wap"


def test_multiple_branch_commits_squash(spark, table):
    t, orders = table
    create_branch(t, "wap")
    commit_append_branch(
        spark, orders.where("o_orderkey % 4 = 1"), t, "wap", max_rows=300
    )
    commit_append_branch(
        spark, orders.where("o_orderkey % 4 = 3"), t, "wap", max_rows=300
    )
    assert _canon(read_branch(spark, t, "wap")) == _canon(orders)
    publish_branch(t, "wap")
    # two staged commits -> ONE main snapshot; linear history
    assert current_version(t) == 2
    assert _canon(read_table_version(spark, t)) == _canon(orders)


def test_publish_refuses_divergence(spark, table):
    t, orders = table
    create_branch(t, "wap")
    commit_append_branch(
        spark, orders.where("o_orderkey % 2 = 1"), t, "wap", max_rows=300
    )
    # a main writer lands first
    commit_append(spark, orders.limit(3), t, max_rows=300)
    with pytest.raises(BranchDiverged):
        publish_branch(t, "wap")
    # branch intact for rebase/re-stage decisions
    assert "wap" in list_branches(t)
    delete_branch(t, "wap")


def test_failed_audit_leaves_no_trace(spark, table):
    t, orders = table
    before = _canon(read_table_version(spark, t))
    before_log = [e["version"] for e in snapshot_log(t)]
    create_branch(t, "bad")
    commit_append_branch(spark, orders.limit(10), t, "bad", max_rows=300)
    delete_branch(t, "bad")
    assert list_branches(t) == {}
    assert _canon(read_table_version(spark, t)) == before
    assert [e["version"] for e in snapshot_log(t)] == before_log
    # the staged data files are unreferenced debris -> grace sweep
    res = expire_snapshots(t, keep_last=5, data_grace_seconds=0)
    assert _canon(read_table_version(spark, t)) == before


def test_live_branch_survives_expire(spark, table):
    """expire_snapshots on the main table must not collect data files
    only a live branch references."""
    t, orders = table
    create_branch(t, "wap")
    commit_append_branch(
        spark, orders.where("o_orderkey % 2 = 1"), t, "wap", max_rows=300
    )
    want = _canon(read_branch(spark, t, "wap"))
    # churn main history, then expire with zero grace
    commit_append(spark, orders.limit(1), t, max_rows=300)
    commit_append(spark, orders.limit(1), t, max_rows=300)
    expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    assert _canon(read_branch(spark, t, "wap")) == want
    delete_branch(t, "wap")


def test_publish_idempotent_after_crash(spark, table):
    """Crash between the publish commit and branch cleanup: the re-run
    recognizes its own publish manifest and just finishes."""
    from iceberg_file_writer_spark.ingest import branching

    t, orders = table
    create_branch(t, "wap")
    commit_append_branch(
        spark, orders.where("o_orderkey % 2 = 1"), t, "wap", max_rows=300
    )
    # simulate the crash: run the commit half, skip cleanup
    ptr = branching._read_ptr(t, "wap")
    m = branching._branch_manifest(t, "wap", ptr)
    from iceberg_file_writer_spark.ingest.snapshots import _commit

    _commit(
        t,
        ptr["base"],
        "publish",
        m["files"],
        extra={"published_branch": "wap", "published_head": ptr["head"]},
    )
    assert "wap" in list_branches(t)  # pointer still present
    v = publish_branch(t, "wap")  # re-run: no double commit
    assert v == current_version(t) == 2
    assert list_branches(t) == {}
    assert _canon(read_table_version(spark, t)) == _canon(orders)


def test_branch_carries_storage_metadata(spark, table):
    """dvs ride from base into the branch and through publish."""
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )

    t, orders = table
    commit_delete_where_mor(spark, t, "o_custkey % 3 = 0")
    create_branch(t, "wap")
    commit_append_branch(
        spark, orders.where("o_orderkey % 2 = 1"), t, "wap", max_rows=300
    )
    want = orders.where(
        "o_orderkey % 2 = 1 OR (o_orderkey % 2 = 0 AND o_custkey % 3 <> 0)"
    )
    assert _canon(read_branch(spark, t, "wap")) == _canon(want)
    publish_branch(t, "wap")
    assert _canon(read_table_version(spark, t)) == _canon(want)


def test_branch_name_grammar():
    with pytest.raises(ValueError):
        create_branch("/tmp/nope", "bad-name")
