"""Incremental join-view maintenance: delta appends, partition-selective
dim updates, crash recovery, exactly-once replays.

Contract: after ANY interleaving of fact batches and dim updates
(including replays and injected crashes), ``read_join_view`` equals the
from-scratch ``facts JOIN dim_now`` — and dim updates rewrite ONLY the
buckets containing a changed key (mtime-asserted).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.join_view import (
    JV_BUCKETS,
    init_join_view,
    read_join_view,
    recover_join_view,
    refresh_join_view_dim,
    refresh_join_view_facts,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _sources(spark):
    t = load_tables(spark, SF_DIR)
    facts = t["orders"].select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    dim = t["customer"].select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    return facts, dim


def test_fact_appends_equal_full_join(spark, tmp_path):
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts.where("o_orderkey % 3 = 0"), dim, view, "custkey")
    r1 = refresh_join_view_facts(
        spark, facts.where("o_orderkey % 3 = 1"), dim, view, "custkey", batch_id=1
    )
    assert r1["rows_appended"] > 0
    refresh_join_view_facts(
        spark, facts.where("o_orderkey % 3 = 2"), dim, view, "custkey", batch_id=2
    )
    # replayed batch id: exactly-once no-op (incl. int/str alias)
    assert (
        refresh_join_view_facts(
            spark, facts.where("o_orderkey % 3 = 1"), dim, view, "custkey", batch_id="1"
        )["rows_appended"]
        == 0
    )
    assert _canon(read_join_view(spark, view)) == _canon(facts.join(dim, "custkey"))


def test_dim_update_rewrites_only_affected_buckets(spark, tmp_path):
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts, dim, view, "custkey")

    # update one dim key's attribute -> exactly one affected bucket
    some_key = dim.select("custkey").orderBy("custkey").first().custkey
    dim_now = dim.withColumn(
        "c_mktsegment",
        F.when(F.col("custkey") == some_key, F.lit("RELABELED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    changed = dim.select("custkey").where(F.col("custkey") == some_key)

    before = {
        name: os.path.getmtime(os.path.join(view, name))
        for name in os.listdir(view)
        if name.startswith("kb=")
    }
    r = refresh_join_view_dim(
        spark, facts, dim_now, changed, view, "custkey", batch_id="dim-1"
    )
    assert r["buckets_refreshed"] == 1
    touched = f"kb={some_key % JV_BUCKETS}"
    for name, mt in before.items():
        if name == touched:
            continue
        # untouched buckets keep their directory mtime (no file was
        # added, removed, or rewritten inside them)
        assert os.path.getmtime(os.path.join(view, name)) == mt, name
    assert _canon(read_join_view(spark, view)) == _canon(facts.join(dim_now, "custkey"))

    # replay: no-op
    assert (
        refresh_join_view_dim(
            spark, facts, dim_now, changed, view, "custkey", batch_id="dim-1"
        )["buckets_refreshed"]
        == 0
    )


def test_interleaved_fact_and_dim_batches(spark, tmp_path):
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts.where("o_orderkey % 2 = 0"), dim, view, "custkey")
    dim_now = dim.withColumn(
        "c_name", F.concat(F.col("c_name"), F.lit("-v2"))
    )
    refresh_join_view_dim(
        spark,
        facts.where("o_orderkey % 2 = 0"),
        dim_now,
        dim.select("custkey"),
        view,
        "custkey",
        batch_id="d1",
    )
    refresh_join_view_facts(
        spark, facts.where("o_orderkey % 2 = 1"), dim_now, view, "custkey", batch_id="f1"
    )
    assert _canon(read_join_view(spark, view)) == _canon(facts.join(dim_now, "custkey"))


def test_crash_recovery_rolls_back_and_forward(spark, tmp_path):
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts, dim, view, "custkey")
    want = _canon(read_join_view(spark, view))
    base = view.rstrip("/")

    # rollback: staged debris + torn marker tmp, no marker
    os.makedirs(base + ".jv-tmp/append/kb=0")
    os.makedirs(base + ".jv-tmp/swap/kb=1")
    with open(base + ".jv-commit.tmp", "w") as f:
        f.write("torn")
    recover_join_view(view)
    assert not os.path.isdir(base + ".jv-tmp")
    assert not os.path.exists(base + ".jv-commit.tmp")
    assert _canon(read_join_view(spark, view)) == want

    # roll forward: a fully-staged swap + marker must commit on recovery
    from iceberg_file_writer_spark.ingest.ledger import ledger_contains, write_atomic

    empty_bucket = "kb=3"
    os.makedirs(base + f".jv-tmp/swap/{empty_bucket}")
    write_atomic(base + ".jv-commit", "crash-epoch")
    recover_join_view(view)
    assert not os.path.isdir(base + ".jv-tmp")
    assert not os.path.exists(base + ".jv-commit")
    assert ledger_contains(base + ".jv-applied.json", "crash-epoch")
    got = _canon(read_join_view(spark, view))
    want_wo_bucket = _canon(
        facts.join(dim, "custkey").where(
            F.pmod(F.col("custkey"), F.lit(JV_BUCKETS)) != 3
        )
    )
    assert got == want_wo_bucket  # bucket 3 swapped to the staged empty state

    # stranded .jv-old beside a missing live dir restores on rollback
    os.rename(os.path.join(view, "kb=5"), os.path.join(view, "kb=5.jv-old"))
    recover_join_view(view)
    assert os.path.isdir(os.path.join(view, "kb=5"))
    assert not os.path.isdir(os.path.join(view, "kb=5.jv-old"))


def test_empty_fact_delta_commits_and_ledgers(spark, tmp_path):
    """ADVICE r7: an empty delta (empty micro-batch, or a batch whose keys
    all miss the dim) must not crash on the staged-dir read-back, must
    leave the view intact, and must STILL ledger its batch_id so a retry
    is an exactly-once no-op rather than a re-fail loop."""
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts, dim, view, "custkey")
    before = _canon(read_join_view(spark, view))

    empty = facts.where(F.lit(False))
    r = refresh_join_view_facts(spark, empty, dim, view, "custkey", batch_id="e1")
    assert r == {"rows_appended": 0}
    # keys that all miss the dim: join output is empty too
    miss = facts.withColumn("custkey", F.col("custkey") + F.lit(10_000_000))
    r2 = refresh_join_view_facts(spark, miss, dim, view, "custkey", batch_id="e2")
    assert r2 == {"rows_appended": 0}
    assert _canon(read_join_view(spark, view)) == before
    # both ids ledgered: replaying with a NON-empty batch is skipped
    r3 = refresh_join_view_facts(spark, facts, dim, view, "custkey", batch_id="e1")
    assert r3 == {"rows_appended": 0}
    assert _canon(read_join_view(spark, view)) == before


def test_batch_id_literal_skip_is_not_inband(spark, tmp_path):
    """ADVICE r7: a caller whose real batch_id is literally "SKIP" must be
    applied normally, not silently treated as a replay."""
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts.where("o_orderkey % 2 = 0"), dim, view, "custkey")
    r = refresh_join_view_facts(
        spark, facts.where("o_orderkey % 2 = 1"), dim, view, "custkey", batch_id="SKIP"
    )
    assert r["rows_appended"] > 0
    exp = _canon(_with := facts.join(dim, "custkey"))
    assert _canon(read_join_view(spark, view)) == exp
    # and the second "SKIP" IS now a replay of that id
    assert (
        refresh_join_view_facts(
            spark, facts.where("o_orderkey % 2 = 1"), dim, view, "custkey",
            batch_id="SKIP",
        )["rows_appended"]
        == 0
    )


def test_empty_dim_update_ledgers_batch_id(spark, tmp_path):
    """A dim batch whose changed_keys relation is empty still records its
    batch_id (same retry-loop hazard as the empty fact delta)."""
    facts, dim = _sources(spark)
    view = str(tmp_path / "view")
    init_join_view(spark, facts, dim, view, "custkey")
    no_keys = dim.select("custkey").where(F.lit(False))
    r = refresh_join_view_dim(
        spark, facts, dim, no_keys, view, "custkey", batch_id="d0"
    )
    assert r == {"buckets_refreshed": 0}
    # replay with a non-empty changed set under the same id: skipped
    some = dim.select("custkey").limit(3)
    r2 = refresh_join_view_dim(
        spark, facts, dim, some, view, "custkey", batch_id="d0"
    )
    assert r2 == {"buckets_refreshed": 0}
