"""Equality deletes: one-commit merge-on-read upserts, key deletes,
sequence-number semantics, time travel, CDC, compaction retirement, GC,
and interplay with positional DVs / CoW verbs / branches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.equality_deletes import (
    commit_delete_keys,
    commit_upsert,
    eq_stats,
    expire_equality_deletes,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    changes_between,
    commit_append,
    commit_compact,
    commit_delete_where,
    commit_merge,
    current_version,
    read_manifest,
    read_table_version,
    scan_pruned,
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
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    commit_append(spark, orders, t, max_rows=200)
    return t, orders


def _upsert_df(orders):
    """Updates (custkey%5=0 rows, price doubled) + inserts (fresh keys
    above the max)."""
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    updates = orders.where("o_custkey % 5 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    inserts = orders.where("o_custkey % 11 = 0").withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(maxk)
    )
    return updates.unionByName(inserts)


def test_upsert_one_commit_no_table_read(spark, table):
    t, orders = table
    before = _data_mtimes(t)
    ups = _upsert_df(orders)
    v = commit_upsert(spark, t, ups, ["o_orderkey"])
    assert v == 2
    # zero standing data files rewritten OR EVEN OPENED — mtimes equal
    for n, mt in before.items():
        assert _data_mtimes(t)[n] == mt
    survivors = orders.join(
        ups.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    assert _canon(read_table_version(spark, t)) == _canon(
        survivors.unionByName(ups)
    )


def test_same_key_reupsert_latest_wins(spark, table):
    t, orders = table
    k = orders.agg(F.min("o_orderkey")).first()[0]

    def row(price):
        return orders.where(F.col("o_orderkey") == k).withColumn(
            "o_totalprice", F.lit(float(price))
        )

    commit_upsert(spark, t, row(1.0), ["o_orderkey"])
    commit_upsert(spark, t, row(2.0), ["o_orderkey"])
    got = (
        read_table_version(spark, t)
        .where(F.col("o_orderkey") == k)
        .collect()
    )
    assert len(got) == 1 and got[0].o_totalprice == 2.0


def test_append_after_key_delete_survives(spark, table):
    """Sequence semantics: a delete only reaches files OLDER than it."""
    t, orders = table
    k = int(orders.agg(F.min("o_orderkey")).first()[0])
    commit_delete_keys(
        spark, t, spark.createDataFrame([(k,)], "o_orderkey bigint")
    )
    assert (
        read_table_version(spark, t).where(F.col("o_orderkey") == k).count()
        == 0
    )
    fresh = orders.where(F.col("o_orderkey") == k).withColumn(
        "o_totalprice", F.lit(123.0)
    )
    commit_append(spark, fresh, t)
    got = (
        read_table_version(spark, t)
        .where(F.col("o_orderkey") == k)
        .collect()
    )
    assert len(got) == 1 and got[0].o_totalprice == 123.0


def test_time_travel_replays_each_eq_set(spark, table):
    t, orders = table
    ups = _upsert_df(orders)
    commit_upsert(spark, t, ups, ["o_orderkey"])
    k = int(orders.agg(F.min("o_orderkey")).first()[0])
    commit_delete_keys(
        spark, t, spark.createDataFrame([(k,)], "o_orderkey bigint")
    )
    assert _canon(read_table_version(spark, t, 1)) == _canon(orders)
    v2 = read_table_version(spark, t, 2)
    survivors = orders.join(ups.select("o_orderkey"), "o_orderkey", "left_anti")
    assert _canon(v2) == _canon(survivors.unionByName(ups))
    assert (
        read_table_version(spark, t, 3)
        .where(F.col("o_orderkey") == k)
        .count()
        == 0
    )


def test_changes_between_emits_upsert_changelog(spark, table):
    t, orders = table
    ups = _upsert_df(orders)
    commit_upsert(spark, t, ups, ["o_orderkey"])
    feed = changes_between(spark, t, 1, 2)
    minus = feed.where("change = '-'")
    plus = feed.where("change = '+'")
    old = orders.join(ups.select("o_orderkey"), "o_orderkey", "left_semi")
    assert _canon(minus.drop("change")) == _canon(old)
    assert _canon(plus.drop("change")) == _canon(ups)


def test_changes_between_eq_delete_only(spark, table):
    t, orders = table
    keys = orders.where("o_custkey % 7 = 0").select("o_orderkey")
    commit_delete_keys(spark, t, keys)
    feed = changes_between(spark, t, 1, 2)
    assert feed.where("change = '+'").count() == 0
    gone = orders.join(keys, "o_orderkey", "left_semi")
    assert _canon(feed.where("change = '-'").drop("change")) == _canon(gone)


def test_compaction_materializes_and_retires(spark, table):
    t, orders = table
    commit_upsert(spark, t, _upsert_df(orders), ["o_orderkey"])
    cur = _canon(read_table_version(spark, t))
    commit_compact(spark, t)
    assert _canon(read_table_version(spark, t)) == cur
    assert eq_stats(t)["n_eq_files"] == 0
    # post-compaction CDC over the compaction step is empty
    v = current_version(t)
    assert changes_between(spark, t, v - 1, v).count() == 0


def test_cow_delete_does_not_resurrect_eq_deleted(spark, table):
    t, orders = table
    keys = orders.where("o_custkey % 7 = 0").select("o_orderkey")
    commit_delete_keys(spark, t, keys)
    commit_delete_where(spark, t, "o_custkey % 5 = 0")
    want = orders.where("o_custkey % 5 <> 0").join(
        keys, "o_orderkey", "left_anti"
    )
    assert _canon(read_table_version(spark, t)) == _canon(want)


def test_cow_merge_over_eq_deletes(spark, table):
    t, orders = table
    keys = orders.where("o_custkey % 7 = 0").select("o_orderkey")
    commit_delete_keys(spark, t, keys)
    upd = orders.where("o_custkey % 3 = 0").withColumn(
        "o_totalprice", F.lit(1.0)
    )
    commit_merge(spark, t, upd, "o_orderkey")
    survivors = (
        orders.join(keys, "o_orderkey", "left_anti")
        .join(upd.select("o_orderkey"), "o_orderkey", "left_anti")
    )
    assert _canon(read_table_version(spark, t)) == _canon(
        survivors.unionByName(upd)
    )


def test_mixed_positional_and_equality_deletes(spark, table):
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )

    t, orders = table
    commit_delete_where_mor(spark, t, "o_custkey % 5 = 0")
    keys = orders.where("o_custkey % 7 = 0").select("o_orderkey")
    commit_delete_keys(spark, t, keys)
    want = orders.where("o_custkey % 5 <> 0").join(
        keys, "o_orderkey", "left_anti"
    )
    assert _canon(read_table_version(spark, t)) == _canon(want)
    # pruned scans honor both delete kinds
    lo = int(orders.agg(F.min("o_orderkey")).first()[0])
    hi = int(orders.agg(F.max("o_orderkey")).first()[0])
    df, info = scan_pruned(spark, t, "o_orderkey", lo, hi)
    assert _canon(df.select(*want.columns)) == _canon(want)


def test_key_columns_must_be_consistent(spark, table):
    t, orders = table
    commit_delete_keys(
        spark, t, orders.limit(1).select("o_orderkey")
    )
    with pytest.raises(ValueError, match="equality-delete key"):
        commit_delete_keys(spark, t, orders.limit(1).select("o_custkey"))


def test_empty_delta_commits_without_eq_file(spark, table):
    t, orders = table
    v = commit_delete_keys(
        spark, t, orders.where("false").select("o_orderkey")
    )
    assert v == 2 and eq_stats(t)["n_eq_files"] == 0
    assert _canon(read_table_version(spark, t)) == _canon(orders)


def test_eq_gc_drops_only_unreferenced(spark, table):
    t, orders = table
    commit_upsert(spark, t, _upsert_df(orders), ["o_orderkey"])
    # live eq file survives GC even with zero grace
    assert expire_equality_deletes(t, grace_seconds=0) == 0
    commit_compact(spark, t)
    from iceberg_file_writer_spark.ingest.snapshots import expire_snapshots

    expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    assert expire_equality_deletes(t, grace_seconds=0) == 1
    assert os.listdir(os.path.join(t, "eq")) == []
    cur = orders  # compacted state equals the upserted relation
    ups = _upsert_df(orders)
    survivors = orders.join(ups.select("o_orderkey"), "o_orderkey", "left_anti")
    assert _canon(read_table_version(spark, t)) == _canon(
        survivors.unionByName(ups)
    )


def test_branch_staged_rows_escape_base_eq_deletes(spark, table):
    """A row staged on a WAP branch is NEWER than any pre-existing
    equality delete, so publish must surface it even when its key was
    deleted before the branch."""
    from iceberg_file_writer_spark.ingest.branching import (
        commit_append_branch,
        create_branch,
        publish_branch,
        read_branch,
    )

    t, orders = table
    k = int(orders.agg(F.min("o_orderkey")).first()[0])
    commit_delete_keys(
        spark, t, spark.createDataFrame([(k,)], "o_orderkey bigint")
    )
    create_branch(t, "wap")
    fresh = orders.where(F.col("o_orderkey") == k).withColumn(
        "o_totalprice", F.lit(777.0)
    )
    commit_append_branch(spark, fresh, t, "wap")
    staged = read_branch(spark, t, "wap").where(F.col("o_orderkey") == k)
    assert staged.count() == 1 and staged.first().o_totalprice == 777.0
    publish_branch(t, "wap")
    got = (
        read_table_version(spark, t)
        .where(F.col("o_orderkey") == k)
        .collect()
    )
    assert len(got) == 1 and got[0].o_totalprice == 777.0


def test_streaming_upsert_composition(spark, table, tmp_path):
    """foreachBatch-shaped composition: per-batch latest-per-key upserts
    fold into the table; the final state equals the batch latest-state
    read (recency within batches + key replacement across batches)."""
    t = str(tmp_path / "ups")
    ev = (
        load_tables(spark, SF_DIR)["events"]
        .select("user_id", "ts", "event_type")
        .where("user_id % 4 = 0")
    )
    commit_append(
        spark,
        ev.where("false"),
        t,
    )
    # split into 3 "micro-batches" by ts tercile (monotone event time —
    # the file-stream arrival order), reduce each to latest per key
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cuts = [lo, lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3, hi]
    from pyspark.sql import Window

    for i in range(3):
        cond = (F.col("ts") > cuts[i]) if i else (F.col("ts") >= cuts[i])
        batch = ev.where(cond & (F.col("ts") <= cuts[i + 1]))
        latest = (
            batch.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("ts"), F.desc("event_type")
                    )
                ),
            )
            .where("_rn = 1")
            .drop("_rn")
        )
        commit_upsert(spark, t, latest, ["user_id"])
    want = (
        ev.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_type")
                )
            ),
        )
        .where("_rn = 1")
        .drop("_rn")
    )
    assert _canon(read_table_version(spark, t)) == _canon(want)


def test_streaming_upsert_sink_exactly_once(spark, tmp_path):
    """A replayed micro-batch (same batch_id after a checkpoint recovery)
    is a no-op: no new snapshot, no double-applied upsert — even when the
    replay arrives AFTER later batches committed (the ledger is
    cumulative, so the stale id is still recognized)."""
    from iceberg_file_writer_spark.ingest.equality_deletes import (
        streaming_upsert_sink,
    )

    t = str(tmp_path / "tbl")

    def row(k: int, v: float):
        return spark.createDataFrame([(k, v)], "user_id long, value double")

    sink = streaming_upsert_sink(t, ["user_id"])
    sink(row(1, 1.0).union(row(2, 2.0)), 0)
    sink(row(1, 10.0), 1)
    v_after = current_version(t)
    assert v_after == 2
    # replay batch 0: ledger hit, nothing committed, batch-1 value stands
    sink(row(1, 1.0).union(row(2, 2.0)), 0)
    assert current_version(t) == v_after
    assert _canon(read_table_version(spark, t)) == [(1, 10.0), (2, 2.0)]
    # the ledger survives in the newest manifest (single-read dedup)
    assert read_manifest(t, v_after)["batch_ids"] == [0, 1]


def test_streaming_upsert_sink_empty_batch_ledgers(spark, tmp_path):
    """An empty micro-batch still commits its batch_id into the ledger
    (files unchanged, no eq entry) — a later replay of that id is
    recognized instead of re-running (the join_view empty-delta lesson,
    ADVICE r7)."""
    from iceberg_file_writer_spark.ingest.equality_deletes import (
        streaming_upsert_sink,
    )

    t = str(tmp_path / "tbl")
    sink = streaming_upsert_sink(t, ["user_id"])
    df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    sink(df, 0)
    sink(df.where("false"), 1)
    assert current_version(t) == 2
    m = read_manifest(t, 2)
    assert m["batch_ids"] == [0, 1]
    # empty batch added no tombstones: eqs carried forward unchanged
    assert m.get("eqs") == read_manifest(t, 1).get("eqs")
    assert _canon(read_table_version(spark, t)) == [(1, 1.0)]
