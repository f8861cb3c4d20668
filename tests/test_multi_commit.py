"""Multi-table atomic commit: all-or-nothing across tables under crash
injection at every Python-side rename window, exactly-once replays,
honest conflicts with concurrent single-table writers, and reader
invisibility of in-flight claims."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.multi_commit import (
    commit_multi,
    recover_multi,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    CommitConflict,
    commit_append,
    current_version,
    read_table_version,
    snapshot_log,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def setup(spark, tmp_path):
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    ta, tb = str(tmp_path / "facts"), str(tmp_path / "stats")
    commit_append(spark, orders.where("o_orderkey % 2 = 0"), ta, max_rows=200)
    commit_append(
        spark,
        orders.where("o_orderkey % 2 = 0")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n")),
        tb,
        max_rows=200,
    )
    txn = str(tmp_path / "txn")
    return orders, ta, tb, txn


def test_both_tables_advance_atomically(spark, setup):
    orders, ta, tb, txn = setup
    delta = orders.where("o_orderkey % 2 = 1")
    stats_delta = delta.groupBy("o_custkey").agg(F.count("*").alias("n"))
    got = commit_multi(
        spark, txn, [(ta, delta), (tb, stats_delta)], max_rows=200, batch_id="b1"
    )
    assert got == {ta: 2, tb: 2}
    assert read_table_version(spark, ta).count() == orders.count()
    # replay: exactly-once no-op
    assert commit_multi(
        spark, txn, [(ta, delta), (tb, stats_delta)], max_rows=200, batch_id="b1"
    ) == {}
    assert (current_version(ta), current_version(tb)) == (2, 2)


def test_conflict_rolls_back_all_claims(spark, setup):
    orders, ta, tb, txn = setup
    delta = orders.where("o_orderkey % 2 = 1")

    # a concurrent writer holds tb's next version slot mid-stage
    # (an in-flight claim: manifest exists, CURRENT not flipped)
    rival = os.path.join(tb, "_snapshots", "v000002.json")
    with open(rival, "w") as f:
        f.write('{"version": 2, "parent": 1, "op": "append", "files": []}')
    with pytest.raises(CommitConflict):
        commit_multi(
            spark, txn,
            [(ta, delta),
             (tb, delta.groupBy("o_custkey").agg(F.count("*").alias("n")))],
            max_rows=200,
        )
    # ta's claim was rolled back: no v2 manifest, CURRENT untouched;
    # the rival's claim is NOT ours and must survive the rollback
    assert current_version(ta) == 1
    assert [e["version"] for e in snapshot_log(ta)] == [1]
    assert os.path.exists(rival)
    # rival aborts (its claim vacates); our retry then succeeds
    os.remove(rival)
    got = commit_multi(
        spark, txn,
        [(ta, delta),
         (tb, delta.groupBy("o_custkey").agg(F.count("*").alias("n")))],
        max_rows=200,
    )
    assert got == {ta: 2, tb: 2}


def test_inflight_claim_is_invisible_to_readers(spark, setup, monkeypatch):
    """Crash right after the claims land (pre-marker): snapshot_log and
    read_table_version must not surface the unflipped version."""
    import iceberg_file_writer_spark.ingest.multi_commit as MC

    orders, ta, tb, txn = setup
    delta = orders.where("o_orderkey % 2 = 1")

    class Boom(Exception):
        pass

    def no_marker(path, content):
        if path.endswith(MC._MARKER):
            raise Boom()
        return MC_write(path, content)

    MC_write = MC.write_atomic
    monkeypatch.setattr(MC, "write_atomic", no_marker)
    with pytest.raises(Boom):
        commit_multi(spark, txn, [(ta, delta)], max_rows=200)
    monkeypatch.setattr(MC, "write_atomic", MC_write)

    # claim exists on disk but is invisible everywhere
    assert os.path.exists(os.path.join(ta, "_snapshots", "v000002.json"))
    assert [e["version"] for e in snapshot_log(ta)] == [1]
    with pytest.raises(ValueError):
        read_table_version(spark, ta, 2)
    # recovery rolls it back; retry applies cleanly
    recover_multi(txn)
    assert not os.path.exists(os.path.join(ta, "_snapshots", "v000002.json"))
    assert commit_multi(spark, txn, [(ta, delta)], max_rows=200) == {ta: 2}


def test_crash_sweep_all_or_nothing(spark, setup):
    """Inject a crash at EVERY Python-side atomic-write/rename window of
    the protocol; after recover_multi + a batch_id retry, BOTH tables
    hold exactly the post-commit state — never a partial outcome."""
    import iceberg_file_writer_spark.ingest.ledger as L

    orders, ta, tb, txn0 = setup
    delta = orders.where("o_orderkey % 2 = 1")
    stats_delta = delta.groupBy("o_custkey").agg(F.count("*").alias("n"))
    want_a = _canon(orders)
    # base_b as an expression over source data (NOT a lazy read of tb's
    # files — the sweep's reset deletes and recreates those files)
    base_b = orders.where("o_orderkey % 2 = 0").groupBy("o_custkey").agg(
        F.count("*").alias("n")
    )
    want_b = _canon(base_b.unionByName(stats_delta))

    real_rename = os.rename
    crash_at = 0
    while True:
        crash_at += 1
        txn = f"{txn0}-{crash_at}"
        calls = {"n": 0, "crashed": False}

        class Boom(Exception):
            pass

        def boom_rename(src, dst, *, _c=calls, _k=crash_at):
            # only renames under this test's tables/txn dir count: Spark's
            # own temp renames happen JVM-side and don't pass through here
            if any(p in src for p in (ta, tb, txn)):
                _c["n"] += 1
                if _c["n"] == _k:
                    _c["crashed"] = True
                    raise Boom()
            return real_rename(src, dst)

        os.rename = boom_rename
        try:
            commit_multi(
                spark, txn, [(ta, delta), (tb, stats_delta)],
                max_rows=200, batch_id="bx",
            )
        except Boom:
            pass
        finally:
            os.rename = real_rename

        recover_multi(txn)
        va, vb = current_version(ta), current_version(tb)
        assert (va, vb) in ((1, 1), (2, 2)), f"partial outcome at {crash_at}"
        # retry with the SAME batch_id: exactly-once either way
        commit_multi(
            spark, txn, [(ta, delta), (tb, stats_delta)],
            max_rows=200, batch_id="bx",
        )
        assert (current_version(ta), current_version(tb)) == (2, 2)
        assert _canon(read_table_version(spark, ta)) == want_a
        assert _canon(read_table_version(spark, tb)) == want_b
        # reset for the next window: fresh tables
        if not calls["crashed"]:
            break
        import shutil

        for t in (ta, tb):
            shutil.rmtree(t)
        commit_append(spark, orders.where("o_orderkey % 2 = 0"), ta, max_rows=200)
        commit_append(spark, base_b, tb, max_rows=200)
    assert crash_at > 3  # the sweep exercised several distinct windows


def test_multi_commit_carries_deletion_vectors_and_spec(spark, setup):
    """A multi-table append to a table holding MoR tombstones (or a
    hidden-partition spec) must inherit them like a single-table append
    — dropping the dvs would silently resurrect deleted rows."""
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )
    from iceberg_file_writer_spark.ingest.snapshots import read_manifest

    orders, ta, tb, txn = setup
    commit_delete_where_mor(spark, ta, "o_custkey % 3 = 0")
    want_before = _canon(read_table_version(spark, ta))
    delta = orders.where("o_orderkey % 2 = 1")
    got = commit_multi(spark, txn, [(ta, delta)], max_rows=200)
    v = got[ta]
    m = read_manifest(ta, v)
    assert m.get("dvs"), "multi-commit dropped the parent's deletion vectors"
    assert _canon(read_table_version(spark, ta)) == sorted(
        want_before + _canon(delta)
    )


def test_recover_never_deletes_rival_torn_manifest(spark, setup, tmp_path):
    """An unparseable manifest at a claimed version belongs to a rival
    single-table writer mid-write (our own claims are linked into place
    fully formed); rollback must leave it intact."""
    import json

    from iceberg_file_writer_spark.ingest.snapshots import _manifest_path

    orders, ta, tb, txn = setup
    os.makedirs(txn, exist_ok=True)
    # our intent claims version 2 of ta...
    with open(os.path.join(txn, "txn.staging.json"), "w") as f:
        json.dump({"claims": [[ta, 2]], "txn": "deadbeef"}, f)
    # ...but a rival is mid-json.dump at that slot (empty file on disk)
    open(_manifest_path(ta, 2), "w").close()
    recover_multi(txn)
    assert os.path.exists(_manifest_path(ta, 2)), (
        "rollback deleted a rival's in-flight manifest"
    )
    os.remove(_manifest_path(ta, 2))  # clean the simulated torn file


def test_multi_commit_after_itself_inherits_ledger(spark, setup):
    """batch_ids accumulated by streaming appends survive an interleaved
    multi-table commit (inheritance parity with snapshots._commit)."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        read_manifest,
        streaming_append_sink,
    )

    orders, ta, tb, txn = setup
    streaming_append_sink(ta, max_rows=200)(orders.limit(3), 41)
    commit_multi(spark, txn, [(ta, orders.limit(2))], max_rows=200)
    m = read_manifest(ta, current_version(ta))
    assert m.get("batch_ids") == [41]


def test_multi_commit_versions_are_time_travelable(spark, setup):
    """Round-9 advice (low): commit_multi stamped no ts_ms, so
    TIMESTAMP AS OF treated its versions as legacy and silently
    resolved past them. The claimed manifest now carries the commit
    stamp exactly as snapshots._commit does."""
    import time

    from iceberg_file_writer_spark.ingest.snapshots import (
        read_manifest,
        version_asof,
    )

    orders, ta, tb, txn = setup
    delta = orders.where("o_orderkey % 2 = 1")
    commit_multi(spark, txn, [(ta, delta)], max_rows=200, batch_id="t1")
    m = read_manifest(ta, current_version(ta))
    assert isinstance(m.get("ts_ms"), int), "multi-commit manifest lacks ts_ms"
    now = int(time.time() * 1000) + 1
    assert version_asof(ta, now) == current_version(ta) == 2


def test_streaming_multi_txn_sink_lockstep_and_replay(spark, setup):
    """The foreachBatch adapter: member tables advance in LOCKSTEP
    (reader never sees fact without its rollup) and a replayed batch_id
    is a transaction-wide no-op."""
    from iceberg_file_writer_spark.ingest.multi_commit import (
        streaming_multi_txn_sink,
    )
    from pyspark.sql import functions as F

    orders, ta, tb, txn = setup
    fact_v0, roll_v0 = current_version(ta), current_version(tb)

    def members(batch_df):
        return [
            (ta, batch_df),
            (tb, batch_df.groupBy("o_custkey").agg(F.count("*").alias("n"))),
        ]

    sink = streaming_multi_txn_sink(txn, members, max_rows=500)
    delta = orders.where("o_orderkey % 2 = 1")
    sink(delta, 7)
    assert current_version(ta) == fact_v0 + 1
    assert current_version(tb) == roll_v0 + 1
    n_after = read_table_version(spark, ta).count()
    sink(delta, 7)  # replay: transaction-wide no-op
    assert current_version(ta) == fact_v0 + 1
    assert current_version(tb) == roll_v0 + 1
    assert read_table_version(spark, ta).count() == n_after
