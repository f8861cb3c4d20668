"""Snapshot-versioned table layer: time travel reads exact historical
states, CoW deletes rewrite only affected files, commits are optimistic,
and expiry removes exactly the unreferenced data files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import (
    CommitConflict,
    _manifest_path,
    commit_append,
    commit_delete_where,
    current_version,
    expire_snapshots,
    read_manifest,
    read_table_version,
    snapshot_log,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _counts(df):
    return df.count()


@pytest.fixture()
def table(spark, tmp_path):
    """v1: orders halves committed in two appends -> v2."""
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"]
    v1 = commit_append(spark, orders.where("o_orderkey % 2 = 0"), t, max_rows=200)
    v2 = commit_append(spark, orders.where("o_orderkey % 2 = 1"), t, max_rows=200)
    assert (v1, v2) == (1, 2)
    return t, orders


def test_time_travel_reads_exact_states(spark, table):
    t, orders = table
    n_even = orders.where("o_orderkey % 2 = 0").count()
    n_all = orders.count()
    assert read_table_version(spark, t, 1).count() == n_even
    assert read_table_version(spark, t, 2).count() == n_all
    assert read_table_version(spark, t).count() == n_all  # current

    v3 = commit_delete_where(spark, t, "o_orderstatus = 'F'", max_rows=200)
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert read_table_version(spark, t, v3).count() == n_all - n_f
    assert read_table_version(spark, t, v3).where("o_orderstatus = 'F'").count() == 0
    # history unchanged after the delete
    assert read_table_version(spark, t, 2).count() == n_all


def test_cow_delete_carries_unaffected_files_by_reference(spark, table):
    t, orders = table
    before = {e["path"] for e in read_manifest(t, current_version(t))["files"]}
    # delete keyed far into one half: files holding no matching rows must
    # carry forward as the same physical files
    key = orders.where("o_orderkey % 2 = 1").agg(F.min("o_orderkey")).collect()[0][0]
    v = commit_delete_where(spark, t, f"o_orderkey = {key}", max_rows=200)
    after = read_manifest(t, v)["files"]
    carried = {e["path"] for e in after} & before
    assert len(carried) > 0  # most files untouched, carried by reference
    assert {e["path"] for e in after} != before  # something was rewritten
    # delete matching nothing carries the manifest over unchanged
    v2 = commit_delete_where(spark, t, "o_orderkey = -42", max_rows=200)
    assert {e["path"] for e in read_manifest(t, v2)["files"]} == {
        e["path"] for e in after
    }


def test_commit_conflict_detected(spark, table):
    t, orders = table
    parent = current_version(t)
    # another writer claims the next version first
    with open(_manifest_path(t, parent + 1), "w") as f:
        f.write("{}")
    with pytest.raises(CommitConflict):
        commit_append(spark, orders.limit(5), t, max_rows=200)


def test_expire_drops_only_unreferenced_files(spark, table):
    t, orders = table
    n_all = orders.count()
    commit_delete_where(spark, t, "o_orderstatus = 'F'", max_rows=200)
    stats = expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    assert stats["dropped_manifests"] == 2
    assert stats["dropped_files"] > 0
    # current state intact after expiry
    cur = read_table_version(spark, t)
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert cur.count() == n_all - n_f
    # every retained manifest's files exist on disk
    for snap in snapshot_log(t):
        for e in read_manifest(t, snap["version"])["files"]:
            assert os.path.exists(os.path.join(t, e["path"]))
    # time travel beyond the retained window is gone
    with pytest.raises(FileNotFoundError):
        read_manifest(t, 1)


def test_snapshot_log_shape(spark, table):
    t, orders = table
    log = snapshot_log(t)
    assert [s["version"] for s in log] == [1, 2]
    assert [s["op"] for s in log] == ["append", "append"]
    assert log[1]["n_rows"] == orders.count()


def test_merge_upsert_matches_latest_state(spark, table):
    from iceberg_file_writer_spark.ingest.snapshots import commit_merge

    t, orders = table
    # updates: change totalprice for 20 keys, insert 5 new synthetic keys
    upd_keys = orders.limit(20).select("o_orderkey")
    updates = (
        orders.join(upd_keys, "o_orderkey", "left_semi")
        .withColumn("o_totalprice", F.lit(1.0))
    )
    maxkey = orders.agg(F.max("o_orderkey")).collect()[0][0]
    inserts = orders.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(maxkey + 1000)
    )
    before = {e["path"] for e in read_manifest(t, current_version(t))["files"]}
    v = commit_merge(
        spark, t, updates.unionByName(inserts), "o_orderkey", max_rows=200
    )
    after = read_table_version(spark, t, v)
    assert after.count() == orders.count() + 5
    assert after.where("o_totalprice = 1.0").count() == 20 + inserts.where(
        "o_totalprice = 1.0"
    ).count()
    # unaffected files carried by reference
    carried = {e["path"] for e in read_manifest(t, v)["files"]} & before
    assert len(carried) > 0


def test_compact_preserves_rows_and_history(spark, table):
    from iceberg_file_writer_spark.ingest.snapshots import commit_compact

    t, orders = table
    n_files_before = len(read_manifest(t, current_version(t))["files"])
    v = commit_compact(spark, t)
    files = read_manifest(t, v)["files"]
    assert len(files) < n_files_before
    assert read_table_version(spark, t, v).count() == orders.count()
    # history before compaction still reads (old files retained)
    assert read_table_version(spark, t, 1).count() == orders.where(
        "o_orderkey % 2 = 0"
    ).count()


def test_streaming_sink_is_exactly_once(spark, tmp_path):
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        streaming_append_sink,
    )

    t = str(tmp_path / "stream-tbl")
    orders = load_tables(spark, SF_DIR)["orders"]
    sink = streaming_append_sink(t, max_rows=500)
    b0 = orders.where("o_orderkey % 2 = 0")
    b1 = orders.where("o_orderkey % 2 = 1")
    sink(b0, 0)
    sink(b1, 1)
    v = current_version(t)
    sink(b1, 1)  # crash-replay of batch 1: must be a no-op
    assert current_version(t) == v
    from iceberg_file_writer_spark.ingest.snapshots import read_table_version

    assert read_table_version(spark, t).count() == orders.count()


def test_changes_between_reads_only_differing_files(spark, table):
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    t, orders = table
    # v2 -> v3: delete F-status rows
    v3 = commit_delete_where(spark, t, "o_orderstatus = 'F'", max_rows=200)
    ch = changes_between(spark, t, 2, v3)
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert ch.where("change = '-'").count() == n_f
    assert ch.where("change = '+'").count() == 0
    assert ch.where("change = '-' AND o_orderstatus <> 'F'").count() == 0

    # append-only change feed: v1 -> v2 is purely inserts of the odd half
    ch12 = changes_between(spark, t, 1, 2)
    assert ch12.where("change = '-'").count() == 0
    assert ch12.where("change = '+'").count() == orders.where(
        "o_orderkey % 2 = 1"
    ).count()

    # the feed must not read carried files: appends diff only new files
    from iceberg_file_writer_spark.ingest.snapshots import read_manifest as rm

    carried = {e["path"] for e in rm(t, 1)["files"]} & {
        e["path"] for e in rm(t, 2)["files"]
    }
    assert len(carried) > 0  # the even half's files were carried


def test_additive_schema_evolution(spark, table):
    """A later append may add a column; earlier rows read as NULL for it,
    earlier versions keep their original schema, and CoW deletes work on
    the mixed-schema table."""
    t, orders = table
    evolved = orders.limit(30).withColumn("note", F.lit("late-column"))
    v = commit_append(spark, evolved, t, max_rows=200)

    cur = read_table_version(spark, t, v)
    assert "note" in cur.columns
    assert cur.where("note = 'late-column'").count() == 30
    assert cur.where("note IS NULL").count() == orders.count()
    # time travel below the evolution has no such column
    assert "note" not in read_table_version(spark, t, 2).columns

    # CoW delete across the mixed-schema snapshot: removing every row that
    # carried the column drops it from the (data-defined) merged schema
    v2 = commit_delete_where(spark, t, "note = 'late-column'", max_rows=200)
    after = read_table_version(spark, t, v2)
    assert after.count() == orders.count()
    assert "note" not in after.columns


def test_changes_between_across_schema_evolution(spark, table):
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    t, orders = table
    v = commit_append(
        spark, orders.limit(7).withColumn("note", F.lit("x")), t, max_rows=200
    )
    ch = changes_between(spark, t, 2, v)
    assert ch.where("change = '+'").count() == 7
    assert ch.where("change = '-'").count() == 0
    assert ch.where("change = '+' AND note = 'x'").count() == 7
    # identical manifests -> empty feed
    assert changes_between(spark, t, v, v).count() == 0


def test_manifest_stats_prune_file_reads(spark, tmp_path):
    """A range scan must hand Spark only the overlapping files, and the
    result must equal the unpruned filter exactly."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        attach_column_stats,
        scan_pruned,
    )

    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"]
    # range-ordered write -> tight per-file o_orderkey boxes
    v = commit_append(
        spark, orders.repartitionByRange(8, "o_orderkey"), t, max_rows=200
    )
    attach_column_stats(t, v, ("o_orderkey",))

    lo, hi = 100, 300
    df, info = scan_pruned(spark, t, "o_orderkey", lo, hi)
    want = orders.where(f"o_orderkey BETWEEN {lo} AND {hi}")
    assert df.count() == want.count() > 0
    assert info["files_scanned"] < info["files_total"], info

    # empty range: zero files handed to Spark, empty result, schema intact
    df0, info0 = scan_pruned(spark, t, "o_orderkey", -50, -10)
    assert info0["files_scanned"] == 0
    assert df0.count() == 0 and df0.columns == want.columns


# --- model-based property test: random op sequences vs a dict model ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 4)),
        st.tuples(st.just("delete_mod"), st.integers(2, 5)),
        st.tuples(st.just("merge_bump"), st.integers(1, 30)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("expire"), st.integers(1, 3)),
        st.tuples(st.just("tag"), st.just(0)),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_snapshot_ops_match_model(spark, tmp_path_factory, ops):
    """Any interleaving of append/delete/merge/compact/EXPIRE must keep
    (a) CURRENT equal to the same sequence applied to a plain dict model,
    (b) time travel reproducing every retained version's exact rows —
    even after expiry sweeps data files of dropped versions — and
    (c) expired versions unreadable while the newest state stays intact
    (VERDICT r6 item 8)."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_compact,
        commit_delete_where,
        commit_merge,
        current_version,
        read_table_version,
    )

    t = str(tmp_path_factory.mktemp("snap-prop") / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    base = {r.o_orderkey: r.o_totalprice for r in orders.collect()}
    model: dict[tuple[int, int], float] = {}
    history: dict[int, list] = {}  # retained version -> canonical rows
    expired: set[int] = set()
    tagged: dict[str, int] = {}  # tag name -> pinned version

    def _want():
        return sorted((kk[0], round(v, 2)) for kk, v in model.items())

    def _got(version=None):
        return sorted(
            (r.o_orderkey, round(r.o_totalprice, 2))
            for r in read_table_version(spark, t, version).collect()
        )

    def _check_history():
        for hv, want_rows in history.items():
            assert _got(hv) == want_rows, f"time travel drifted at v{hv}"
        for ev in expired:
            with pytest.raises(FileNotFoundError):
                read_table_version(spark, t, ev).collect()

    for op, arg in ops:
        if op == "append":
            lo, hi = arg * 300, arg * 300 + 300
            batch = orders.where(f"o_orderkey >= {lo} AND o_orderkey < {hi}")
            commit_append(spark, batch, t, max_rows=200)
            for k, v in base.items():
                if lo <= k < hi:
                    # append semantics: duplicate keys allowed; model keeps
                    # a multiset via count suffixing — simplify by tracking
                    # (key, occurrence) pairs
                    n = sum(1 for kk in model if kk[0] == k)
                    model[(k, n)] = v
        elif op == "delete_mod":
            if not model:
                continue
            commit_delete_where(spark, t, f"o_orderkey % {arg} = 0", max_rows=200)
            model = {kk: v for kk, v in model.items() if kk[0] % arg != 0}
        elif op == "merge_bump":
            keys = sorted({kk[0] for kk in model})[:arg]
            if not keys:
                continue
            upd = orders.where(
                F.col("o_orderkey").isin(keys)
            ).withColumn("o_totalprice", F.lit(9.5))
            commit_merge(spark, t, upd, "o_orderkey", max_rows=200)
            # merge collapses duplicates of a matched key to ONE row
            model = {kk: v for kk, v in model.items() if kk[0] not in keys}
            for k in keys:
                model[(k, 0)] = 9.5
        elif op == "compact":
            if current_version(t) == 0:
                continue
            commit_compact(spark, t)
        elif op == "tag":
            cur = current_version(t)
            if cur == 0 or cur in tagged.values():
                continue
            from iceberg_file_writer_spark.ingest.tags import create_tag

            name = f"t{len(tagged)}"
            create_tag(t, name)
            tagged[name] = cur
            continue
        else:  # expire
            cur = current_version(t)
            if cur == 0:
                continue
            expire_snapshots(t, keep_last=arg, data_grace_seconds=0)
            floor = max(1, cur - arg + 1)
            pinned = set(tagged.values())
            for hv in [v for v in history if v < floor and v not in pinned]:
                expired.add(hv)
                del history[hv]
            _check_history()  # retained (incl. tag-pinned) reproduce
            continue

        cur = current_version(t)
        if cur > 0:
            want = _want()
            assert _got() == want, (op, arg)
            history[cur] = want
    _check_history()


def test_empty_version_readable_after_ancestors_expire(spark, tmp_path):
    """An EMPTY retained snapshot must stay time-travelable after expiry
    removes its non-empty ancestors: the schema-source walk falls back to
    any retained non-empty manifest instead of FileNotFoundError (found
    by extending the model test with expire interleavings)."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_delete_where,
        read_table_version,
    )

    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].limit(50)
    commit_append(spark, orders, t, max_rows=200)  # v1 (non-empty)
    commit_delete_where(spark, t, "o_orderkey >= 0", max_rows=200)  # v2: empty
    commit_append(spark, orders.limit(5), t, max_rows=200)  # v3 (non-empty)
    expire_snapshots(t, keep_last=2, data_grace_seconds=0)  # drops v1
    empty = read_table_version(spark, t, 2)
    assert empty.count() == 0
    assert empty.columns == orders.columns
    assert read_table_version(spark, t, 3).count() == 5
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, t, 1).collect()


def test_streaming_sink_composes_with_expire(spark, tmp_path):
    """Exactly-once must survive retention: after expire_snapshots removes
    ancestor manifests, (a) the next micro-batch still commits (no walk
    into missing files) and (b) a replay of a PRE-expiry batch_id is
    still a no-op — the cumulative batch_ids ledger rides the newest
    manifest (ADVICE r5: snapshots.py streaming+retention combination)."""
    from iceberg_file_writer_spark.ingest.snapshots import streaming_append_sink

    t = str(tmp_path / "stream-exp")
    orders = load_tables(spark, SF_DIR)["orders"]
    sink = streaming_append_sink(t, max_rows=500)
    batches = [orders.where(f"o_orderkey % 4 = {i}") for i in range(4)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    expire_snapshots(t, keep_last=1)  # drops v1's manifest
    sink(batches[2], 2)  # must not FileNotFoundError on the expired chain
    v = current_version(t)
    sink(batches[0], 0)  # replay of an EXPIRED batch id: ledger says seen
    sink(batches[2], 2)  # replay of a live batch id
    assert current_version(t) == v
    total = sum(b.count() for b in batches[:3])
    assert read_table_version(spark, t).count() == total


def test_expire_never_drops_versions_at_or_above_entry_floor(spark, table):
    """A manifest committed at version cur+1 while expire runs (legal in
    the optimistic model: O_EXCL manifest exists, CURRENT not yet
    flipped) must survive the sweep, files included (ADVICE r5)."""
    import json

    t, orders = table  # v1, v2 committed; CURRENT = 2
    from iceberg_file_writer_spark.ingest.snapshots import (
        _snap_dir,
        commit_append,
    )

    v3 = commit_append(spark, orders.limit(7), t, max_rows=200)
    assert v3 == 3
    # rewind CURRENT to 2: writer of v3 hasn't flipped yet
    with open(os.path.join(_snap_dir(t), "CURRENT"), "w") as f:
        f.write("2")
    expire_snapshots(t, keep_last=1)  # floor = 2: only v1 may go
    assert not os.path.exists(_manifest_path(t, 1))
    assert os.path.exists(_manifest_path(t, 3))
    # v3's data files survived the sweep — the table reads at v3
    with open(os.path.join(_snap_dir(t), "CURRENT"), "w") as f:
        f.write("3")
    assert read_table_version(spark, t, 3).count() == orders.count() + 7


def test_data_file_staging_is_inside_table_dir(spark, tmp_path, monkeypatch):
    """Staging must share the table's filesystem so the commit rename can
    never hit EXDEV (ADVICE r5: mkdtemp in system /tmp)."""
    import tempfile as _tf

    import iceberg_file_writer_spark.ingest.snapshots as S

    seen = []
    real = _tf.mkdtemp

    def spy(*a, **k):
        seen.append(k.get("dir"))
        return real(*a, **k)

    monkeypatch.setattr(S.tempfile, "mkdtemp", spy)
    t = str(tmp_path / "tbl2")
    orders = load_tables(spark, SF_DIR)["orders"]
    commit_append(spark, orders.limit(10), t, max_rows=200)
    assert seen and all(d == t for d in seen)
    # and no staging debris remains inside the table dir
    assert not [n for n in os.listdir(t) if n.startswith(".snap-staging-")]


def test_ledger_survives_interleaved_commit_plus_expire(spark, tmp_path):
    """Every commit carries the batch_ids ledger forward, so a compaction
    topping the chain followed by expire cannot lose exactly-once state
    (code-review find r6: ledger stranded on an expired ancestor)."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_compact,
        streaming_append_sink,
    )

    t = str(tmp_path / "ledger-tbl")
    orders = load_tables(spark, SF_DIR)["orders"]
    sink = streaming_append_sink(t, max_rows=500)
    b0 = orders.where("o_orderkey % 2 = 0")
    b1 = orders.where("o_orderkey % 2 = 1")
    sink(b0, 0)
    sink(b1, 1)
    commit_compact(spark, t)  # non-streaming commit tops the chain
    expire_snapshots(t, keep_last=1)  # drops the ledger-bearing appends
    v = current_version(t)
    sink(b1, 1)  # replay of a batch whose manifest is expired
    sink(b0, 0)
    assert current_version(t) == v, "replayed batches must stay no-ops"
    assert read_table_version(spark, t).count() == orders.count()


def test_expire_grace_protects_in_flight_writer_files(spark, table):
    """A writer that renamed data files into data/ but hasn't committed
    its manifest yet must not lose them to a concurrent expire: the
    data-file sweep skips unreferenced files younger than the grace TTL
    (ADVICE r6: the sweep raced in-flight commits). Files PAST the grace
    window are genuine orphans and still go."""
    import time

    from iceberg_file_writer_spark.ingest.snapshots import _data_dir

    t, _ = table
    fresh = os.path.join(_data_dir(t), "in-flight-writer.parquet")
    orphan = os.path.join(_data_dir(t), "crashed-writer.parquet")
    for p in (fresh, orphan):
        with open(p, "wb") as f:
            f.write(b"x")
    old = time.time() - 100
    os.utime(orphan, (old, old))
    stats = expire_snapshots(t, keep_last=10, data_grace_seconds=50)
    assert os.path.exists(fresh), "pre-commit file inside grace must survive"
    assert not os.path.exists(orphan), "orphan past grace must be swept"
    assert stats["dropped_files"] == 1


def test_expire_sweeps_stale_staging_dirs(spark, table):
    """Crashed writers' .snap-staging-* debris is GC'd by expire once
    idle past the TTL; a fresh (possibly live) staging dir survives."""
    import time

    t, _ = table
    stale = os.path.join(t, ".snap-staging-stale")
    fresh = os.path.join(t, ".snap-staging-fresh")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 100
    os.utime(stale, (old, old))
    stats = expire_snapshots(t, keep_last=10, staging_ttl_seconds=50)
    assert stats["dropped_staging"] == 1
    assert not os.path.exists(stale) and os.path.exists(fresh)


def test_concurrent_appends_with_retry_all_land_exactly_once(spark, tmp_path):
    """Optimistic concurrency end-to-end: four threads race appends into
    one table, retrying on CommitConflict; every batch must land exactly
    once and the final version count must equal the number of commits."""
    import threading

    from iceberg_file_writer_spark.ingest.snapshots import commit_append

    t = str(tmp_path / "race-tbl")
    orders = load_tables(spark, SF_DIR)["orders"]
    batches = [orders.where(f"o_orderkey % 4 = {i}") for i in range(4)]
    errors: list = []

    def writer(i):
        try:
            for attempt in range(50):
                try:
                    commit_append(spark, batches[i], t, max_rows=500)
                    return
                except CommitConflict:
                    continue
            errors.append(f"writer {i} exhausted retries")
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(f"writer {i}: {e!r}")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert current_version(t) == 4
    got = read_table_version(spark, t)
    assert got.count() == orders.count()
    assert got.select("o_orderkey").distinct().count() == orders.count()


def test_empty_version_schema_as_of_prefers_closest_newer(spark, tmp_path):
    """ADVICE r7: time-traveling to an empty version whose non-empty
    ancestors were all expired must take its schema from the CLOSEST
    retained newer manifest, not the newest — columns added by later
    additive evolutions must not leak into the older empty snapshot."""
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"]
    base = orders.limit(20)
    assert commit_append(spark, base, t, max_rows=200) == 1
    assert commit_delete_where(spark, t, "o_orderkey >= 0", max_rows=200) == 2
    ev1 = base.withColumn("note", F.lit("a"))
    assert commit_append(spark, ev1, t, max_rows=200) == 3
    ev2 = base.withColumn("note", F.lit("b")).withColumn("note2", F.lit("c"))
    assert commit_append(spark, ev2, t, max_rows=200) == 4
    expire_snapshots(t, keep_last=3, data_grace_seconds=0)  # v1 gone

    df = read_table_version(spark, t, 2)
    assert df.count() == 0
    cols = set(df.columns)
    assert "note" in cols  # closest newer retained manifest (v3)
    assert "note2" not in cols  # v4's later evolution must not leak


def test_rollback_restores_exact_state_linearly(spark, table):
    """Rollback = a new commit with an old version's exact state: data
    AND deletion vectors; history stays linear and time travel to the
    rolled-past versions keeps working."""
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_rollback,
        current_version,
        read_manifest,
    )

    def _canon(df):
        return sorted(tuple(r) for r in df.collect())

    t, orders = table
    v1 = _canon(read_table_version(spark, t, 1))
    v2 = _canon(read_table_version(spark, t, 2))
    v3_ver = commit_delete_where_mor(spark, t, "o_orderstatus = 'F'")
    v3 = _canon(read_table_version(spark, t, v3_ver))
    assert len(v3) < len(v2)

    new_v = commit_rollback(t, 1)
    assert new_v == v3_ver + 1 and current_version(t) == new_v
    # restored state is exactly v1 — the MoR tombstones from v3 must
    # NOT leak into the restored file set
    assert _canon(read_table_version(spark, t)) == v1
    assert read_manifest(t, new_v).get("dvs") == []
    # history intact: every intermediate version still time-travels
    assert _canon(read_table_version(spark, t, 2)) == v2
    assert _canon(read_table_version(spark, t, v3_ver)) == v3

    import pytest as _pytest

    with _pytest.raises(ValueError):
        commit_rollback(t, new_v + 5)


def test_concurrent_appenders_all_commit(spark, tmp_path):
    """Optimistic concurrency under real contention: 6 threads append to
    one table, each retrying through CommitConflict — every batch lands
    exactly once, versions are a gapless chain, and the final state is
    the union of all batches."""
    import threading

    from iceberg_file_writer_spark.ingest.snapshots import (
        CommitConflict,
        commit_append,
        current_version,
        read_manifest,
        read_table_version,
    )

    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    commit_append(spark, orders.where("o_orderkey % 7 = 6"), t)
    errors = []

    def appender(r: int) -> None:
        batch = orders.where(f"o_orderkey % 7 = {r}")
        for _ in range(40):
            try:
                commit_append(spark, batch, t)
                return
            except CommitConflict:
                continue
        errors.append(r)

    threads = [threading.Thread(target=appender, args=(r,)) for r in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, f"writers starved: {errors}"
    assert current_version(t) == 7  # base + 6, no lost or double commits
    # gapless parent chain
    for v in range(2, 8):
        assert read_manifest(t, v)["parent"] == v - 1
    got = sorted(tuple(r) for r in read_table_version(spark, t).collect())
    want = sorted(tuple(r) for r in orders.collect())
    assert got == want


def test_read_manifest_copies_are_mutation_safe(spark, tmp_path):
    """read_manifest hands out copies whose NESTED metadata (per-entry
    stats, dvs/eqs/bloom lists) is private too (ADVICE r9): in-place
    mutation on one returned dict must never leak into the next read."""
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        current_version,
        read_manifest,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], "k long, v double")
    commit_append(spark, df, t)
    commit_delete_where_mor(spark, t, "k = 3")
    v = current_version(t)
    m1 = read_manifest(t, v)
    assert m1.get("dvs")
    m1["dvs"].append("bogus-entry")
    if isinstance(m1["files"][0].get("stats"), dict):
        m1["files"][0]["stats"]["poison"] = True
    m2 = read_manifest(t, v)
    assert "bogus-entry" not in m2["dvs"]
    assert "poison" not in (m2["files"][0].get("stats") or {})


def test_read_plan_memo_and_version_isolation(spark, tmp_path):
    """Reader creation over an explicit path list costs ~1.75 ms/path of
    driver-side glob checks (minutes at 10^5 files), so the resolved
    plan memoizes per snapshot content — and a NEW version (different
    file set) must miss to a fresh plan, never reuse the old one."""
    from iceberg_file_writer_spark.ingest import snapshots as S

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "k long, v double")
    S.commit_append(spark, df, t, max_rows=10)
    a1 = S.read_table_version(spark, t)
    a2 = S.read_table_version(spark, t)
    assert a1 is a2  # same snapshot -> the memoized plan object
    S.commit_append(spark, df.where("k < 5"), t, max_rows=10)
    b = S.read_table_version(spark, t)
    assert b is not a1
    assert b.count() == 55 and a1.count() == 50  # old plan still reads v1


def test_standing_schema_newest_seq_after_evolution(spark, tmp_path):
    """_standing_schema reads ONE newest-seq footer; after an additive
    evolution the newest write carries the superset, and pre-evolution
    files surface NULL for the added column under the explicit schema."""
    from pyspark.sql import functions as F

    from iceberg_file_writer_spark.ingest import snapshots as S

    t = str(tmp_path / "tbl")
    S.commit_append(
        spark, spark.createDataFrame([(1, 1.0)], "k long, v double"), t
    )
    S.commit_append(
        spark,
        spark.createDataFrame([(2, 2.0, "x")], "k long, v double, tag string"),
        t,
    )
    m = S.read_manifest(t, S.current_version(t))
    sch = S._standing_schema(spark, t, m["files"])
    assert [f.name for f in sch.fields] == ["k", "v", "tag"]
    got = {r.k: r.tag for r in S.read_table_version(spark, t).collect()}
    assert got == {1: None, 2: "x"}


def test_feed_dv_on_already_eq_dead_row_is_silent(spark, tmp_path):
    """A positional tombstone landing on a row ALREADY dead via an
    equality delete must not fabricate a feed flip (the row was
    invisible at A and stays invisible at B). This repo's own writers
    never produce the shape (delete_where_mor scans MoR-applied), so
    the DV is hand-committed — a foreign-written table could do this."""
    import os as _os
    import uuid as _uuid

    from iceberg_file_writer_spark.ingest.equality_deletes import (
        commit_delete_keys,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        _commit,
        changes_between,
        current_version,
        read_manifest,
    )

    t = str(tmp_path / "t")
    commit_append(
        spark,
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long"),
        t,
        max_rows=10,
    )
    commit_delete_keys(spark, t, spark.createDataFrame([(2,)], "k long"))
    v_eq = current_version(t)

    # hand-commit a DV naming the eq-dead row's physical position
    m = read_manifest(t, v_eq)
    fname = _os.path.basename(m["files"][0]["path"])
    dv_rel = f"dv/dv-{_uuid.uuid4().hex}"
    spark.createDataFrame(
        [(fname, 1)], "file_name string, row_index long"  # row k=2 is index 1
    ).coalesce(1).write.mode("overwrite").parquet(_os.path.join(t, dv_rel))
    v_dv = _commit(
        t, v_eq, "delete_mor", m["files"], extra={"dvs": [dv_rel]}
    )

    feed = changes_between(spark, t, v_eq, v_dv)
    assert feed.count() == 0  # no spurious +/- for the doubly-dead row

    # and a combined span still reports exactly the eq delete once
    got = sorted(tuple(r) for r in changes_between(spark, t, 1, v_dv).collect())
    assert got == [("-", 2, 20)]

    # the sharper shape: ONE span carrying BOTH a new eq delete (key 1)
    # and the hand DV above — the dv-kept candidate's key (2) is OUTSIDE
    # the span's eq-delta keys, so its visibility must still see the
    # FULL standing eq state (a delta-restricted broadcast would compute
    # vis_a=true and fabricate a '-')
    commit_delete_keys(spark, t, spark.createDataFrame([(1,)], "k long"))
    v_end = current_version(t)
    got = sorted(
        tuple(r) for r in changes_between(spark, t, v_eq, v_end).collect()
    )
    assert got == [("-", 1, 10)]  # only the new eq delete; k=2 silent


def test_changes_typed_classification_and_guards(spark, tmp_path):
    """Typed feed: update pre/post pairing (null-safe on NULL keys),
    insert/delete classification, and the row-unique-key guard."""
    from iceberg_file_writer_spark.ingest.equality_deletes import commit_upsert
    from iceberg_file_writer_spark.ingest.snapshots import (
        changes_typed,
        current_version,
    )

    t = str(tmp_path / "t")
    commit_append(
        spark,
        spark.createDataFrame(
            [(1, 10), (2, 20), (None, 5)], "k long, v long"
        ),
        t,
        max_rows=10,
    )
    # CoW update rewrites the NULL-keyed row too (predicate on v)
    from iceberg_file_writer_spark.ingest.snapshots import commit_update_where

    commit_update_where(spark, t, "v = 5", {"v": "v + 1"})
    commit_upsert(
        spark,
        t,
        spark.createDataFrame([(2, 99), (7, 70)], "k long, v long"),
        ["k"],
        max_rows=10,
    )
    commit_delete_where(spark, t, "k = 1")
    typed = {
        (r._change_type, r.k, r.v)
        for r in changes_typed(
            spark, t, 1, current_version(t), ["k"]
        ).collect()
    }
    assert typed == {
        ("update_preimage", None, 5),
        ("update_postimage", None, 6),
        ("update_preimage", 2, 20),
        ("update_postimage", 2, 99),
        ("insert", 7, 70),
        ("delete", 1, 10),
    }

    # duplicate key on one side of the span: refused loudly
    commit_append(
        spark,
        spark.createDataFrame([(8, 1), (8, 2)], "k long, v long"),
        t,
        max_rows=10,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not unique"):
        changes_typed(spark, t, 1, current_version(t), ["k"]).collect()


def test_changes_typed_on_mapped_table(spark, tmp_path):
    """Typed feed routes through the field-id path: a rename between
    the span's endpoints still pairs updates by key."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        create_mapped_table,
        evolve_mapped,
        upsert_mapped,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        changes_typed,
        current_version,
    )

    t = str(tmp_path / "m")
    create_mapped_table(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
        t,
        max_rows=10,
    )
    evolve_mapped(t, renames={"v": "val"})
    upsert_mapped(
        spark,
        spark.createDataFrame([(2, 99)], "id long, val long"),
        t,
        ["id"],
        max_rows=10,
    )
    typed = {
        (r._change_type, r.id, r.val)
        for r in changes_typed(
            spark, t, 1, current_version(t), ["id"]
        ).collect()
    }
    assert typed == {
        ("update_preimage", 2, 20),
        ("update_postimage", 2, 99),
    }


def test_changes_typed_is_single_pass(spark, tmp_path):
    """r12 plan gate (VERDICT r11 What's wrong #3), tightened by the r13
    optimization: the typed feed is ONE keyed aggregate over the change
    feed, MATERIALIZED ONCE — the eager uniqueness guard and the returned
    plan share a cached relation, so the feed derivation and the key
    shuffle run a single time per call (the guard used to re-execute the
    whole aggregate). Above the cached aggregate the returned plan is
    pure row algebra: no pairing join, no union-of-four rescans, no
    further aggregation."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        changes_typed,
        current_version,
    )

    t = str(tmp_path / "t")
    commit_append(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        t,
        max_rows=10,
    )
    commit_delete_where(spark, t, "k = 1")
    df = changes_typed(spark, t, 1, current_version(t), ["k"])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # The single-pass contract, stated mechanism-tolerantly (r14, ADVICE):
    # the guard and the returned plan must SHARE one materialization of
    # the keyed aggregate. Today that reuse is a cache pin
    # (InMemoryRelation); any future mechanism (localCheckpoint, a
    # guard-side-only materialization) is acceptable as long as the
    # returned plan does not re-derive the feed — i.e. the head of the
    # plan (above whatever reuse node appears, or the whole plan if the
    # feed were inlined) stays join-free, union-free and aggregation-free
    # EXCEPT the one keyed aggregate itself.
    for reuse_node in ("InMemoryRelation", "LogicalRDD", "Checkpoint"):
        if reuse_node in plan:
            head = plan.split(reuse_node)[0]
            break
    else:
        raise AssertionError(
            "typed feed no longer shares one materialized aggregate "
            "between the uniqueness guard and the returned plan "
            "(no reuse node in the optimized plan)"
        )
    # everything ABOVE the shared aggregate is join-free, union-free and
    # aggregation-free — the typed rows explode straight out of it
    assert "Join" not in head, "typed feed reintroduced a pairing join"
    assert "Union" not in head, "typed feed reintroduced union rescans"
    assert "Aggregate" not in head, "typed feed re-aggregates the feed"


def test_changes_typed_pin_registry_is_bounded(spark, tmp_path):
    """r14 cache hygiene (VERDICT r13 What's-wrong #4): each distinct
    (table, span) typed-feed call pins its keyed aggregate, and the pins
    ride a bounded LRU registry — polling many spans in one long-lived
    session must never accumulate more than the bound, and the explicit
    release hook drops them all."""
    from iceberg_file_writer_spark import cache_util
    from iceberg_file_writer_spark.cache_util import release_pins
    from iceberg_file_writer_spark.ingest.snapshots import (
        changes_typed,
        current_version,
    )

    release_pins()  # isolate from other tests' pins
    t = str(tmp_path / "t")
    n_spans = cache_util._PINNED_MAX + 3
    commit_append(
        spark,
        spark.createDataFrame([(0, 0)], "k long, v long"),
        t,
        max_rows=10,
    )
    for i in range(1, n_spans + 1):
        commit_append(
            spark,
            spark.createDataFrame([(i, i * 10)], "k long, v long"),
            t,
            max_rows=10,
        )
    cur = current_version(t)
    for i in range(1, n_spans + 1):
        # n_spans distinct spans, each a distinct pinned plan
        changes_typed(spark, t, i, cur, ["k"]).collect()
    assert len(cache_util._PINNED) <= cache_util._PINNED_MAX
    # every registry entry is genuinely cached; release drops them all
    release_pins()
    assert len(cache_util._PINNED) == 0
