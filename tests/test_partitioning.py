"""Hidden partitioning: raw-column predicates prune through transform
specs (time via tight raw stats, point lookups via bucket ids); hidden
columns never surface; spec evolution stays conservative."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.partitioning import (
    bucket_of,
    commit_append_partitioned,
    scan_partitioned,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    read_table_version,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"
SPEC = [("bucket", 8, "user_id"), ("day", "ts")]  # spec order = clustering significance


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "events")
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    commit_append_partitioned(spark, ev, t, SPEC, max_rows=40)
    return t, ev


def test_bucket_expr_matches_python_twin(spark):
    ev = load_tables(spark, SF_DIR)["events"].select("user_id").distinct().limit(50)
    from iceberg_file_writer_spark.ingest.partitioning import _bucket_expr

    rows = ev.select("user_id", _bucket_expr("user_id", 8).alias("b")).collect()
    for r in rows:
        assert r.b == bucket_of(r.user_id, 8), r.user_id


def test_hidden_columns_never_surface(spark, table):
    t, ev = table
    got = scan_partitioned(spark, t, [])
    assert sorted(got.columns) == sorted(ev.columns)
    assert _canon(got) == _canon(ev)


def test_time_range_prunes_via_raw_stats(spark, table):
    t, ev = table
    cut = "2024-01-20 00:00:00"  # corpus spans Jan 1-30
    got = scan_partitioned(spark, t, [("ts", ">=", cut)])
    kept, total = scan_partitioned.last_files
    assert kept < total  # day clustering made raw ts stats tight
    want = ev.where(f"ts >= '{cut}'")
    assert _canon(got) == _canon(want) and got.count() > 0


def test_point_lookup_prunes_via_bucket(spark, table):
    t, ev = table
    uid = int(ev.agg(F.min("user_id")).first()[0])
    got = scan_partitioned(spark, t, [("user_id", "=", uid)])
    kept, total = scan_partitioned.last_files
    assert kept < total  # bucket id pruned files range stats cannot
    want = ev.where(F.col("user_id") == uid)
    assert _canon(got) == _canon(want) and got.count() > 0


def test_spec_evolution_is_conservative(spark, table):
    """Files appended WITHOUT the spec (legacy layout, no hidden bucket
    column) must always survive bucket pruning and read correctly."""
    t, ev = table
    legacy = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    commit_append(spark, legacy, t, max_rows=500)
    uid = int(ev.agg(F.min("user_id")).first()[0])
    got = scan_partitioned(spark, t, [("user_id", "=", uid)])
    want = ev.unionByName(legacy).where(F.col("user_id") == uid)
    assert _canon(got) == _canon(want)
    kept, total = scan_partitioned.last_files
    assert kept < total  # spec'd files still prune; legacy ones all kept


def test_partitioned_scan_applies_deletion_vectors(spark, tmp_path):
    """Pruned hidden-partition reads must anti-join MoR tombstones."""
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )
    from iceberg_file_writer_spark.ingest.snapshots import read_table_version

    t = str(tmp_path / "tbl")
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    commit_append_partitioned(
        spark, ev, t, [("bucket", 8, "user_id")], max_rows=40
    )
    uid = ev.agg(F.min("user_id")).first()[0]
    commit_delete_where_mor(spark, t, f"user_id = {uid} AND event_id % 2 = 0")
    got = scan_partitioned(spark, t, [("user_id", "=", int(uid))])
    kept, total = scan_partitioned.last_files
    assert kept < total  # bucket pruning fired
    want = ev.where(f"user_id = {uid} AND event_id % 2 <> 0")
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_bucket_respec_loses_no_rows(spark, tmp_path):
    """Re-bucketing the SAME column with a different count must not let
    old files' stale bucket stats prune away matching rows."""
    t = str(tmp_path / "tbl")
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    old = ev.where("event_id % 2 = 0")
    new = ev.where("event_id % 2 = 1")
    commit_append_partitioned(
        spark, old, t, [("bucket", 4, "user_id")], max_rows=40
    )
    commit_append_partitioned(
        spark, new, t, [("bucket", 8, "user_id")], max_rows=40
    )
    for uid in [r[0] for r in ev.select("user_id").distinct().limit(5).collect()]:
        got = scan_partitioned(spark, t, [("user_id", "=", int(uid))])
        want = ev.where(f"user_id = {uid}")
        assert sorted(tuple(r) for r in got.collect()) == sorted(
            tuple(r) for r in want.collect()
        ), f"user {uid} lost rows across the spec change"
    # hidden columns of BOTH epochs stay hidden
    assert not [c for c in got.columns if c.startswith("_b")]


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    """Z-order clustering's signature: range predicates on EITHER
    z-ordered column prune files, where a plain sort order serves only
    its leading column — and values are identical to the plain read."""
    from iceberg_file_writer_spark.ingest.snapshots import read_table_version

    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tz = str(tmp_path / "ztbl")
    commit_append_partitioned(
        spark, orders, tz, [("zorder", ["o_orderkey", "o_custkey"])],
        max_rows=150,
    )
    ts = str(tmp_path / "stbl")  # control: plain sort by o_orderkey
    from iceberg_file_writer_spark.ingest.snapshots import commit_append

    commit_append(
        spark,
        orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        ts,
        max_rows=150,
    )
    hi_c = orders.selectExpr("percentile(o_custkey, 0.2)").first()[0]

    # dim 1 (leading for both layouts): both prune
    conj_k = [("o_orderkey", "<=", int(orders.agg(F.min("o_orderkey")).first()[0]) + 10)]
    scan_partitioned(spark, tz, conj_k)
    zk, ztot = scan_partitioned.last_files
    assert zk < ztot

    # dim 2: z-order prunes, the plain sort CANNOT
    from iceberg_file_writer_spark.ingest.file_skipping import scan_table

    conj_c = [("o_custkey", "<=", int(hi_c) // 4)]
    got = scan_partitioned(spark, tz, conj_c)
    zk2, ztot2 = scan_partitioned.last_files
    scan_table(spark, ts, conj_c)
    sk2, stot2 = scan_table.last_files
    assert zk2 < ztot2, "z-order failed to prune on the second dimension"
    # the plain sort's dim-2 stats are near-useless (incidental
    # correlation may drop the odd file); z-order must do clearly better
    assert zk2 / ztot2 < 0.75 * (sk2 / stot2), (
        f"z-order {zk2}/{ztot2} not clearly better than sort {sk2}/{stot2}"
    )

    # values: layout is invisible
    want = read_table_version(spark, ts).where(
        conj_c[0][0] + " <= " + str(conj_c[0][2])
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_zorder_box_query_prunes_hard(spark, tmp_path):
    """A 2-dim box predicate over a z-ordered table reads a small file
    fraction (the multiplicative win single-column layouts cannot give)."""
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tz = str(tmp_path / "ztbl")
    commit_append_partitioned(
        spark, orders, tz, [("zorder", ["o_orderkey", "o_custkey"])],
        max_rows=150,
    )
    k_med = int(orders.selectExpr("percentile(o_orderkey, 0.5)").first()[0])
    c_med = int(orders.selectExpr("percentile(o_custkey, 0.5)").first()[0])
    got = scan_partitioned(
        spark,
        tz,
        [
            ("o_orderkey", "<=", k_med),
            ("o_custkey", "<=", c_med),
        ],
    )
    kept, total = scan_partitioned.last_files
    assert total >= 8
    assert kept <= total * 0.6, f"box query kept {kept}/{total}"
    want = orders.where(f"o_orderkey <= {k_med} AND o_custkey <= {c_med}")
    assert got.count() == want.count()


def test_plain_append_keeps_standing_spec(spark, tmp_path):
    """A plain commit_append (and the streaming sink, and compaction)
    to a spec'd table clusters by the standing spec: new files carry
    hidden bucket stats, so pruning keeps working over the whole
    history instead of decaying to conservative full reads."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_compact,
        current_version,
        read_manifest,
        streaming_append_sink,
    )

    t = str(tmp_path / "tbl")
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    commit_append_partitioned(
        spark, ev.where("event_id % 3 = 0"), t,
        [("bucket", 8, "user_id")], max_rows=40,
    )
    commit_append(spark, ev.where("event_id % 3 = 1"), t, max_rows=40)
    streaming_append_sink(t, max_rows=40)(ev.where("event_id % 3 = 2"), 0)
    m = read_manifest(t, current_version(t))
    for e in m["files"]:
        assert any(k.startswith("_b8_") for k in e.get("stats", {})), (
            "a plain-verb write lost the spec's hidden bucket column"
        )
    uid = ev.agg(F.min("user_id")).first()[0]
    got = scan_partitioned(spark, t, [("user_id", "=", int(uid))])
    kept, total = scan_partitioned.last_files
    assert kept < total
    want = ev.where(f"user_id = {uid}")
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )
    # compaction re-clusters and keeps pruning + values
    commit_compact(spark, t, target_rows=60)
    got = scan_partitioned(spark, t, [("user_id", "=", int(uid))])
    kept2, total2 = scan_partitioned.last_files
    assert kept2 < total2
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_commit_respec_metadata_only_evolution(spark, tmp_path):
    """SET PARTITION SPEC: a metadata-only commit changes how FUTURE
    writes cluster; standing files are untouched and prune
    conservatively; compaction repairs the whole table onto the new
    layout."""
    from iceberg_file_writer_spark.ingest.inspect import clustering_report
    from iceberg_file_writer_spark.ingest.partitioning import (
        commit_respec,
        scan_partitioned,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_compact,
        read_manifest,
        read_table_version,
    )
    from iceberg_file_writer_spark.tables import load_tables

    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = str(tmp_path / "tbl")
    commit_append(spark, orders.where("o_orderkey % 2 = 0"), t)
    mt0 = {
        e["path"]: e for e in read_manifest(t, 1)["files"]
    }
    v = commit_respec(t, [("bucket", 4, "o_custkey")])
    m = read_manifest(t, v)
    assert m["op"] == "respec" and m["spec"] == [["bucket", 4, "o_custkey"]]
    # metadata-only: same files, byte-identical entries
    assert {e["path"]: e for e in m["files"]} == mt0
    with pytest.raises(ValueError, match="unknown transform"):
        commit_respec(t, [("fortnight", "ts")])
    # future writes cluster by the new spec (hidden col stats appear)
    commit_append(spark, orders.where("o_orderkey % 2 = 1"), t)
    new_files = [
        e for e in read_manifest(t, v + 1)["files"] if e["path"] not in mt0
    ]
    assert new_files and all(
        "_b4_o_custkey" in (e.get("stats") or {}) for e in new_files
    )
    # reads stay exact; point lookups prune only where layout allows
    key = orders.agg(F.min("o_custkey")).first()[0]
    got = scan_partitioned(spark, t, [("o_custkey", "=", int(key))])
    want = orders.where(F.col("o_custkey") == key)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # compaction re-clusters everything onto the new spec
    commit_compact(spark, t)
    assert clustering_report(t)["clustered_permille"] == 1000
    assert read_table_version(spark, t).count() == orders.count()


def test_merge_keeps_standing_spec_and_values(spark, tmp_path):
    """Round-9 advice (medium): commit_merge on a bucket-spec'd table
    raised UNRESOLVED_COLUMN `_b4_k` — the affected-file read surfaces
    hidden layout columns that ``updates`` cannot provide. Merge now
    unions on the visible schema and re-applies the standing spec, so
    the rewrite keeps the layout (hidden bucket stats on new files)."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_merge,
        current_version,
        read_manifest,
    )

    t = str(tmp_path / "tbl")
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    commit_append_partitioned(
        spark, ev, t, [("bucket", 4, "user_id")], max_rows=40
    )
    upd_keys = ev.select("event_id").distinct().limit(15)
    updates = ev.join(upd_keys, "event_id", "left_semi").withColumn(
        "value", F.lit(-1.0)
    )
    v = commit_merge(spark, t, updates, "event_id", max_rows=40)
    got = scan_partitioned(spark, t, [])
    want = ev.join(upd_keys, "event_id", "left_anti").unionByName(updates)
    assert sorted(got.columns) == sorted(ev.columns)  # hidden cols gone
    assert _canon(got) == _canon(want)
    # every rewritten file carries the spec's hidden bucket stats
    m = read_manifest(t, v)
    rewritten = [e for e in m["files"] if e.get("seq") == v]
    assert rewritten, "merge rewrote nothing"
    for e in rewritten:
        assert any(k.startswith("_b4_") for k in e.get("stats", {})), (
            "merge rewrite lost the standing spec's hidden layout"
        )
    # pruning still fires across carried + rewritten files
    uid = int(ev.agg(F.min("user_id")).first()[0])
    pr = scan_partitioned(spark, t, [("user_id", "=", uid)])
    kept, total = scan_partitioned.last_files
    assert kept < total
    assert _canon(pr) == _canon(want.where(F.col("user_id") == uid))


def test_in_list_prunes_via_bucket(spark, table):
    """IN on a bucketed column prunes to the members' bucket ids and
    stays row-identical."""
    t, ev = table
    uids = [int(r.user_id) for r in
            ev.select("user_id").distinct().orderBy("user_id").limit(2).collect()]
    got = scan_partitioned(spark, t, [("user_id", "in", uids + [None])])
    kept, total = scan_partitioned.last_files
    assert kept < total
    want = ev.where(F.col("user_id").isin(uids))
    assert _canon(got) == _canon(want) and got.count() > 0


def test_hour_transform_prunes_sub_day_ranges(spark, tmp_path):
    """hour(ts) clustering keeps raw ts stats tight enough that a
    few-hour range predicate prunes where day clustering cannot."""
    t = str(tmp_path / "ev_hour")
    ev = load_tables(spark, SF_DIR)["events"].select("event_id", "ts", "value")
    commit_append_partitioned(spark, ev, t, [("hour", "ts")], max_rows=40)
    got = scan_partitioned(
        spark,
        t,
        [("ts", ">=", "2024-01-05 06:00:00"), ("ts", "<", "2024-01-05 09:00:00")],
    )
    kept, total = scan_partitioned.last_files
    assert kept < total
    want = ev.where(
        (F.col("ts") >= "2024-01-05 06:00:00") & (F.col("ts") < "2024-01-05 09:00:00")
    )
    assert _canon(got) == _canon(want)


def test_year_transform_applies(spark, tmp_path):
    t = str(tmp_path / "ev_year")
    ev = load_tables(spark, SF_DIR)["events"].select("event_id", "ts")
    commit_append_partitioned(spark, ev, t, [("year", "ts")], max_rows=200)
    got = scan_partitioned(spark, t, [])
    assert _canon(got) == _canon(ev)


def test_truncate_transform_prunes_string_prefix_and_numeric(spark, tmp_path):
    """truncate is order-preserving: string-prefix clustering tightens
    the raw string stats (prefix predicates prune), numeric flooring
    tightens numeric stats (range predicates prune); rows identical."""
    t = str(tmp_path / "cust_trunc")
    cust = load_tables(spark, SF_DIR)["customer"].select(
        "c_custkey", "c_name", "c_acctbal"
    )
    commit_append_partitioned(
        spark, cust, t, [("truncate", 12, "c_name")], max_rows=15
    )
    got = scan_partitioned(spark, t, [("c_name", ">=", "Customer#0000009")])
    kept, total = scan_partitioned.last_files
    assert kept < total
    want = cust.where(F.col("c_name") >= "Customer#0000009")
    assert _canon(got) == _canon(want)

    t2 = str(tmp_path / "ev_trunc")
    ev = load_tables(spark, SF_DIR)["events"].select("event_id", "user_id")
    commit_append_partitioned(
        spark, ev, t2, [("truncate", 100, "user_id")], max_rows=50
    )
    got = scan_partitioned(spark, t2, [("user_id", ">=", 400)])
    kept, total = scan_partitioned.last_files
    assert kept < total
    assert _canon(got) == _canon(ev.where(F.col("user_id") >= 400))


def test_hidden_columns_never_leak_from_any_read_surface(spark, tmp_path):
    """Regression (r12, property-found): a respec'd table leaked its
    hidden bucket column through read_table_version, and the CDC feed
    emitted PHANTOM +/- pairs across a post-respec compaction (pre-spec
    rows keyed (…, NULL) vs re-clustered rows (…, bucket)). Hidden
    layout columns are write-side artifacts — every read surface drops
    them centrally in _read_files."""
    from iceberg_file_writer_spark.ingest.partitioning import commit_respec
    from iceberg_file_writer_spark.ingest.snapshots import (
        changes_between,
        commit_append,
        commit_compact,
        read_table_version,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(0, 0), (1, 10)], "k long, v long")
    commit_append(spark, df, t)
    commit_respec(t, [["bucket", 4, "k"]])
    commit_append(spark, df, t)
    assert read_table_version(spark, t).columns == ["k", "v"]
    assert changes_between(spark, t, 2, 3).columns == ["change", "k", "v"]
    commit_compact(spark, t)
    # a pure re-layout nets to ZERO changes — no phantom pairs
    assert changes_between(spark, t, 3, 4).count() == 0
