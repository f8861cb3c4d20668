"""Metadata inspection tables: snapshots/files/history/partitions/refs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.branching import create_branch
from iceberg_file_writer_spark.ingest.inspect import (
    _file_partition,
    inspect_table,
)
from iceberg_file_writer_spark.ingest.partitioning import (
    commit_append_partitioned,
)
from iceberg_file_writer_spark.ingest.snapshots import commit_append
from iceberg_file_writer_spark.ingest.tags import create_tag
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )


def test_snapshots_history_refs(spark, tmp_path, orders):
    t = str(tmp_path / "tbl")
    commit_append(spark, orders.where("o_orderkey % 2 = 0"), t)
    commit_append(spark, orders.where("o_orderkey % 2 = 1"), t)
    snaps = {r["version"]: r for r in inspect_table(spark, t, "snapshots").collect()}
    assert snaps[1]["op"] == snaps[2]["op"] == "append"
    assert snaps[2]["parent"] == 1
    assert snaps[2]["n_rows"] == orders.count()
    hist = {r["version"]: r for r in inspect_table(spark, t, "history").collect()}
    assert not hist[1]["is_current"] and hist[2]["is_current"]
    create_branch(t, "audit")
    create_tag(t, "freeze", version=1)
    refs = {r["name"]: r for r in inspect_table(spark, t, "refs").collect()}
    assert refs["main"]["version"] == 2
    assert refs["audit"]["type"] == "branch"
    assert (refs["freeze"]["type"], refs["freeze"]["version"]) == ("tag", 1)
    with pytest.raises(ValueError, match="unknown metadata table"):
        inspect_table(spark, t, "nope")


def test_files_view_metadata_only(spark, tmp_path, orders):
    t = str(tmp_path / "tbl")
    commit_append(spark, orders, t, max_rows=500)
    files = inspect_table(spark, t, "files").collect()
    assert len(files) >= 2  # max_rows forced a split
    assert sum(r["rows"] for r in files) == orders.count()
    assert all(r["path"].startswith("data/") for r in files)
    # stats ride along as JSON: every file carries o_orderkey bounds
    st = json.loads(files[0]["stats_json"])
    assert st["o_orderkey"][0] <= st["o_orderkey"][1]


def test_partitions_view_recovers_spec_values(spark, tmp_path, orders):
    """Per-partition counts recovered from file stats alone, for a
    bucket spec (hidden column constant per file)."""
    t = str(tmp_path / "tbl")
    commit_append_partitioned(
        spark, orders, t, spec=[("bucket", 4, "o_custkey")]
    )
    parts = inspect_table(spark, t, "partitions").collect()
    names = {r["partition"] for r in parts}
    assert names <= {f"bucket[4](o_custkey)={b}" for b in range(4)}
    assert sum(r["n_rows"] for r in parts) == orders.count()
    # cross-check one bucket's rows against the data itself
    from iceberg_file_writer_spark.ingest.partitioning import _bucket_expr

    want = (
        orders.withColumn("_b", _bucket_expr("o_custkey", 4))
        .groupBy("_b")
        .count()
        .collect()
    )
    want = {f"bucket[4](o_custkey)={r['_b']}": r["count"] for r in want}
    got = {r["partition"]: r["n_rows"] for r in parts}
    assert got == want


def test_partitions_unspecced_and_straddlers():
    """No spec -> single '' partition; a file whose stats straddle a
    transform boundary surfaces as partition None, never a wrong value."""
    day = [("day", "ts")]
    assert _file_partition({"stats": {}}, []) == ""
    assert (
        _file_partition(
            {"stats": {"ts": ["2024-01-01 02:00:00", "2024-01-01 23:00:00", 0]}},
            day,
        )
        == "day(ts)=2024-01-01"
    )
    straddler = {"stats": {"ts": ["2024-01-01 23:00:00", "2024-01-02 01:00:00", 0]}}
    assert _file_partition(straddler, day) is None
    assert _file_partition({"stats": {}}, day) is None  # stats missing
    # z-order is clustering, not partitioning: contributes nothing
    assert _file_partition({"stats": {}}, [("zorder", ["a", "b"])]) == ""


def test_partitions_day_spec_end_to_end(spark, tmp_path):
    """Day transform over the events table: per-day metadata counts match
    a data-side GROUP BY, modulo boundary straddlers (counted under
    None, bounded by the file count at range boundaries)."""
    ev = load_tables(spark, SF_DIR)["events"].select("event_id", "ts", "user_id")
    t = str(tmp_path / "tbl")
    commit_append_partitioned(spark, ev, t, spec=[("day", "ts")])
    parts = {r["partition"]: r["n_rows"] for r in
             inspect_table(spark, t, "partitions").collect()}
    want = {
        f"day(ts)={r['d']}": r["count"]
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .count()
        .collect()
    }
    assert sum(parts.values()) == ev.count()
    # every recovered day's count never exceeds the data-side truth, and
    # days with no straddling file match exactly
    exact = 0
    for k, n in parts.items():
        if k is None:
            continue
        assert n <= want[k]
        exact += n == want[k]
    assert exact >= max(1, len(want) - 8)  # straddlers are the exception


def test_clustering_report_decay_and_repair(spark, tmp_path, orders):
    """The report sees layout decay (a writer missing the spec column
    appends unclustered files) and compaction repairing it."""
    from iceberg_file_writer_spark.ingest.equality_deletes import commit_upsert
    from iceberg_file_writer_spark.ingest.inspect import clustering_report
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_compact,
    )

    t = str(tmp_path / "tbl")
    commit_append_partitioned(
        spark, orders, t, spec=[("bucket", 4, "o_custkey")]
    )
    r1 = clustering_report(t)
    assert r1["clustered_permille"] == 1000 and r1["n_files"] >= 4
    # a writer without the spec's source column: conservative, unclustered
    commit_append(spark, orders.limit(50).drop("o_custkey"), t)
    # and some MoR churn
    commit_upsert(
        spark, t, orders.limit(9).withColumn("o_totalprice", F.lit(0.0)),
        ["o_orderkey"],
    )
    r2 = clustering_report(t)
    assert r2["straddler_files"] >= 1
    assert r2["clustered_permille"] < 1000
    assert r2["n_eq_files"] == 1 and r2["eq_key_rows"] == 9
    commit_compact(spark, t)
    r3 = clustering_report(t)
    assert r3["clustered_permille"] == 1000  # spec re-applied
    assert r3["n_eq_files"] == 0 and r3["n_dv_files"] == 0


def test_inspect_stats_kind(spark, tmp_path):
    from iceberg_file_writer_spark.ingest.inspect import inspect_table
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_analyze,
        commit_append,
    )
    from iceberg_file_writer_spark.tables import load_tables

    t = str(tmp_path / "ord")
    orders = load_tables(spark, "/root/testdata/sf0.001")["orders"].select(
        "o_orderkey", "o_custkey"
    )
    commit_append(spark, orders, t)
    commit_analyze(spark, t, ["o_custkey"])
    got = inspect_table(spark, t, "stats").collect()
    assert len(got) == 1
    r = got[0]
    assert r.column == "o_custkey"
    assert r.ndv == orders.select("o_custkey").distinct().count()
    assert r.n_rows == orders.count()


def test_partitions_year_hour_truncate_labels():
    """Regression (r12 ADVICE, low): year/hour/truncate — accepted by
    commit_respec / SET PARTITION SPEC / PARTITIONED BY — used to fall
    into the clustering-only branch, so the partitions view and
    clustering_report silently omitted them from labels and straddler
    counts. They now label exactly like day/month."""
    ts = lambda lo, hi: {"stats": {"ts": [lo, hi, 0]}}
    assert (
        _file_partition(ts("2024-03-01 02:00:00", "2024-11-30 23:00:00"),
                        [("year", "ts")])
        == "year(ts)=2024"
    )
    assert _file_partition(
        ts("2024-12-31 23:00:00", "2025-01-01 01:00:00"), [("year", "ts")]
    ) is None
    assert (
        _file_partition(ts("2024-01-01 02:00:00", "2024-01-01 02:59:59"),
                        [("hour", "ts")])
        == "hour(ts)=2024-01-01 02"
    )
    assert _file_partition(
        ts("2024-01-01 02:59:00", "2024-01-01 03:01:00"), [("hour", "ts")]
    ) is None
    # truncate: string -> width prefix, numeric -> floor to width multiple
    s = {"stats": {"code": ["abcd", "abzz", 0]}}
    assert _file_partition(s, [("truncate", 2, "code")]) == "truncate[2](code)=ab"
    assert _file_partition(s, [("truncate", 3, "code")]) is None
    n = {"stats": {"v": [100, 199, 0]}}
    assert _file_partition(n, [("truncate", 100, "v")]) == "truncate[100](v)=100"
    assert _file_partition(n, [("truncate", 50, "v")]) is None
    # stats missing -> unknown, never a wrong label
    assert _file_partition({"stats": {}}, [("truncate", 2, "code")]) is None
    assert _file_partition({"stats": {}}, [("hour", "ts")]) is None
