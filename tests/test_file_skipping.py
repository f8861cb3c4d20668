"""Manifest-stats file skipping: scans are row-identical to the full
read + filter while provably reading fewer files; skipping is
conservative (missing stats never exclude)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.file_skipping import (
    conjuncts_to_sql,
    prune_files,
    scan_table,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    current_version,
    read_manifest,
    read_table_version,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    """Orders sorted by o_orderkey so files have disjoint key ranges —
    the layout a clustered/z-ordered 100 TB table has."""
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    clustered = orders.repartitionByRange(6, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    commit_append(spark, clustered, t, max_rows=10_000)
    return t, orders


def test_stats_present_in_manifest(spark, table):
    t, _ = table
    files = read_manifest(t, current_version(t))["files"]
    assert len(files) >= 4
    for e in files:
        st = e["stats"]
        assert set(st) >= {"o_orderkey", "o_totalprice", "o_orderstatus"}
        lo, hi, nulls = st["o_orderkey"]
        assert lo <= hi and nulls == 0


def test_range_scan_prunes_and_matches(spark, table):
    t, orders = table
    maxkey = orders.agg(F.max("o_orderkey")).first()[0]
    cut = int(maxkey * 0.8)
    conj = [("o_orderkey", ">", cut)]
    got = scan_table(spark, t, conj)
    kept, total = scan_table.last_files
    assert kept < total  # genuinely skipped files
    want = read_table_version(spark, t).where(f"o_orderkey > {cut}")
    assert _canon(got) == _canon(want)
    assert got.count() > 0


def test_equality_and_string_pruning(spark, table):
    t, orders = table
    key = orders.agg(F.min("o_orderkey")).first()[0]
    got = scan_table(spark, t, [("o_orderkey", "=", int(key))])
    kept, total = scan_table.last_files
    assert kept == 1  # point lookup: one file
    assert got.count() == orders.where(F.col("o_orderkey") == key).count()
    # string column: status 'F'/'O'/'P' spread everywhere -> no pruning,
    # but results stay exact
    got = scan_table(spark, t, [("o_orderstatus", "=", "F")])
    want = read_table_version(spark, t).where("o_orderstatus = 'F'")
    assert _canon(got) == _canon(want)


def test_empty_result_keeps_schema(spark, table):
    t, orders = table
    maxkey = orders.agg(F.max("o_orderkey")).first()[0]
    got = scan_table(spark, t, [("o_orderkey", ">", int(maxkey) + 10)])
    assert scan_table.last_files[0] == 0
    assert got.count() == 0
    assert got.columns == read_table_version(spark, t).columns


def test_missing_stats_never_exclude():
    files = [
        {"path": "a", "rows": 1, "stats": {}},
        {"path": "b", "rows": 1},  # legacy entry, no stats key
        {"path": "c", "rows": 1, "stats": {"x": [0, 10, 0]}},
    ]
    kept = prune_files(files, [("x", ">", 100)])
    assert [e["path"] for e in kept] == ["a", "b"]  # only c provably excluded
    kept = prune_files(files, [("x", "isnull")])
    assert [e["path"] for e in kept] == ["a", "b"]
    kept = prune_files(files, [("x", "<=", 0)])
    assert [e["path"] for e in kept] == ["a", "b", "c"]


def test_conjunction_combines(spark, table):
    t, orders = table
    maxkey = int(orders.agg(F.max("o_orderkey")).first()[0])
    conj = [("o_orderkey", ">=", maxkey // 2), ("o_orderkey", "<", maxkey // 2 + 500)]
    got = scan_table(spark, t, conj)
    want = read_table_version(spark, t).where(conjuncts_to_sql(conj))
    assert _canon(got) == _canon(want)
    kept, total = scan_table.last_files
    assert kept < total  # the band prunes files on both sides


def test_registered_entry_prunes(spark):
    """The oracle-paired entry must actually skip files (<50%) at the
    test SF — parity alone can't prove the pruning half."""
    from iceberg_file_writer_spark.queries.storage_ext import (
        stats_pruned_orders_scan,
    )

    stats_pruned_orders_scan(spark, SF_DIR).count()
    kept, total = stats_pruned_orders_scan.last_files
    assert total >= 4 and kept < total / 2


def test_pruned_scan_applies_deletion_vectors(spark, table):
    """A scan whose pruning drops files must still anti-join the
    snapshot's MoR tombstones — kept files can hold deleted rows."""
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        commit_delete_where_mor,
    )

    t, orders = table
    maxkey = orders.agg(F.max("o_orderkey")).first()[0]
    cut = int(maxkey * 0.8)
    commit_delete_where_mor(spark, t, f"o_orderkey > {cut} AND o_custkey % 2 = 0")
    got = scan_table(spark, t, [("o_orderkey", ">", cut)])
    kept, total = scan_table.last_files
    assert kept < total  # pruning actually fired
    want = read_table_version(spark, t).where(f"o_orderkey > {cut}")
    assert _canon(got) == _canon(want)


def test_pruned_scan_survives_evolved_column_conjunct(spark, tmp_path):
    """Residual on a column added by additive evolution must not crash
    (or lose schema) when every file carrying it was pruned away."""
    t = str(tmp_path / "evolved")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey"
    )
    old = orders.where("o_orderkey <= 1000").repartitionByRange(
        2, "o_orderkey"
    ).sortWithinPartitions("o_orderkey")
    commit_append(spark, old, t, max_rows=10_000)
    new = (
        orders.where("o_orderkey > 1000")
        .withColumn("priority", F.col("o_orderkey") % 3)
        .repartitionByRange(2, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    commit_append(spark, new, t, max_rows=10_000)
    # prune to the OLD half (no priority column in any kept file), with a
    # residual conjunct on the evolved column
    conj = [("o_orderkey", "<=", 1000), ("priority", "=", 1)]
    got = scan_table(spark, t, conj)
    want = read_table_version(spark, t).where(
        "o_orderkey <= 1000 AND priority = 1"
    )
    assert got.columns == want.columns
    assert _canon(got) == _canon(want) == []
    # and IS NULL on the evolved column over the old half MATCHES rows
    got2 = scan_table(spark, t, [("o_orderkey", "<=", 1000), ("priority", "isnull")])
    want2 = read_table_version(spark, t).where(
        "o_orderkey <= 1000 AND priority IS NULL"
    )
    assert _canon(got2) == _canon(want2)
    assert len(_canon(got2)) > 0


def test_string_literal_escaping():
    sql = conjuncts_to_sql([("name", "=", "O'Brien \\ co")])
    assert sql == "`name` = 'O\\'Brien \\\\ co'"


def test_string_literal_escaping_filters(spark):
    df = spark.createDataFrame(
        [("O'Brien",), ("Smith",)], "name string"
    )
    assert df.where(conjuncts_to_sql([("name", "=", "O'Brien")])).count() == 1


def test_in_list_prunes_and_matches(spark, table):
    """IN-list pushdown (round 9): a key-list lookup over a clustered
    table keeps only files whose [min,max] admits SOME member; values
    row-identical to the plain isin filter, NULL members inert."""
    t, orders = table
    lo = int(orders.agg(F.min("o_orderkey")).first()[0])
    hi = int(orders.agg(F.max("o_orderkey")).first()[0])
    got = scan_table(spark, t, [("o_orderkey", "in", [lo, hi, None])])
    kept, total = scan_table.last_files
    assert 1 <= kept < total  # first + last file only (disjoint ranges)
    want = orders.where(F.col("o_orderkey").isin(lo, hi))
    assert _canon(got) == _canon(want) and got.count() == 2


def test_in_list_empty_and_all_null_match_nothing(spark, table):
    t, orders = table
    for vals in ([], [None], [None, None]):
        got = scan_table(spark, t, [("o_custkey", "in", vals)])
        kept, _ = scan_table.last_files
        assert kept == 0, vals  # exact: IN () / IN (NULL) matches no row
        assert got.count() == 0


def test_in_list_incomparable_member_is_conservative():
    """Unit pin: a member whose type the file's stats cannot compare
    (legacy string-typed stats under an int literal, or vice versa)
    keeps the file — IN can only exclude when it can PROVE every
    member misses."""
    from iceberg_file_writer_spark.ingest.file_skipping import _file_can_match

    stats = {"k": [10, 20, 0]}
    assert _file_can_match(stats, "k", "in", [1, 5])            is False
    assert _file_can_match(stats, "k", "in", [1, 15])           is True
    assert _file_can_match(stats, "k", "in", [1, "legacy-str"]) is True
    assert _file_can_match({"k": ["a", "c", 0]}, "k", "in", [5]) is True
    assert _file_can_match({}, "k", "in", [5])                  is True
