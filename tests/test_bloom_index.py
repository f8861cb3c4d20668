"""Per-file bloom index: point-lookup pruning beyond min/max stats,
incremental O(delta) builds across appends, conservative semantics
(false positives waste a read, never lose a row), sidecar GC."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.bloom_index import (
    attach_bloom_index,
    bloom_prune,
    expire_bloom_index,
)
from iceberg_file_writer_spark.ingest.file_skipping import scan_table
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
    """Orders clustered by o_orderkey — so min/max stats are USELESS for
    o_custkey point lookups (every file spans most of the custkey
    range); exactly the gap the bloom index exists to close."""
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    clustered = orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    commit_append(spark, clustered, t, max_rows=10_000)
    return t, orders


def test_point_lookup_prunes_where_stats_cannot(spark, table):
    t, orders = table
    # a MID-range key: every file's [min, max] custkey span covers it,
    # so stats alone cannot prune at all
    med = orders.selectExpr("percentile_approx(o_custkey, 0.5)").first()[0]
    uid = (
        orders.where(f"o_custkey >= {med}")
        .agg(F.min("o_custkey"))
        .first()[0]
    )
    conj = [("o_custkey", "=", int(uid))]
    scan_table(spark, t, conj)
    kept_stats, total = scan_table.last_files
    assert kept_stats == total
    n = attach_bloom_index(spark, t, ["o_custkey"], fpp=0.01)
    assert n == total
    got = scan_table(spark, t, conj)
    kept_bloom, _ = scan_table.last_files
    assert kept_bloom < kept_stats, "bloom index pruned nothing"
    want = read_table_version(spark, t).where(f"o_custkey = {uid}")
    assert _canon(got) == _canon(want)


def test_absent_value_scans_empty_and_correct(spark, table):
    t, orders = table
    attach_bloom_index(spark, t, ["o_custkey"], fpp=0.001)
    got = scan_table(spark, t, [("o_custkey", "=", -987654)])
    kept, total = scan_table.last_files
    assert kept <= max(1, total // 4)  # fpp may keep the odd file
    assert got.count() == 0


def test_incremental_attach_covers_only_new_files(spark, table):
    t, orders = table
    total0 = len(read_manifest(t, current_version(t))["files"])
    assert attach_bloom_index(spark, t, ["o_custkey"]) == total0
    extra = orders.limit(50).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    commit_append(spark, extra, t, max_rows=10_000)
    m = read_manifest(t, current_version(t))
    assert m.get("bloom"), "append dropped the inherited bloom pointer"
    total1 = len(m["files"])
    # O(delta): only the appended files get indexed
    assert attach_bloom_index(spark, t, ["o_custkey"]) == total1 - total0
    assert attach_bloom_index(spark, t, ["o_custkey"]) == 0  # idempotent
    # lookups stay exact across both sidecars
    uid = orders.agg(F.min("o_custkey")).first()[0]
    got = scan_table(spark, t, [("o_custkey", "=", int(uid))])
    want = read_table_version(spark, t).where(f"o_custkey = {uid}")
    assert _canon(got) == _canon(want)


def test_unindexed_columns_and_files_survive(spark, table):
    """Conjuncts on unindexed columns never consult the filter; files a
    sidecar does not cover always survive (carried semantics)."""
    t, orders = table
    attach_bloom_index(spark, t, ["o_custkey"])
    m = read_manifest(t, current_version(t))
    kept = bloom_prune(
        t, m["bloom"], m["files"], [("o_totalprice", "=", "1.0")]
    )
    assert kept == m["files"]
    # a range conjunct on the indexed column is also untouched
    kept = bloom_prune(t, m["bloom"], m["files"], [("o_custkey", ">", 5)])
    assert kept == m["files"]


def test_expire_bloom_sidecars(spark, table):
    from iceberg_file_writer_spark.ingest.snapshots import expire_snapshots

    t, orders = table
    attach_bloom_index(spark, t, ["o_custkey"])
    # a CoW rewrite of everything makes the sidecar unreferenced once
    # history expires
    from iceberg_file_writer_spark.ingest.snapshots import commit_compact

    commit_compact(spark, t)
    # compaction carries the pointer (conservative: inert rows) — drop
    # history, then GC
    expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    m = read_manifest(t, current_version(t))
    if m.get("bloom"):
        assert expire_bloom_index(t, grace_seconds=0) == 0  # still referenced
    else:
        assert expire_bloom_index(t, grace_seconds=0) == 1


def test_double_literal_probe_is_conservative(spark, table):
    """Round-9 advice (high): str(10000000.0) and Spark's
    CAST(double AS STRING) ('1.0E7') render differently, so probing a
    double literal manufactured bloom FALSE NEGATIVES — scan_table
    pruned every file and silently returned 0 rows for an existing
    value. Non-(str|int) literals now skip the bloom test entirely."""
    t, orders = table
    attach_bloom_index(spark, t, ["o_totalprice"], fpp=0.01)
    price = float(orders.agg(F.min("o_totalprice")).first()[0])
    want = read_table_version(spark, t).where(F.col("o_totalprice") == price)
    assert want.count() > 0  # sanity: the probed value exists
    got = scan_table(spark, t, [("o_totalprice", "=", price)])
    assert _canon(got) == _canon(want)


def test_non_probe_typed_literals_never_prune(spark, table):
    """Unit pin: bloom_prune ignores bool/float/decimal literals (their
    str() diverges from Spark's cast-to-string) — kept list unchanged."""
    from decimal import Decimal

    t, _ = table
    attach_bloom_index(spark, t, ["o_custkey"])
    m = read_manifest(t, current_version(t))
    kept = m["files"]
    for lit in (True, False, 1.5, 10000000.0, Decimal("7.25")):
        out = bloom_prune(t, m["bloom"], kept, [("o_custkey", "=", lit)])
        assert out == kept, f"literal {lit!r} must not be bloom-probed"
    # while str/int literals still probe (the absent key prunes files)
    out = bloom_prune(t, m["bloom"], kept, [("o_custkey", "=", -987654)])
    assert len(out) < len(kept)


def test_in_list_bloom_probe(spark, table):
    """IN probing: all-absent member lists prune files; a present
    member keeps its file; one unprobeable member (double) disables
    the conjunct conservatively."""
    t, orders = table
    attach_bloom_index(spark, t, ["o_custkey"], fpp=0.001)
    m = read_manifest(t, current_version(t))
    kept = m["files"]
    out = bloom_prune(
        t, m["bloom"], kept, [("o_custkey", "in", [-1, -2, -3])]
    )
    assert len(out) <= max(1, len(kept) // 4)  # fpp may keep odd files
    uid = int(orders.agg(F.min("o_custkey")).first()[0])
    got = scan_table(spark, t, [("o_custkey", "in", [uid, -987654])])
    want = read_table_version(spark, t).where(F.col("o_custkey") == uid)
    assert _canon(got) == _canon(want)
    # unprobeable member -> conjunct skipped, nothing pruned
    out = bloom_prune(
        t, m["bloom"], kept, [("o_custkey", "in", [-1, 2.5])]
    )
    assert out == kept


def test_keyset_entry_prunes(spark):
    """The registered IN-keyset entry genuinely prunes: two live keys
    at opposite table ends keep ~2 files of the bloom-indexed table."""
    from iceberg_file_writer_spark.queries.storage_ext import (
        bloom_keyset_lookup,
    )

    bloom_keyset_lookup(spark, SF_DIR).count()
    kept, total = bloom_keyset_lookup.last_files
    assert total >= 4 and kept <= max(2, total // 2), (kept, total)
