"""Physical-plan quality gates — the 100 TB posture, asserted.

A query that silently loses filter pushdown, column pruning, its broadcast
join, or its TakeOrderedAndProject would still pass the value oracle while
becoming a disaster at scale; these assertions pin the plan shape.
"""

from __future__ import annotations

import re

import pytest

from iceberg_file_writer_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = all_queries()[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_filter_pushdown(spark):
    p = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in p
    # shipdate range + discount + quantity all reach the parquet scan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_shipdate", p), p


def test_scan_column_pruning(spark):
    p = _plan(spark, "q6_forecast_revenue")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # 4 of lineitem's 11 columns — projection reached the scan
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}, cols


@pytest.mark.parametrize(
    "name,min_broadcasts",
    [("q3_shipping_priority", 1), ("q5_local_supplier_volume", 3), ("q10_returned_items", 2)],
)
def test_dim_joins_broadcast(spark, name, min_broadcasts):
    p = _plan(spark, name)
    assert p.count("BroadcastHashJoin") >= min_broadcasts, p
    assert "SortMergeJoin" not in p, f"{name} fell back to sort-merge:\n{p}"


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q10_returned_items", "top_purchasers"])
def test_global_topk_avoids_full_sort(spark, name):
    assert "TakeOrderedAndProject" in _plan(spark, name)


def test_knn_broadcasts_query_side(spark):
    p = _plan(spark, "knn_bruteforce_cosine")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_partition_pruned_scan_pushes_entity_filter(spark):
    p = _plan(spark, "pruned_time_range_scan")
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(user_id,7\)", p), p


def test_ngram_stop_shingle_filter_is_broadcast_anti_join(spark):
    """The stop-shingle cutoff must never become a shuffle: the stop set is
    tiny by construction, so its anti-join broadcasts."""
    p = _plan(spark, "ngram_jaccard_near_duplicates")
    assert re.search(r"BroadcastHashJoin .*LeftAnti", p), p
