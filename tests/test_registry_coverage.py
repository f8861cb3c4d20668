"""Driver-surface class-coverage guard (r7 verdict item 3).

The fifth rotation dropped two SURVEY.md §2.2 classes (grouping
extensions, correlated subqueries) off the driver surface entirely —
nothing was incorrect, but driver evidence for those plan shapes
stopped accruing. This guard makes that structurally impossible: every
§2.2 category must keep >= 1 driver-exposed entry, so a rotation that
would orphan a class fails CI before it ships.

Membership lists are intentionally generous (any member keeps the class
covered) and name REGISTERED entries — a typo'd name fails loudly via
the registry check rather than silently weakening the guard.
"""

from __future__ import annotations

import pytest

from iceberg_file_writer_spark.queries import all_queries, driver_queries

# SURVEY.md §2.2 category -> registered entries that evidence its plan
# shape. A rotation may swap members freely; it may never empty a class.
CLASS_MEMBERS: dict[str, set[str]] = {
    "scans_sources_sinks": {
        "pruned_time_range_scan", "snapshot_changes_feed",
        "table_snapshot_diff", "snapshots_metadata_log",
        "incremental_snapshot_stream_read",
    },
    "projections_filters": {
        "part_scalar_expressions", "event_props_extraction",
        "pruned_time_range_scan", "embedding_quantize",
    },
    "joins": {
        "purchase_asof_click", "bloom_prefilter_join", "cohort_retention",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "streaming_join_view_maintenance",
    },
    "aggregations": {
        "q1_pricing_summary", "top_purchasers", "corpus_stats_by_source",
        "hll_distinct_users_by_type",
    },
    "grouping_extensions": {
        "rollup_sales_by_region_nation", "grouping_sets_revenue",
        "pivot_orders_priority_by_status", "unpivot_nation_balance_metrics",
        "cube_orders_status_priority",
    },
    "window_functions": {
        "cdc_user_latest_state", "cohort_retention", "top_purchasers",
        "orders_above_customer_avg",
    },
    "sorts_limits_topk": {
        "top_purchasers", "bm25_ranked_search", "knn_sq8_rerank",
    },
    "set_operations": {
        "intersect_customers", "except_customers",
    },
    "subqueries": {
        "orders_above_customer_avg", "q17_small_quantity_revenue",
        "q22_idle_customers",
    },
    "scalar_functions": {
        "part_scalar_expressions", "multimodal_header_parse",
        "doc_fingerprints",
    },
    "streaming": {
        "streaming_dedup_events", "streaming_session_windows",
        "streaming_stateful_daily_totals", "streaming_priority_sample",
        "streaming_join_view_maintenance", "streaming_upsert_mor_state",
        "streaming_multi_table_txn", "streaming_cdf_feed",
        "streaming_cdf_agg_maintenance",
    },
    "udf_surface": {
        "multimodal_feature_extract", "streaming_stateful_daily_totals",
        "span_corruption_examples",
    },
}


def test_class_members_are_registered():
    registered = set(all_queries())
    for cls, members in CLASS_MEMBERS.items():
        missing = members - registered
        assert not missing, f"{cls}: unknown entries {sorted(missing)}"


@pytest.mark.parametrize("cls", sorted(CLASS_MEMBERS))
def test_every_class_keeps_a_driver_exposed_entry(cls):
    surface = set(driver_queries())
    covered = CLASS_MEMBERS[cls] & surface
    assert covered, (
        f"§2.2 class '{cls}' has NO driver-exposed entry — a rotation "
        f"orphaned it; restore one of {sorted(CLASS_MEMBERS[cls])}"
    )


def test_surface_is_exactly_at_cap():
    from iceberg_file_writer_spark.queries import DRIVER_QUERY_CAP

    assert len(driver_queries()) == DRIVER_QUERY_CAP


def test_operator_catalog_counts_match_registry():
    """r12 (VERDICT r11 What's wrong #2): round-record operator counts
    are GENERATED, not hand-summed — docs/OPERATORS.md's headline
    numbers must equal the live registry exactly (regenerate with
    tools_gen_catalog.py after adding/rotating entries)."""
    import os
    import re

    qs = all_queries()
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "OPERATORS.md")
    with open(path) as f:
        text = f.read()
    m = re.search(
        r"\*\*(\d+) operators\*\* \((\d+) oracle-paired, (\d+) driver slots\)",
        text,
    )
    assert m, "docs/OPERATORS.md headline line missing"
    want = (
        len(qs),
        sum(1 for q in qs.values() if q.oracle),
        len(driver_queries()),
    )
    assert (int(m[1]), int(m[2]), int(m[3])) == want, (
        "docs/OPERATORS.md counts drifted from the registry — run "
        "python tools_gen_catalog.py"
    )
