"""t2-style correctness: every registered query vs the DuckDB oracle.

Runs at sf0.001 (fast inner loop). The driver runs the same comparison at
sf0.01; `pytest -m sf001 tests/test_oracle_parity.py --sf /root/testdata/sf0.01`
style escalation is available via the SPARK_GRAFT_TEST_SF env var.
"""

from __future__ import annotations

import os

import pytest

from iceberg_file_writer_spark.queries import all_queries
from tests.oracle_utils import assert_parity, register_views

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = all_queries()
SQL_CHECKED = sorted(name for name, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity(spark, duck, name):
    register_views(duck, SF_DIR)
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    assert_parity(df, duck, q.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]


def test_driver_contract_shapes(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_driver_surface_exactly_at_cap():
    """Registering a new driver_exposed query beyond the cap must force an
    explicit ceding decision (driver_exposed=False + rotation note at the
    ceded register site) — never a silent tail truncation of previously
    driver-green entries, which is what an over-cap count means."""
    from iceberg_file_writer_spark.queries import DRIVER_QUERY_CAP, all_queries

    exposed = [n for n, q in all_queries().items() if q.driver_exposed]
    assert len(exposed) == DRIVER_QUERY_CAP, (
        f"{len(exposed)} exposed vs cap {DRIVER_QUERY_CAP}: rotate explicitly; "
        f"exposed={sorted(exposed)}"
    )


def test_approx_distinct_users_bounded_error(spark):
    """The one rows-only driver entry: HLL++ sketch values are engine-
    specific, so instead of a cross-engine hash the accuracy contract is
    asserted directly — |approx - exact| <= 3*rsd*exact per group (3 sigma
    of the sketch's relative standard deviation; the query computes both
    columns in one pass)."""
    rows = QUERIES["approx_distinct_users"].fn(spark, SF_DIR).collect()
    assert rows
    rsd = 0.02
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(1.0, 3 * rsd * r.exact_users), r


def test_daily_user_sketch_rollup_bounded_error(spark):
    """The HLL weekly estimates must sit within the sketch's error bound
    of the exact weekly distinct counts (lgK=14 -> ~0.8% RSE; assert 3
    sigma + slack for the tiny-cardinality regime)."""
    from iceberg_file_writer_spark.queries import all_queries

    got = {
        r["iso_week"]: r["est_users"]
        for r in all_queries()["daily_user_sketch_rollup"].fn(spark, SF_DIR).collect()
    }
    from pyspark.sql import functions as F

    from iceberg_file_writer_spark.queries import pipeline_ext
    from iceberg_file_writer_spark.tables import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    exact = {
        r["iso_week"]: r["n"]
        for r in ev.groupBy(
            pipeline_ext.iso_week_key(F.date_trunc("day", F.col("ts"))).alias("iso_week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for wk, est in got.items():
        tol = max(3, 0.03 * exact[wk])
        assert abs(est - exact[wk]) <= tol, (wk, est, exact[wk])


def test_operator_catalog_in_sync():
    """docs/OPERATORS.md is generated from the registry; regenerate with
    `python tools_gen_catalog.py` whenever an operator is added."""
    import tools_gen_catalog

    with open("/root/repo/docs/OPERATORS.md") as f:
        assert f.read() == tools_gen_catalog.render()
