"""Materialized views on the statement surface: CREATE/REFRESH/DROP
MATERIALIZED VIEW, reads through execute_query, SHOW MATERIALIZED
VIEWS, catalog dependency rules, and the exactness contract — after
any DML + REFRESH the view equals a from-scratch GROUP BY recompute.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from iceberg_file_writer_spark.catalog import Catalog
from iceberg_file_writer_spark.sql_dml import (
    execute_dml,
    execute_query,
    execute_script,
)


def _wh(spark, rows=None):
    """Fresh warehouse with table t(g BIGINT, v BIGINT)."""
    wh = tempfile.mkdtemp(prefix="mv-wh-")
    rows = rows if rows is not None else [
        (g, v) for g in range(5) for v in (g * 10, g * 10 + 1)
    ]
    df = spark.createDataFrame(rows, "g bigint, v bigint")
    df.createOrReplaceTempView("mv_src")
    execute_dml(
        spark, "CREATE TABLE t AS SELECT g, v FROM mv_src", catalog=wh
    )
    return wh


def _recompute(spark, wh):
    return {
        (r.g, r.n, r.s, r.a)
        for r in execute_query(
            spark,
            "SELECT g, count(*) AS n, sum(v) AS s, "
            "CAST(sum(v) AS DOUBLE)/count(v) AS a FROM t GROUP BY g",
            catalog=wh,
        ).collect()
    }


def _read_mv(spark, wh):
    return {
        (r.g, r.n, r.s, r.a)
        for r in execute_query(
            spark, "SELECT g, n, s, a FROM mv", catalog=wh
        ).collect()
    }


MV_DDL = (
    "CREATE MATERIALIZED VIEW mv AS SELECT g, count(*) AS n, "
    "sum(v) AS s, avg(v) AS a FROM t GROUP BY g"
)


class TestMviewLifecycle:
    def test_create_read_matches_recompute(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        assert _read_mv(spark, wh) == _recompute(spark, wh)

    def test_dml_then_refresh_matches_recompute(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_script(
            spark,
            """
            DELETE FROM t WHERE g = 1;
            UPDATE t SET v = 0 WHERE g = 2;
            INSERT INTO t SELECT g + 100 AS g, v FROM mv_src;
            REFRESH MATERIALIZED VIEW mv;
            """,
            catalog=wh,
        )
        assert _read_mv(spark, wh) == _recompute(spark, wh)

    def test_reads_are_stale_until_refresh(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        before = _read_mv(spark, wh)
        execute_dml(spark, "DELETE FROM t WHERE g = 0", catalog=wh)
        assert _read_mv(spark, wh) == before  # materialized = stale
        execute_dml(spark, "REFRESH MATERIALIZED VIEW mv", catalog=wh)
        after = _read_mv(spark, wh)
        assert after == _recompute(spark, wh) and after != before

    def test_group_disappears_at_zero_rows(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_script(
            spark,
            "DELETE FROM t WHERE g = 3; REFRESH MATERIALIZED VIEW mv;",
            catalog=wh,
        )
        assert 3 not in {r[0] for r in _read_mv(spark, wh)}

    def test_refresh_is_idempotent(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_dml(spark, "DELETE FROM t WHERE g = 1", catalog=wh)
        v1 = execute_dml(spark, "REFRESH MATERIALIZED VIEW mv", catalog=wh)
        v2 = execute_dml(spark, "REFRESH MATERIALIZED VIEW mv", catalog=wh)
        assert v1 == v2
        assert _read_mv(spark, wh) == _recompute(spark, wh)

    def test_mv_joins_in_larger_query(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        got = execute_query(
            spark,
            "SELECT t.g, t.v, mv.n FROM t JOIN mv ON t.g = mv.g "
            "WHERE mv.n >= 2 ORDER BY t.g, t.v",
            catalog=wh,
        ).collect()
        assert all(r.n == 2 for r in got)

    def test_show_materialized_views_stale_flag(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        row = execute_query(
            spark, "SHOW MATERIALIZED VIEWS", catalog=wh
        ).collect()[0]
        assert (row.name, row.base_table, row.stale) == ("mv", "t", False)
        execute_dml(spark, "DELETE FROM t WHERE g = 0", catalog=wh)
        row = execute_query(
            spark, "SHOW MATERIALIZED VIEWS", catalog=wh
        ).collect()[0]
        assert row.stale is True

    def test_drop_materialized_view(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_dml(spark, "DROP MATERIALIZED VIEW mv", catalog=wh)
        assert Catalog(wh).mview_names() == []
        assert not os.path.exists(os.path.join(wh, "_mviews", "mv"))
        with pytest.raises(Exception):
            execute_dml(spark, "REFRESH MATERIALIZED VIEW mv", catalog=wh)

    def test_definition_durable_across_instances(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        # a fresh Catalog instance (fresh process in real life) reads
        # the same definition and serves the same state
        assert _read_mv(spark, wh) == _recompute(spark, wh)
        assert Catalog(wh).mview_spec("mv")["table"] == "t"


class TestMviewRefusals:
    def test_min_max_refused(self, spark):
        wh = _wh(spark)
        with pytest.raises(ValueError, match="min/max|unsupported"):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW m2 AS SELECT g, min(v) AS m "
                "FROM t GROUP BY g",
                catalog=wh,
            )

    def test_two_value_columns_refused(self, spark):
        wh = _wh(spark)
        with pytest.raises(ValueError, match="ONE value column"):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW m2 AS SELECT g, sum(v) AS s, "
                "sum(g) AS t2 FROM t GROUP BY g",
                catalog=wh,
            )

    def test_select_keys_must_match_group_by(self, spark):
        wh = _wh(spark)
        with pytest.raises(ValueError, match="GROUP BY"):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW m2 AS SELECT sum(v) AS s "
                "FROM t GROUP BY g",
                catalog=wh,
            )

    def test_float_value_column_refused(self, spark):
        wh = tempfile.mkdtemp(prefix="mv-wh-")
        spark.createDataFrame(
            [(1, 1.5)], "g bigint, v double"
        ).createOrReplaceTempView("mv_fsrc")
        execute_dml(
            spark, "CREATE TABLE t AS SELECT g, v FROM mv_fsrc", catalog=wh
        )
        with pytest.raises(ValueError):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW m2 AS SELECT g, sum(v) AS s "
                "FROM t GROUP BY g",
                catalog=wh,
            )

    def test_join_query_refused(self, spark):
        wh = _wh(spark)
        with pytest.raises(ValueError, match="shape"):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW m2 AS SELECT t.g, sum(t.v) AS s "
                "FROM t JOIN t AS u ON t.g = u.g GROUP BY t.g",
                catalog=wh,
            )

    def test_failed_create_leaves_no_binding(self, spark):
        wh = _wh(spark)
        with pytest.raises(Exception):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW m2 AS SELECT g, sum(nope) AS s "
                "FROM t GROUP BY g",
                catalog=wh,
            )
        assert Catalog(wh).mview_names() == []

    def test_name_collisions_refused(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        with pytest.raises(ValueError, match="MATERIALIZED VIEW"):
            execute_dml(
                spark, "CREATE TABLE mv (a BIGINT)", catalog=wh
            )
        with pytest.raises(ValueError, match="MATERIALIZED VIEW"):
            execute_dml(
                spark, "CREATE VIEW mv AS SELECT 1 AS one", catalog=wh
            )
        with pytest.raises(ValueError, match="TABLE"):
            execute_dml(
                spark,
                "CREATE MATERIALIZED VIEW t AS SELECT g, sum(v) AS s "
                "FROM t GROUP BY g",
                catalog=wh,
            )


class TestMviewTableDependency:
    def test_drop_base_table_refused_without_cascade(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        with pytest.raises(ValueError, match="materialized view"):
            execute_dml(spark, "DROP TABLE t", catalog=wh)
        assert Catalog(wh).mview_names() == ["mv"]

    def test_drop_base_table_cascade_drops_view(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_dml(spark, "DROP TABLE t CASCADE", catalog=wh)
        assert Catalog(wh).mview_names() == []


class TestMviewMappedEvolution:
    def test_rename_of_key_column_survives_refresh(self, spark):
        # CTAS tables are column-mapped: the view pins key/value by
        # FIELD ID, so a base-table rename between refreshes re-labels
        # without detaching the maintenance
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_script(
            spark,
            """
            ALTER TABLE t RENAME COLUMN v TO val;
            DELETE FROM t WHERE g = 2;
            REFRESH MATERIALIZED VIEW mv;
            """,
            catalog=wh,
        )
        got = _read_mv(spark, wh)
        want = {
            (r.g, r.n, r.s, r.a)
            for r in execute_query(
                spark,
                "SELECT g, count(*) AS n, sum(val) AS s, "
                "CAST(sum(val) AS DOUBLE)/count(val) AS a "
                "FROM t GROUP BY g",
                catalog=wh,
            ).collect()
        }
        assert got == want


class TestMviewReviewFindings:
    """Round-13 self-review regressions."""

    def test_rename_of_KEY_column_survives_refresh_and_read(self, spark):
        # refresh re-labels the agg state's key columns by field id; a
        # read keyed on the CREATE-time name would brick — keys resolve
        # positionally through the state, output keeps CREATE aliases
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        execute_script(
            spark,
            """
            ALTER TABLE t RENAME COLUMN g TO grp;
            DELETE FROM t WHERE grp = 1;
            REFRESH MATERIALIZED VIEW mv;
            """,
            catalog=wh,
        )
        got = _read_mv(spark, wh)  # still SELECT g, ... FROM mv
        want = {
            (r.grp, r.n, r.s, r.a)
            for r in execute_query(
                spark,
                "SELECT grp, count(*) AS n, sum(v) AS s, "
                "CAST(sum(v) AS DOUBLE)/count(v) AS a FROM t GROUP BY grp",
                catalog=wh,
            ).collect()
        }
        assert got == want

    def test_duplicate_create_refused_or_replace_works(self, spark):
        wh = _wh(spark)
        execute_dml(spark, MV_DDL, catalog=wh)
        with pytest.raises(ValueError, match="OR REPLACE"):
            execute_dml(spark, MV_DDL, catalog=wh)
        execute_dml(
            spark,
            "CREATE OR REPLACE MATERIALIZED VIEW mv AS SELECT g, "
            "count(*) AS c2 , sum(v) AS s2 FROM t GROUP BY g",
            catalog=wh,
        )
        row = execute_query(
            spark, "SELECT g, c2, s2 FROM mv WHERE g = 0", catalog=wh
        ).collect()
        assert len(row) == 1  # new definition serves
