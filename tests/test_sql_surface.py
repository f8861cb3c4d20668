"""The spark.sql entry surface (VERDICT r5 item 7): create_views exposes
base tables and registered queries as temp views, and SQL composed over
those views must equal the same composition written with the registry
functions directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.tables import create_views, load_tables

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_join_over_query_views_matches_registry_composition(spark):
    create_views(
        spark, SF_DIR, query_names=["top_purchasers", "user_pagerank"]
    )
    got = spark.sql(
        """
        SELECT t.user_id, t.total_spent, p.pr_nano
        FROM q_top_purchasers t
        JOIN q_user_pagerank p ON p.user_id = t.user_id
        """
    )
    qs = all_queries()
    want = (
        qs["top_purchasers"].fn(spark, SF_DIR)
        .join(
            qs["user_pagerank"].fn(spark, SF_DIR).select("user_id", "pr_nano"),
            "user_id",
        )
        .select("user_id", "total_spent", "pr_nano")
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_sql_over_base_table_views(spark):
    create_views(spark, SF_DIR, query_names=[])
    got = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_customers
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        """
    )
    t = load_tables(spark, SF_DIR)
    want = (
        t["customer"]
        .join(t["nation"], F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )
    assert _rows(got) == _rows(want)


def test_filter_over_query_view_pushes_into_scan(spark):
    """Catalyst must optimize across the view boundary: a filter over a
    q_ view reaches the parquet scan as a pushed filter."""
    import contextlib
    import io

    create_views(spark, SF_DIR, query_names=["part_scalar_expressions"])
    # the view is a row-level projection, so the predicate travels
    # through it into the part scan
    df = spark.sql("SELECT * FROM q_part_scalar_expressions WHERE p_partkey = 7")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan and "p_partkey" in plan.split("PushedFilters:")[1].split("]")[0]


def test_cli_sql_subcommand(capsys):
    from iceberg_file_writer_spark.__main__ import main

    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM documents",
            "--sf-dir",
            SF_DIR,
            "--views",
            "",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "n" in out


def test_default_view_surface_is_plan_only(spark, monkeypatch):
    """create_views' default set must register without executing ANY
    Spark action — every entry that trains an artifact, collects, writes,
    or starts a stream at plan-build time must carry eager=True (lint
    for the registry flag; code-review find r6)."""
    import pyspark.sql.classic.dataframe as cdf
    import pyspark.sql.readwriter as rw
    import pyspark.sql.streaming.readwriter as srw

    class Boom(Exception):
        pass

    def boom(*a, **k):
        raise Boom("a default (non-eager) view executed a Spark action")

    for n in ("collect", "count", "head", "take", "toPandas"):
        monkeypatch.setattr(cdf.DataFrame, n, boom)
    for n in ("parquet", "save", "orc", "csv", "json", "text"):
        monkeypatch.setattr(rw.DataFrameWriter, n, boom)
    monkeypatch.setattr(srw.DataStreamWriter, "start", boom)

    views = create_views(spark, SF_DIR)  # must not raise Boom
    assert len(views) > 100  # base tables + the lazy majority


def test_unknown_view_name_is_a_clean_error(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown query"):
        create_views(spark, SF_DIR, query_names=["definitely_not_a_query"])


def test_materialize_view_joins_eager_result_with_plan_only_view(spark):
    """VERDICT r6 item 7: the documented opt-in for eager entries — run
    once, register the materialized rows as a temp view, and SQL joins
    against plan-only views must equal the registry composition."""
    from iceberg_file_writer_spark.tables import materialize_view

    create_views(spark, SF_DIR, query_names=["top_purchasers"])
    view = materialize_view(spark, SF_DIR, "ann_index_ivf_probe")
    assert view == "q_ann_index_ivf_probe"
    got = spark.sql(
        """
        SELECT a.query_id, a.neighbor_id, a.cosine_sim, t.total_spent
        FROM q_ann_index_ivf_probe a
        JOIN q_top_purchasers t ON t.user_id = a.neighbor_id
        """
    )
    qs = all_queries()
    want = (
        qs["ann_index_ivf_probe"].fn(spark, SF_DIR)
        .join(
            qs["top_purchasers"].fn(spark, SF_DIR),
            F.col("user_id") == F.col("neighbor_id"),
        )
        .select("query_id", "neighbor_id", "cosine_sim", "total_spent")
    )
    assert _rows(got) == _rows(want)


def test_materialize_view_rejects_plan_only_entries(spark):
    import pytest as _pytest

    from iceberg_file_writer_spark.tables import materialize_view

    with _pytest.raises(ValueError, match="plan-only"):
        materialize_view(spark, SF_DIR, "top_purchasers")
    with _pytest.raises(ValueError, match="unknown query"):
        materialize_view(spark, SF_DIR, "no_such_entry")


def test_cli_changes_subcommand(capsys, tmp_path):
    """`changes <table> <from> <to>` prints the CDC feed between two
    versions — the +/- changelog reachable from the command line."""
    from iceberg_file_writer_spark.__main__ import main
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_delete_where,
    )
    from iceberg_file_writer_spark.session import get_spark
    from iceberg_file_writer_spark.tables import load_tables

    spark = get_spark("iceberg_file_writer_spark-tests")
    t = str(tmp_path / "ord")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    commit_append(spark, orders.where("o_orderkey < 100"), t, max_rows=500)
    commit_delete_where(spark, t, "o_orderkey < 50")
    rc = main(["changes", t, "1", "2", "--limit", "5"])
    out = capsys.readouterr().out
    assert rc == 0 and "change" in out and "-" in out
