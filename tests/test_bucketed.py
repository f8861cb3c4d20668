"""Bucketed co-located joins: the shuffle moved to ingest time, asserted.

Writes orders and lineitem bucketed on the order key, then pins the plan
shape of their join: no Exchange on either side (the whole point of
bucketing) while an unbucketed shuffle join of the same data does
exchange both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.bucketed import bucketed_join, write_bucketed_table
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = load_tables(spark, SF_DIR)
    write_bucketed_table(
        t["orders"], "orders_bkt", "o_orderkey", num_buckets=8, sort_column="o_orderkey"
    )
    write_bucketed_table(
        t["lineitem"],
        "lineitem_bkt",
        "l_orderkey",
        num_buckets=8,
        sort_column="l_orderkey",
    )
    yield "orders_bkt", "lineitem_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def _joined(spark, bucketed_tables):
    o, l = bucketed_tables
    return (
        spark.table(o)
        .join(spark.table(l), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark, bucketed_tables)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles_both_sides(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = load_tables(spark, SF_DIR)
        df = (
            t["orders"]
            .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_values_match_plain_join(spark, bucketed_tables):
    t = load_tables(spark, SF_DIR)
    got = {tuple(r) for r in _joined(spark, bucketed_tables).collect()}
    exp = {
        tuple(r)
        for r in t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
        .collect()
    }
    assert got == exp


def test_bucketed_join_helper(spark, bucketed_tables):
    o, l = bucketed_tables
    df = bucketed_join(spark, o, l, "o_orderkey", "l_orderkey")
    assert df.count() == spark.table(l).count()  # every lineitem has an order
