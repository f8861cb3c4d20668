"""Skew utilities + table-format seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.table_format import require_format
from iceberg_file_writer_spark.operators.skew import (
    broadcast_salted_join,
    salted_count_sum,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregation_matches_direct(spark):
    ev = load_tables(spark, SF_DIR)["events"]
    direct = {
        r.user_id: (r.n_rows, round(r.total_value, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("value").alias("total_value"))
        .collect()
    }
    salted = {
        r.user_id: (r.n_rows, round(r.total_value, 6))
        for r in salted_count_sum(ev, "user_id", "value", n_salts=8).collect()
    }
    assert salted == direct


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_DIR)
    ev = t["events"].select("event_id", "user_id", "value")
    dim = (
        t["events"]
        .select("user_id")
        .distinct()
        .withColumn("bucket", (F.col("user_id") % 10).cast("int"))
    )
    plain = {tuple(r) for r in ev.join(dim, "user_id").select("event_id", "bucket").collect()}
    salted = {
        tuple(r)
        for r in broadcast_salted_join(ev, dim, "user_id", n_salts=4)
        .select("event_id", "bucket")
        .collect()
    }
    assert salted == plain


def test_parquet_always_supported(spark):
    assert require_format(spark, "parquet") == "parquet"


def test_missing_jar_formats_raise_actionable_errors(spark):
    for fmt, hint in [("avro", "spark-avro"), ("iceberg", "iceberg-spark-runtime")]:
        with pytest.raises(RuntimeError, match=hint):
            require_format(spark, fmt)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        require_format(spark, "rocksdb")
