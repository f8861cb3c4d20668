"""Skew utilities + table-format seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.table_format import (
    available_formats,
    require_format,
)
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
        if available_formats(spark).get(fmt):
            pytest.skip(f"{fmt} jar present in this environment")
        with pytest.raises(RuntimeError, match=hint):
            require_format(spark, fmt)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        require_format(spark, "rocksdb")


def test_avro_source_path_wired_through_seam(spark, tmp_path):
    """The reference's literal wire format (main.go:61-65): jar present
    -> the spark-avro datasource; jar absent -> the clean-room
    pure-Python container reader (round 9, ingest/avro_py.py) — the
    read path WORKS either way, on real Avro bytes."""
    from iceberg_file_writer_spark.ingest.batch import read_source

    sample = spark.createDataFrame(
        [("u1", 1000, 1.0, 2.0)],
        "user_id string, timestamp long, latitude double, longitude double",
    )
    src = str(tmp_path / "in")
    if available_formats(spark).get("avro"):
        sample.write.format("avro").save(src)
    else:
        import os

        from iceberg_file_writer_spark.ingest.avro_py import (
            avro_schema_of,
            write_container,
        )

        os.makedirs(src)
        write_container(
            os.path.join(src, "a.avro"),
            avro_schema_of(sample.schema),
            [r.asDict() for r in sample.collect()],
        )
    got = read_source(
        spark, src, schema=sample.schema, source_format="avro"
    )
    assert [tuple(r) for r in got.collect()] == [("u1", 1000, 1.0, 2.0)]


def test_iceberg_write_path_wired_through_seam(spark):
    """writeTo(...).partitionedBy(...) branch: raises the actionable
    missing-jar/catalog error here; runs for real when the runtime exists."""
    from iceberg_file_writer_spark.ingest.batch import IngestConfig, write_iceberg_table
    from iceberg_file_writer_spark.tables import load_tables

    ev = load_tables(spark, SF_DIR)["events"].limit(10)
    cfg = IngestConfig(partition_column="user_id", key_column="ts")
    if not available_formats(spark).get("iceberg"):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            write_iceberg_table(ev, "local.db.events_test", cfg)
        return
    write_iceberg_table(ev, "local.db.events_test", cfg)
    assert spark.table("local.db.events_test").count() == 10


def test_ingest_batch_rejects_path_based_iceberg(spark, tmp_path):
    from iceberg_file_writer_spark.ingest.batch import IngestConfig, ingest_batch
    from iceberg_file_writer_spark.tables import load_tables

    ev = load_tables(spark, SF_DIR)["events"].limit(1)
    with pytest.raises(ValueError, match="write_iceberg_table"):
        ingest_batch(ev, str(tmp_path / "t"), IngestConfig(table_format="iceberg"))


def test_csv_source_and_orc_sink_round_trip(spark, tmp_path):
    """Format coverage beyond the default json->parquet path: a flat-schema
    CSV source ingests into an ORC table with the layout invariants
    (partitioning, key order, row bound) intact."""
    import csv as _csv
    import random

    from pyspark.sql import functions as F

    from iceberg_file_writer_spark.ingest.batch import (
        IngestConfig,
        ingest_batch,
        read_source,
        read_table,
    )

    rng = random.Random(7)
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"event_id": i, "user_id": f"u{i % 4}", "timestamp": rng.randrange(10**6)}
        for i in range(500)
    ]
    with open(src / "data.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["event_id", "user_id", "timestamp"])
        w.writeheader()
        w.writerows(rows)

    schema = "event_id BIGINT, user_id STRING, timestamp BIGINT"
    from pyspark.sql.types import _parse_datatype_string

    df = read_source(spark, str(src), _parse_datatype_string(schema), "csv")
    out = str(tmp_path / "table")
    cfg = IngestConfig(max_rows_per_file=64, table_format="orc")
    ingest_batch(df, out, cfg, defaults={})

    back = read_table(spark, out, cfg)
    assert back.count() == len(rows)
    assert dict(back.dtypes)["timestamp"] == "bigint"
    assert set(r.user_id for r in back.select("user_id").distinct().collect()) == {
        f"u{i}" for i in range(4)
    }
    # per-file key order + row bound, checked through Spark per ORC file
    files = back.select(F.input_file_name().alias("f")).distinct().collect()
    for r in files:
        one = spark.read.orc(r.f.replace("file:", ""))
        ts = [x.timestamp for x in one.select("timestamp").collect()]
        assert len(ts) <= cfg.max_rows_per_file
        assert ts == sorted(ts)


def test_csv_source_rejects_nested_schema(spark, tmp_path):
    import pytest as _pytest

    from iceberg_file_writer_spark.ingest.batch import read_source
    from iceberg_file_writer_spark.schemas import LOCATION_SCHEMA

    with _pytest.raises(ValueError, match="flat schemas only"):
        read_source(spark, str(tmp_path), LOCATION_SCHEMA, "csv")
