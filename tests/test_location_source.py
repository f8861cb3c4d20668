"""Custom Python DataSource: the reference's FileStreamAdapter, Spark-native.

Batch read parity with the built-in JSON reader, streaming micro-batches
under the maxRecordsPerBatch backpressure cap (the reference's 1024-record
channel, main.go:64), and end-to-end ingest through the standard pipeline.
"""

from __future__ import annotations

import json
import os

import pytest

from iceberg_file_writer_spark.ingest.batch import IngestConfig, read_source, read_table
from iceberg_file_writer_spark.ingest.streaming import start_ingest_stream
from iceberg_file_writer_spark.schemas import LOCATION_SCHEMA
from iceberg_file_writer_spark.sources import register_location_source

N_ROWS = 700


@pytest.fixture(scope="module")
def json_input(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("loc-src"))
    rows = [
        {
            "accuracy": None,
            "altitude": None,
            "altitudeAccuracy": None,
            "course": float(i % 360),
            "features": [f"osm-{i}"] if i % 2 else [],
            "latitude": 37.0 + i * 1e-4,
            "longitude": -121.0,
            "speed": None,
            "source": "satellite" if i % 3 else None,
            "timestamp": 100000 + i,
            "user_id": f"u{i % 5}",
        }
        for i in range(N_ROWS)
    ]
    for chunk in range(2):  # two files: partition planning is per file
        with open(os.path.join(path, f"part-{chunk}.json"), "w") as f:
            for r in rows[chunk * N_ROWS // 2 : (chunk + 1) * N_ROWS // 2]:
                f.write(json.dumps(r) + "\n")
    return path


def test_batch_read_matches_builtin_json(spark, json_input):
    register_location_source(spark)
    got = spark.read.format("location_stream").option("path", json_input).load()
    ref = read_source(spark, json_input, schema=LOCATION_SCHEMA, source_format="json")
    # the built-in JSON reader forces nullable=true everywhere (including
    # array element containsNull); compare names and type names only — the
    # custom source preserves the declared nullability
    assert [(f.name, f.dataType.typeName()) for f in got.schema] == [
        (f.name, f.dataType.typeName()) for f in ref.schema
    ]
    key = lambda r: (r.user_id, r.timestamp)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, ref.collect()))
    assert got.count() == N_ROWS


def test_stream_respects_backpressure_cap(spark, json_input, tmp_path):
    """maxRecordsPerBatch bounds every micro-batch — the bounded-channel
    contract — while the run still drains the full input exactly once."""
    register_location_source(spark)
    stream = (
        spark.readStream.format("location_stream")
        .option("path", json_input)
        .option("maxRecordsPerBatch", 100)
        .load()
    )
    sink = str(tmp_path / "sink")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [
            p.numInputRows for p in q.recentProgress if p.numInputRows > 0
        ]
    finally:
        q.stop()
    back = spark.read.schema(stream.schema).parquet(sink)
    assert back.count() == N_ROWS
    assert batches and max(batches) <= 100
    assert len(batches) >= N_ROWS // 100


def test_stream_ingests_through_standard_pipeline(spark, json_input, tmp_path):
    """The custom source composes with ops #3-#9 unchanged: partitioned,
    sorted, bounded, epoch-committed table out the other end."""
    register_location_source(spark)
    stream = (
        spark.readStream.format("location_stream").option("path", json_input).load()
    )
    out = str(tmp_path / "table")
    q = start_ingest_stream(
        stream, out, str(tmp_path / "ckpt"), cfg=IngestConfig(), trigger_seconds=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = read_table(spark, out)
    assert back.count() == N_ROWS
    # defaults normalized on the way through (null source -> "device")
    assert back.where(back.source.isNull()).count() == 0
