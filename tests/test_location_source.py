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


def _mk_files(d, sizes, prefix="f"):
    paths = []
    for i, n in enumerate(sizes):
        p = os.path.join(d, f"{prefix}-{i}.json")
        with open(p, "w") as f:
            for j in range(n):
                f.write(json.dumps({"timestamp": j, "user_id": f"u{j}"}) + "\n")
        paths.append(p)
    return paths


def test_offset_discovery_reads_only_new_bytes(tmp_path):
    """latestOffset must be O(appended data): size-unchanged files are
    never opened, and a grown file is read only from its stored byte
    offset (the scale contract for a long-running ingest directory)."""
    from iceberg_file_writer_spark.sources.location_stream import _LocationStreamReader

    d = str(tmp_path)
    paths = _mk_files(d, [50, 80, 30])
    r = _LocationStreamReader(LOCATION_SCHEMA, {"path": d, "maxrecordsperbatch": "10000"})
    assert r.latestOffset() == {"files": {paths[0]: 50, paths[1]: 80, paths[2]: 30}}
    opens0, bytes0 = r.scan_opens, r.scan_bytes
    assert opens0 == 3 and bytes0 == sum(os.path.getsize(p) for p in paths)

    # no growth -> zero file opens, zero bytes read
    r.latestOffset()
    assert (r.scan_opens, r.scan_bytes) == (opens0, bytes0)

    # grow ONE file -> exactly one open, exactly the appended bytes
    appended = b""
    with open(paths[1], "ab") as f:
        for j in range(7):
            line = (json.dumps({"timestamp": 80 + j, "user_id": "ux"}) + "\n").encode()
            f.write(line)
            appended += line
    assert r.latestOffset()["files"][paths[1]] == 87
    assert r.scan_opens == opens0 + 1
    assert r.scan_bytes == bytes0 + len(appended)


def test_offset_discovery_partial_tail_not_lost(tmp_path):
    """A record mid-append (no trailing newline) is counted like a full
    line — matching a naive count — and re-examined once completed, so
    its remainder is never skipped by the byte-offset resume."""
    from iceberg_file_writer_spark.sources.location_stream import _LocationStreamReader

    d = str(tmp_path)
    (p,) = _mk_files(d, [10])
    with open(p, "ab") as f:
        f.write(b'{"timestamp": 10, "user_')  # partial record
    r = _LocationStreamReader(LOCATION_SCHEMA, {"path": d, "maxrecordsperbatch": "10000"})
    assert r.latestOffset()["files"][p] == 11
    with open(p, "ab") as f:
        f.write(b'id": "u10"}\n')  # completed + terminated
    assert r.latestOffset()["files"][p] == 11  # still 11 lines, all whole
    # the completed line decodes correctly from the stored resume offset
    rows = list(r.read(r.partitions({"files": {p: 10}}, {"files": {p: 11}})[0]))
    assert rows[0][-1] == "u10"


def test_partitions_carry_seek_anchors(tmp_path):
    """Slices over consumed ranges seek to the nearest scan anchor instead
    of re-reading the file prefix, and decode identically."""
    from iceberg_file_writer_spark.sources.location_stream import (
        _LocationStreamReader,
        _decode_lines,
    )

    d = str(tmp_path)
    (p,) = _mk_files(d, [100])
    r = _LocationStreamReader(LOCATION_SCHEMA, {"path": d, "maxrecordsperbatch": "10000"})
    r.latestOffset()
    with open(p, "a") as f:
        for j in range(100, 140):
            f.write(json.dumps({"timestamp": j, "user_id": f"u{j}"}) + "\n")
    r.latestOffset()
    (part,) = r.partitions({"files": {p: 100}}, {"files": {p: 140}})
    assert part.anchor_line == 100 and part.anchor_byte > 0
    hinted = list(r.read(part))
    plain = list(_decode_lines(p, 100, 140, LOCATION_SCHEMA))
    assert hinted == plain and len(hinted) == 40
    # commit prunes anchors strictly below the committed position
    r.commit({"files": {p: 140}})
    assert all(a[0] >= 100 for a in r._anchors[p])


def test_restart_applies_budget_on_top_of_committed_offset(tmp_path):
    """After a restart the reader's in-memory position is empty; the first
    partitions() call must seed it from the engine's committed start so
    the very next trigger advances past it (not ceil(committed/max)
    empty triggers re-announcing from zero)."""
    from iceberg_file_writer_spark.sources.location_stream import _LocationStreamReader

    d = str(tmp_path)
    (p,) = _mk_files(d, [500])
    fresh = _LocationStreamReader(LOCATION_SCHEMA, {"path": d, "maxrecordsperbatch": "100"})
    end1 = fresh.latestOffset()  # capped: announces 100 < committed 300
    assert end1["files"][p] == 100
    assert fresh.partitions({"files": {p: 300}}, end1) == []  # nothing new...
    assert fresh.latestOffset()["files"][p] == 400  # ...but budget now stacks on 300


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


def test_stream_writer_roundtrip(spark, json_input, tmp_path):
    """Source -> sink round trip through format("location_stream") in BOTH
    directions: streaming read of the fixture, streaming write via the
    custom sink, batch read back — same multiset of rows, manifest
    committed last, no staging residue."""
    register_location_source(spark)
    out = str(tmp_path / "sink-table")
    ckpt = str(tmp_path / "sink-ckpt")
    stream = spark.readStream.format("location_stream").option("path", json_input).load()
    q = (
        stream.writeStream.format("location_stream")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.format("location_stream").option("path", out).load()
    ref = spark.read.format("location_stream").option("path", json_input).load()
    key = lambda r: (r.user_id, r.timestamp, r.course)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, ref.collect()))
    # commit protocol artifacts: manifest present, staging drained
    manifests = [f for f in os.listdir(out) if f.startswith("_manifest-")]
    assert manifests, os.listdir(out)
    staging = os.path.join(out, "_staging")
    assert not os.path.exists(staging) or not os.listdir(staging)
    import json as _json

    total = sum(
        e["n_rows"]
        for m in manifests
        for e in _json.load(open(os.path.join(out, m)))["files"]
    )
    assert total == ref.count()


def test_stream_writer_commit_is_replay_idempotent(tmp_path):
    """A replayed batch commit (crash between rename and checkpoint ack)
    deletes its own previous files first — one copy survives, like the
    ingest epoch protocol."""
    from iceberg_file_writer_spark.sources.location_stream import (
        _LocationCommit,
        _LocationStreamWriter,
    )

    out = str(tmp_path / "table")
    w = _LocationStreamWriter(LOCATION_SCHEMA, {"path": out})

    def stage(rows):
        staging = os.path.join(out, "_staging")
        os.makedirs(staging, exist_ok=True)
        p = os.path.join(staging, f"s{rows}")
        with open(p, "w") as f:
            for i in range(rows):
                f.write(json.dumps({"user_id": f"u{i}"}) + "\n")
        return _LocationCommit(p, rows)

    w.commit([stage(4), stage(3)], 7)   # first attempt of batch 7
    w.commit([stage(2)], 7)             # replay with different task split
    w.commit([stage(5)], 8)             # another batch unaffected
    names = sorted(f for f in os.listdir(out) if f.startswith("batch-"))
    assert names == [
        "batch-0000000007-00000.jsonl",
        "batch-0000000008-00000.jsonl",
    ], names
    n7 = sum(1 for _ in open(os.path.join(out, "batch-0000000007-00000.jsonl")))
    assert n7 == 2  # the replay's copy, not the first attempt's
