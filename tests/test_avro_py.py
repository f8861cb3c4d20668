"""Clean-room Avro codec: golden bytes pinned against the Apache Avro
1.11 spec's own examples (so encoder and decoder cannot share a
mirrored bug), container round-trips under all three codecs, the
distributed Spark adapter, and the reference ingest pipeline fed by
real Avro bytes end-to-end."""

from __future__ import annotations

import os

import pytest

from iceberg_file_writer_spark.ingest.avro_py import (
    decode_long,
    decode_value,
    encode_long,
    encode_value,
    read_container,
    spark_read_avro,
    write_container,
)
from iceberg_file_writer_spark.schemas import LOCATION_SCHEMA

# The reference's record schema (/root/reference/main.go:19-41; SURVEY §1)
LOCATION_AVRO = {
    "type": "record",
    "name": "location",
    "fields": [
        {"name": "accuracy", "type": ["null", "double"], "default": None},
        {"name": "altitude", "type": ["null", "double"], "default": None},
        {"name": "altitudeAccuracy", "type": ["null", "double"], "default": None},
        {"name": "course", "type": ["null", "double"], "default": None},
        {"name": "features", "type": {"type": "array", "items": "string"}},
        {"name": "latitude", "type": "double"},
        {"name": "longitude", "type": "double"},
        {"name": "speed", "type": ["null", "double"], "default": None},
        {"name": "source", "type": "string"},
        {"name": "timestamp", "type": "long"},
        {"name": "user_id", "type": "string"},
    ],
}

# fixtures.go:41-59 — the reference's canonical row
CANON = {
    "accuracy": None, "altitude": None, "altitudeAccuracy": None,
    "course": None, "features": ["osm-2332"], "latitude": 37.0,
    "longitude": -121.0, "speed": None, "source": "device",
    "timestamp": 100000, "user_id": "userid1",
}


def test_zigzag_golden_bytes_from_the_spec_table():
    """Avro spec, 'Binary encoding' — the published zig-zag examples."""
    golden = {
        0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
        -64: b"\x7f", 64: b"\x80\x01", -65: b"\x81\x01",
    }
    for n, b in golden.items():
        assert encode_long(n) == b, n
        assert decode_long(b, 0) == (n, len(b)), n
    # round-trip the extremes
    for n in (2**63 - 1, -(2**63), 12345678901234567, -987654321):
        assert decode_long(encode_long(n), 0)[0] == n


def test_string_and_union_golden_bytes():
    out = bytearray()
    encode_value("string", "foo", out)
    assert bytes(out) == b"\x06foo"  # len 3 zig-zag = 0x06 + UTF-8
    # union ["null","double"]: null = branch 0 -> just 0x00
    out = bytearray()
    encode_value(["null", "double"], None, out)
    assert bytes(out) == b"\x00"
    # branch 1 (0x02) + little-endian IEEE double 1.0
    out = bytearray()
    encode_value(["null", "double"], 1.0, out)
    assert bytes(out) == b"\x02" + b"\x00\x00\x00\x00\x00\x00\xf0?"
    # array ["a"]: count 1 (0x02), item, terminator 0x00
    out = bytearray()
    encode_value({"type": "array", "items": "string"}, ["a"], out)
    assert bytes(out) == b"\x02\x02a\x00"


def test_record_roundtrip_and_negative_count_blocks():
    out = bytearray()
    encode_value(LOCATION_AVRO, CANON, out)
    rec, pos = decode_value(LOCATION_AVRO, bytes(out), 0)
    assert rec == CANON and pos == len(out)
    # decoder accepts the spec's negative-count array block variant
    buf = b"\x01\x06" + b"\x02a" + b"\x00"  # count -1, size 3, "a", end
    val, _ = decode_value({"type": "array", "items": "string"}, buf, 0)
    assert val == ["a"]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_container_roundtrip_all_codecs(tmp_path, codec):
    rows = [
        dict(CANON, user_id=f"user{i}", timestamp=100000 + i,
             latitude=37.0 + i, accuracy=(None if i % 2 else float(i)))
        for i in range(2500)  # spans multiple 1000-record blocks
    ]
    p = str(tmp_path / f"loc-{codec}.avro")
    write_container(p, LOCATION_AVRO, rows, codec=codec)
    schema, got = read_container(p)
    assert schema["name"] == "location"
    assert got == rows


def test_container_corruption_detected(tmp_path):
    p = str(tmp_path / "x.avro")
    write_container(p, LOCATION_AVRO, [CANON], codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # flip a sync byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        read_container(p)


def test_spark_read_avro_distributed(spark, tmp_path):
    rows = [
        dict(CANON, user_id=f"u{i % 7}", timestamp=100000 + i)
        for i in range(300)
    ]
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for j in range(3):  # three arrival files, like the reference stream
        write_container(
            os.path.join(d, f"part-{j}.avro"),
            LOCATION_AVRO,
            rows[j * 100 : (j + 1) * 100],
        )
    df = spark_read_avro(spark, d, LOCATION_SCHEMA)
    assert df.count() == 300
    got = {r.user_id for r in df.select("user_id").distinct().collect()}
    assert got == {f"u{i}" for i in range(7)}
    assert df.schema == LOCATION_SCHEMA
    one = df.where("timestamp = 100000").first()
    assert one.features == ["osm-2332"] and one.latitude == 37.0
    assert one.accuracy is None


def test_reference_pipeline_from_real_avro_bytes(spark, tmp_path):
    """The reference's literal contract end-to-end without jars: Avro
    object-container files in -> read_source(source_format='avro')
    (pure-Python fallback) -> partitioned, key-sorted, bounded,
    snappy-parquet table out."""
    from iceberg_file_writer_spark.ingest.batch import (
        IngestConfig,
        ingest_batch,
        read_source,
    )

    rows = [
        dict(CANON, user_id=f"u{i % 5}", timestamp=100000 + i * 7)
        for i in range(400)
    ]
    src = str(tmp_path / "in")
    os.makedirs(src)
    write_container(os.path.join(src, "a.avro"), LOCATION_AVRO, rows[:200])
    write_container(os.path.join(src, "b.avro"), LOCATION_AVRO, rows[200:])
    df = read_source(spark, src, LOCATION_SCHEMA, source_format="avro")
    out = str(tmp_path / "table")
    cfg = IngestConfig(partition_column="user_id", key_column="timestamp")
    ingest_batch(df, out, cfg, defaults={})
    back = spark.read.parquet(out)
    assert back.count() == 400
    assert {r.user_id for r in back.select("user_id").distinct().collect()} == {
        f"u{i}" for i in range(5)
    }


def test_ingest_batch_writes_real_avro_when_jar_absent(spark, tmp_path):
    """table_format='avro' end-to-end without jars: Hive-layout
    partition dirs of snappy Avro containers, key-sorted, row-bounded —
    the reference's literal output contract, byte format included."""
    import glob

    from iceberg_file_writer_spark.ingest.avro_py import (
        read_container,
        write_avro_partitioned,
    )
    from iceberg_file_writer_spark.ingest.batch import (
        IngestConfig,
        apply_layout,
        normalize_defaults,
    )

    rows = [
        dict(CANON, user_id=f"u{i % 3}", timestamp=500000 - i * 7)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, LOCATION_SCHEMA)
    out = str(tmp_path / "avrotable")
    cfg = IngestConfig(
        partition_column="user_id", key_column="timestamp",
        max_rows_per_file=40,
    )
    stats = write_avro_partitioned(
        apply_layout(normalize_defaults(df, {}), cfg), out, cfg
    )
    assert stats["rows_written"] == 300 and stats["approx_partitions"] == 3
    files = sorted(glob.glob(f"{out}/user_id=*/part-*.avro"))
    assert len(files) == stats["files"] >= 9  # 100 rows / 40 per partition
    total = 0
    for fp in files:
        schema, recs = read_container(fp)
        assert len(recs) <= 40  # reference size bound (here 40)
        ts = [r["timestamp"] for r in recs]
        assert ts == sorted(ts)  # key-sorted within file
        assert len({r["user_id"] for r in recs}) == 1  # partitioned
        assert recs[0]["accuracy"] is None  # nullable double survived
        total += len(recs)
    assert total == 300
    # and the distributed reader round-trips the whole table
    back = spark_read_avro(spark, f"{out}/*/*.avro", LOCATION_SCHEMA)
    assert back.count() == 300
    assert sorted(
        (r.user_id, r.timestamp) for r in back.collect()
    ) == sorted((r["user_id"], r["timestamp"]) for r in rows)


def test_ingest_batch_avro_table_format_falls_back(spark, tmp_path):
    """ingest_batch(table_format='avro') routes to the jar-free writer
    and the whole avro->avro pipeline round-trips."""
    import glob

    from iceberg_file_writer_spark.ingest.batch import IngestConfig, ingest_batch

    rows = [dict(CANON, user_id=f"u{i % 2}", timestamp=i) for i in range(100)]
    df = spark.createDataFrame(rows, LOCATION_SCHEMA)
    out = str(tmp_path / "t")
    stats = ingest_batch(
        df, out,
        IngestConfig(partition_column="user_id", key_column="timestamp",
                     max_rows_per_file=30, table_format="avro"),
        defaults={},
    )
    assert stats["rows_written"] == 100
    assert glob.glob(f"{out}/user_id=*/part-*.avro")
    back = spark_read_avro(spark, f"{out}/*/*.avro", LOCATION_SCHEMA)
    assert back.count() == 100


def test_streaming_ingest_from_avro_stream(spark, tmp_path):
    """The reference's FULL streaming pipeline on real Avro bytes,
    jar-free: container files arrive -> read_stream(source_format=
    'avro') (streamed binaryFile + executor decode) -> the standard
    epoch-committed partitioned sorted parquet sink."""
    from iceberg_file_writer_spark.ingest.batch import IngestConfig
    from iceberg_file_writer_spark.ingest.streaming import (
        drain_and_stop,
        read_stream,
        start_ingest_stream,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        dict(CANON, user_id=f"u{i % 4}", timestamp=100000 + i)
        for i in range(200)
    ]
    for j in range(2):
        write_container(
            os.path.join(src, f"arr-{j}.avro"),
            LOCATION_AVRO,
            rows[j * 100 : (j + 1) * 100],
        )
    stream = read_stream(
        spark, src, LOCATION_SCHEMA, source_format="avro",
        max_files_per_trigger=1,
    )
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    cfg = IngestConfig(partition_column="user_id", key_column="timestamp")
    q = start_ingest_stream(
        stream, out, ckpt, cfg, trigger_seconds=1, defaults={}
    )
    try:
        q.processAllAvailable()
    finally:
        drain_and_stop(q)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert {
        r.user_id for r in back.select("user_id").distinct().collect()
    } == {f"u{i}" for i in range(4)}


def test_timestamp_logical_type_roundtrips_events(spark, tmp_path):
    """timestamp-micros logical type: the events table (TIMESTAMP ts)
    round-trips through the clean-room writer + reader bit-true."""
    from iceberg_file_writer_spark.ingest.avro_py import (
        spark_read_avro,
        write_avro_partitioned,
    )
    from iceberg_file_writer_spark.ingest.batch import IngestConfig
    from iceberg_file_writer_spark.tables import load_tables

    ev = (
        load_tables(spark, "/root/testdata/sf0.001")["events"]
        .where("event_id % 11 = 0")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    out = str(tmp_path / "ev")
    stats = write_avro_partitioned(
        ev, out,
        IngestConfig(partition_column="event_type", key_column="event_id",
                     max_rows_per_file=200),
    )
    assert stats["rows_written"] == ev.count()
    # cast NTZ->TZ exactly as load_tables does (session TZ is UTC)
    want_schema = ev.schema
    back = spark_read_avro(spark, f"{out}/*/*.avro", want_schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )


def test_null_timestamp_writes_as_null_branch(spark, tmp_path):
    """A nullable ts carrying NULLs arrives executor-side as pd.NaT —
    which is not None, not a NaN float, and not a pd.Timestamp — and
    must map to the union's null branch, not an opaque executor error
    (ADVICE r9). Round-trip keeps the NULLs."""
    from pyspark.sql import types as T

    from iceberg_file_writer_spark.ingest.avro_py import (
        spark_read_avro,
        write_avro_partitioned,
    )
    from iceberg_file_writer_spark.ingest.batch import IngestConfig

    schema = T.StructType([
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ])
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), "a", 1.5),
        (2, None, "a", None),
        (3, dt.datetime(2024, 1, 2, 3, 4, 5), "b", 2.5),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "nulls")
    stats = write_avro_partitioned(
        df, out,
        IngestConfig(partition_column="event_type", key_column="event_id",
                     max_rows_per_file=10),
    )
    assert stats["rows_written"] == 3
    back = spark_read_avro(spark, f"{out}/*/*.avro", schema)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_unsupported_python_type_raises_value_error():
    """FAILFAST contract: an unsupported Python value type in a union
    is a ValueError naming the type, never a bare KeyError."""
    import pytest

    from iceberg_file_writer_spark.ingest.avro_py import _branch_index

    with pytest.raises(ValueError, match="no avro union branch.*set"):
        _branch_index(["null", "long"], {1, 2})


# --- Schema Resolution (spec section; VERDICT r9 next-step 6) -------------


def _enc_one(schema, rec):
    from iceberg_file_writer_spark.ingest.avro_py import encode_value

    out = bytearray()
    encode_value(schema, rec, out)
    return bytes(out)


W_V1 = {
    "type": "record", "name": "r",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "legacy", "type": "long"},
    ],
}


def test_resolution_defaults_promotions_aliases_and_skip():
    """One decode exercises all four rules: int->long promotion, a
    reader-only field filled from its default, a rename tracked via
    reader aliases, and a writer-only field skipped over."""
    from iceberg_file_writer_spark.ingest.avro_py import decode_resolved

    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "id", "type": "long"},                      # int->long
            {"name": "full_name", "type": "string",
             "aliases": ["name"]},                               # rename
            {"name": "score", "type": ["null", "double"],
             "default": None},                                   # default null
            {"name": "tag", "type": "string", "default": "x"},   # default str
            # writer's "legacy" has no reader field -> skipped
        ],
    }
    buf = _enc_one(W_V1, {"id": 7, "name": "ada", "legacy": 99})
    rec, pos = decode_resolved(W_V1, reader, buf, 0)
    assert pos == len(buf)  # the skipped field still advanced the cursor
    assert rec == {"id": 7, "full_name": "ada", "score": None, "tag": "x"}


def test_resolution_numeric_and_bytes_promotions():
    from iceberg_file_writer_spark.ingest.avro_py import decode_resolved

    w = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": "long"},
        {"name": "c", "type": "float"},
        {"name": "d", "type": "string"},
        {"name": "e", "type": "bytes"},
    ]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "double"},
        {"name": "b", "type": "double"},
        {"name": "c", "type": "double"},
        {"name": "d", "type": "bytes"},
        {"name": "e", "type": "string"},
    ]}
    buf = _enc_one(w, {"a": 3, "b": 4, "c": 1.5, "d": "hi", "e": b"yo"})
    rec, _ = decode_resolved(w, r, buf, 0)
    assert rec == {"a": 3.0, "b": 4.0, "c": 1.5, "d": b"hi", "e": "yo"}
    assert isinstance(rec["a"], float) and isinstance(rec["b"], float)


def test_resolution_union_writer_branch_vs_reader_union():
    """Writer nullable long read as nullable double (branch-by-branch
    resolution), and a non-union writer against a reader union."""
    from iceberg_file_writer_spark.ingest.avro_py import decode_resolved

    w = {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": ["null", "long"]}]}
    r = {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": ["null", "double"]}]}
    for val in (None, 42):
        buf = _enc_one(w, {"v": val})
        rec, _ = decode_resolved(w, r, buf, 0)
        assert rec["v"] == (None if val is None else 42.0)
    w2 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": "long"}]}
    buf = _enc_one(w2, {"v": 5})
    rec, _ = decode_resolved(w2, r, buf, 0)
    assert rec["v"] == 5.0


def test_resolution_missing_field_without_default_raises():
    import pytest

    from iceberg_file_writer_spark.ingest.avro_py import decode_resolved

    reader = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "required_new", "type": "string"},  # no default
    ]}
    buf = _enc_one(W_V1, {"id": 1, "name": "n", "legacy": 2})
    with pytest.raises(ValueError, match="no default"):
        decode_resolved(W_V1, reader, buf, 0)


def test_evolved_stream_reads_uniformly(spark, tmp_path):
    """End-to-end (VERDICT r9 done-criterion): old-schema files and
    new-schema files in ONE read_source glob come back reader-shaped —
    old rows get the reader default, new rows keep their values."""
    from pyspark.sql import types as T

    from iceberg_file_writer_spark.ingest.avro_py import write_container
    from iceberg_file_writer_spark.ingest.batch import read_source

    v1 = {"type": "record", "name": "ev", "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "user_id", "type": "int"},
    ]}
    v2 = {"type": "record", "name": "ev", "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "source", "type": "string", "default": "legacy"},
    ]}
    d = tmp_path / "stream"
    d.mkdir()
    write_container(
        str(d / "old.avro"), v1,
        [{"event_id": 1, "user_id": 10}, {"event_id": 2, "user_id": 20}],
    )
    write_container(
        str(d / "new.avro"), v2,
        [{"event_id": 3, "user_id": 30, "source": "live"}],
    )
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("source", T.StringType()),
    ])
    got = sorted(
        map(tuple, read_source(
            spark, str(d / "*.avro"), schema,
            source_format="avro", reader_schema=v2,
        ).collect())
    )
    assert got == [(1, 10, "legacy"), (2, 20, "legacy"), (3, 30, "live")]


def test_reader_schema_rejected_for_non_avro(spark, tmp_path):
    import pytest

    from iceberg_file_writer_spark.ingest.batch import read_source

    with pytest.raises(ValueError, match="avro source only"):
        read_source(
            spark, str(tmp_path), source_format="json",
            reader_schema={"type": "record", "name": "r", "fields": []},
        )
