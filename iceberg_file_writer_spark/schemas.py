"""Declared schemas.

The reference enforces one fixed, self-describing Avro schema at decode,
buffering, and write time (reference main.go:19-41; the codec is handed to
all three stages at main.go:49,63,84). The Spark analog is a declared
``StructType`` used with ``spark.read.schema(...)`` / ``from_json`` so the
scan enforces types instead of inferring them.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Location: the reference's canonical record (main.go:19-41) ------------
#
# Avro union ["null", T] -> nullable field; Avro `array<string>` (the items
# `name` key at main.go:31 is a no-op for primitive item types) ->
# ArrayType(StringType); `timestamp` is a plain Avro long carrying epoch
# milliseconds (main.go:38; MaxAge is in ms, main.go:75).
LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("accuracy", T.DoubleType(), nullable=True),
        T.StructField("altitude", T.DoubleType(), nullable=True),
        T.StructField("altitudeAccuracy", T.DoubleType(), nullable=True),
        T.StructField("course", T.DoubleType(), nullable=True),
        T.StructField("features", T.ArrayType(T.StringType(), containsNull=False), nullable=False),
        T.StructField("latitude", T.DoubleType(), nullable=False),
        T.StructField("longitude", T.DoubleType(), nullable=False),
        T.StructField("speed", T.DoubleType(), nullable=True),
        T.StructField("source", T.StringType(), nullable=False),
        T.StructField("timestamp", T.LongType(), nullable=False),
        T.StructField("user_id", T.StringType(), nullable=False),
    ]
)

# Avro field defaults (main.go:23-26,36: null; main.go:37: source="device").
# Spark readers do not apply Avro defaults to present-but-null JSON fields,
# so ingest normalizes with coalesce(col, lit(default)).
LOCATION_DEFAULTS: dict[str, object] = {
    "accuracy": None,
    "altitude": None,
    "altitudeAccuracy": None,
    "course": None,
    "speed": None,
    "source": "device",
}

# Reference pipeline configuration constants (BlockManager, main.go:72-85).
DEFAULT_PARTITION_COLUMN = "user_id"  # main.go:50,78
DEFAULT_KEY_COLUMN = "timestamp"  # main.go:51,79
DEFAULT_MAX_ROWS_PER_FILE = 4096  # BlockManager.MaxSize, main.go:76
DEFAULT_MAX_AGE_MS = 60_000  # BlockManager.MaxAge, main.go:75
DEFAULT_COMPRESSION = "snappy"  # FilesystemStorageAdapter, main.go:52

# --- Events: the driver-provided stand-in stream table (TESTDATA.md) -------
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
