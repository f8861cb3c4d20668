"""Streaming ingestion: the reference pipeline as Structured Streaming.

Maps the reference's three concurrent stages + channels (main.go:61-93)
onto one streaming query:

- FileStreamAdapter (main.go:61-70)  → ``spark.readStream`` file source;
  channel backpressure (1024-record buffer, main.go:64) → source rate
  limiting via ``maxFilesPerTrigger`` + Spark's pull-based scheduling.
- BlockManager (main.go:72-90) → micro-batches: ``MaxAge`` (60 s wall-
  clock, main.go:75) → ``trigger(processingTime=...)`` — processing-time,
  NOT an event-time watermark, preserving the reference's wall-clock flush
  semantics (SURVEY.md §4.3: a late record lands in the current open
  block, never dropped); ``MaxSize`` (4096 rows, main.go:76) →
  ``maxRecordsPerFile``.
- FilesystemStorageAdapter (main.go:47-59) → partitioned snappy file sink.
- Finished signal / CommitBlocks / ordered stop (main.go:95-115,130) →
  ``processAllAvailable()`` + ``stop()`` with checkpoint-backed exactly-
  once commit — strictly stronger than the reference, which loses open
  blocks on crash (no WAL; SURVEY.md §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from iceberg_file_writer_spark.ingest.batch import IngestConfig, normalize_defaults
from iceberg_file_writer_spark.schemas import LOCATION_SCHEMA


def read_stream(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType = LOCATION_SCHEMA,
    source_format: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Op #1-#2 streaming: schema-enforced file-source stream."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if source_format == "json":
        return reader.json(input_dir)
    if source_format == "parquet":
        return reader.parquet(input_dir)
    raise ValueError(f"unsupported source format: {source_format}")


def start_ingest_stream(
    df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    cfg: IngestConfig = IngestConfig(),
    trigger_seconds: int = 60,
    query_name: str | None = None,
    defaults: dict[str, object] | None = None,
) -> StreamingQuery:
    """Ops #3-#7: the full pipeline as one streaming query.

    ``query_name`` defaults to "<partition>-<key>", mirroring the
    reference's pipeline ID (main.go:73: ``ID: "user_id-timestamp"``).
    """
    out = normalize_defaults(df, defaults)
    name = query_name or f"{cfg.partition_column}-{cfg.key_column}"

    # Streaming plans can't sort, so the key-ordering op (#4, reference
    # main.go:51,79) runs inside foreachBatch: each micro-batch is a bounded
    # DataFrame — the reference's flushed block — sorted and appended with
    # the same layout as the batch path. foreachBatch + append is
    # effectively-once here because each epoch writes distinct files.
    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.repartition(cfg.num_buckets, cfg.partition_column)
            .sortWithinPartitions(cfg.partition_column, cfg.key_column)
            .write.mode("append")
            .option("maxRecordsPerFile", cfg.max_rows_per_file)
            .option("compression", cfg.compression)
            .partitionBy(cfg.partition_column)
            .format(cfg.table_format)
            .save(output_path)
        )

    return (
        out.writeStream.queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_epoch)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def drain_and_stop(query: StreamingQuery) -> None:
    """Ops #8-#9: graceful shutdown with drain ordering (main.go:95-115).

    ``processAllAvailable()`` = drain source + flush all buffered state
    (the reference's CommitBlocks(true), main_test.go:86); ``stop()`` then
    tears down. The checkpoint makes even unclean shutdown lossless —
    the reference's contract, upgraded.
    """
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)


def ingest_stream_once(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    cfg: IngestConfig = IngestConfig(),
    schema: T.StructType = LOCATION_SCHEMA,
    source_format: str = "json",
) -> None:
    """Batch-to-stream convenience: run the streaming pipeline over a
    static directory to completion (the reference CLI's lifecycle,
    main.go:117-141: start → <-Finished → stop)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    stream = read_stream(spark, input_dir, schema=schema, source_format=source_format)
    q = start_ingest_stream(
        stream, output_path, checkpoint_dir, cfg=cfg, trigger_seconds=1
    )
    drain_and_stop(q)
