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

import hashlib
import os
import shutil

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
    reader_schema: "dict | None" = None,
) -> DataFrame:
    """Op #1-#2 streaming: schema-enforced file-source stream.

    ``reader_schema`` (avro only): Avro Schema Resolution against each
    arriving container's own writer schema — a mid-stream producer
    schema change keeps decoding reader-shaped (see read_source)."""
    if reader_schema is not None and source_format != "avro":
        raise ValueError("reader_schema applies to the avro source only")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if source_format == "json":
        return reader.json(input_dir)
    if source_format == "parquet":
        return reader.parquet(input_dir)
    if source_format == "avro":
        # the reference's literal wire format (main.go:61-70), jar-free:
        # streamed binaryFile + the clean-room executor-side decode
        from iceberg_file_writer_spark.ingest.avro_py import (
            spark_read_avro_stream,
        )

        return spark_read_avro_stream(
            spark, input_dir, schema, max_files_per_trigger,
            reader_schema=reader_schema,
        )
    raise ValueError(f"unsupported source format: {source_format}")


def _commit_epoch(
    staging: str, output_path: str, epoch_id: int, writer_id: str = ""
) -> None:
    """Move a staged epoch into the table under epoch-keyed file names.

    The idempotency protocol (the local-FS analog of a manifest commit;
    on an object store this is the Iceberg-append seam):

    1. the epoch is fully written to ``staging`` with the final layout;
    2. per partition directory, any file from a previous attempt of THIS
       epoch (``epoch-<id>-*``) is deleted — clearing partial commits;
    3. staged files are moved in under deterministic ``epoch-<id>-<k>``
       names.

    A crash at any point leaves either deletable partials keyed to the
    epoch or a completed commit; the checkpoint replays the same source
    offsets into the same epoch id, so recovery converges to exactly one
    copy of every record. Moves are metadata-only renames on a local FS —
    the data bytes are written once, by the executors, in step 1.

    ``writer_id`` namespaces both the replay-cleanup prefix and the final
    file names, so two streaming queries committing into the same table
    (distinct checkpoints) never delete or overwrite each other's epochs —
    each stream's epoch counter is private to its checkpoint.
    """
    wid = f"{writer_id}-" if writer_id else ""
    prefix = f"epoch-{wid}{epoch_id:010d}-"
    for part_dir in sorted(os.listdir(staging)):
        src_dir = os.path.join(staging, part_dir)
        if not os.path.isdir(src_dir) or part_dir.startswith(("_", ".")):
            continue
        dst_dir = os.path.join(output_path, part_dir)
        os.makedirs(dst_dir, exist_ok=True)
        for f in os.listdir(dst_dir):
            if f.startswith(prefix):
                os.remove(os.path.join(dst_dir, f))
        data_files = sorted(
            f for f in os.listdir(src_dir) if not f.startswith(("_", "."))
        )
        for k, f in enumerate(data_files):
            suffix = f.split(".", 1)[1] if "." in f else "parquet"
            os.replace(
                os.path.join(src_dir, f),
                os.path.join(dst_dir, f"{prefix}{k:05d}.{suffix}"),
            )
    shutil.rmtree(staging)


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
    # DataFrame — the reference's flushed block — sorted and written with
    # the same layout as the batch path. foreachBatch alone is at-least-once
    # (a crash between the write and the checkpoint offset commit replays
    # the epoch with fresh file names), so each epoch is staged and then
    # committed under epoch-keyed file names via _commit_epoch: a replayed
    # epoch first deletes its own partial files, making the table state
    # exactly-once once the stream recovers.
    # Writer identity = hash of the checkpoint dir: stable across restarts
    # of the same query (replayed epochs must regenerate their own prefix
    # to clean their partials) and distinct per concurrent writer, so two
    # streams ingesting into the same output path collide on neither the
    # staging dir nor the committed epoch file names.
    writer_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        staging = output_path.rstrip("/") + f".epoch-staging-{writer_id}"
        (
            batch_df.repartition(cfg.num_buckets, cfg.partition_column)
            .sortWithinPartitions(cfg.partition_column, cfg.key_column)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", cfg.max_rows_per_file)
            .option("compression", cfg.compression)
            .partitionBy(cfg.partition_column)
            .format(cfg.table_format)
            .save(staging)
        )
        _commit_epoch(staging, output_path, epoch_id, writer_id)

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
    tears down. On unclean shutdown the checkpoint replays unacknowledged
    epochs and the epoch-keyed commit (:func:`_commit_epoch`) makes the
    replay idempotent — no loss, no duplicates once the stream recovers.
    The reference loses open blocks on crash (no WAL; SURVEY.md §7.3).
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
