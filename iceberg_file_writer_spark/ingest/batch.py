"""Batch ingestion: the reference pipeline as one declarative write.

Reference semantics reproduced (SURVEY.md §2.3 checklist):

1. partition completeness — every record lands in exactly one file under
   its partition value (reference main.go:50,78 → ``partitionBy``);
2. file row bound — ≤ ``max_rows_per_file`` rows per file (reference
   main.go:76 ``BlockManager.MaxSize`` → ``maxRecordsPerFile``);
3. intra-file key ordering — rows non-decreasing in the key column
   (reference main.go:51,79 → ``sortWithinPartitions``);
4. snappy compression (reference main.go:52 → ``option("compression")``);
5. schema fidelity incl. Avro-style defaults (reference main.go:19-41 →
   declared schema + ``coalesce`` normalization).

Scale notes: the one shuffle is ``repartition(num_buckets, partition_col)``
— co-locating each entity's rows so a partition value's files are written
by one task (the reference's one-block-per-partition-value invariant,
main.go:78). ``num_buckets`` bounds task count independently of entity
cardinality; a hot entity is still bounded by maxRecordsPerFile per file,
and AQE rebalances moderately skewed writes. The sort is within partitions
only — never a global sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_file_writer_spark.schemas import (
    DEFAULT_COMPRESSION,
    DEFAULT_KEY_COLUMN,
    DEFAULT_MAX_ROWS_PER_FILE,
    DEFAULT_PARTITION_COLUMN,
    LOCATION_DEFAULTS,
    LOCATION_SCHEMA,
)


@dataclass(frozen=True)
class IngestConfig:
    """The reference's configuration surface (main.go:47-85) as one struct."""

    partition_column: str = DEFAULT_PARTITION_COLUMN  # BlockManager.PartitionColumn
    key_column: str = DEFAULT_KEY_COLUMN  # BlockManager.KeyColumn
    max_rows_per_file: int = DEFAULT_MAX_ROWS_PER_FILE  # BlockManager.MaxSize
    compression: str = DEFAULT_COMPRESSION  # FilesystemStorageAdapter.CompressionName
    table_format: str = "parquet"  # TableFormat seam: "avro"/"iceberg" when jars exist
    num_buckets: int = 32  # write-parallelism bound (not in reference: single-proc)
    # Two-column z-order layout (generalizes the reference's single
    # key_column sort, main.go:50-51,78-79): rows are range-partitioned and
    # sorted by the Morton interleave of these columns, giving every file a
    # tight bounding box in BOTH — file-level zone maps then prune on
    # either. None = the reference's plain key_column layout.
    cluster_by: tuple[str, str] | None = None


def normalize_defaults(df: DataFrame, defaults: dict[str, object] | None = None) -> DataFrame:
    """Apply Avro-style field defaults (reference main.go:23-26,36-37).

    Spark readers don't apply Avro defaults to present-but-null fields, so
    ingestion normalizes with ``coalesce(col, default)`` for non-null
    defaults (null defaults are already the column value).
    """
    defaults = LOCATION_DEFAULTS if defaults is None else defaults
    out = df
    for name, default in defaults.items():
        if default is not None and name in df.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out


def read_source(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType = LOCATION_SCHEMA,
    source_format: str = "json",
    reader_schema: "dict | None" = None,
) -> DataFrame:
    """Ops #1-#2: schema-enforced scan (reference FileStreamAdapter + codec,
    main.go:61-70; strict decode ≈ FAILFAST).

    ``avro`` is the reference's literal wire format (Avro object-container
    files, main.go:61-65); it resolves through the TableFormat seam and
    raises the actionable missing-jar error when spark-avro is absent.

    ``reader_schema`` (avro only): an Avro record-schema dict applied
    through the spec's Schema Resolution rules — reader defaults fill
    fields the writer never had, numeric/string-bytes promotions apply,
    reader-field ``aliases`` track renames — so one read spans an
    evolved stream's old- and new-schema files. The reference's driver
    never evolves its schema (main.go:19-41); a real stream does.
    """
    from iceberg_file_writer_spark.ingest.table_format import require_format

    if reader_schema is not None and source_format != "avro":
        raise ValueError("reader_schema applies to the avro source only")
    reader = spark.read.schema(schema)
    if source_format == "json":
        return reader.option("mode", "FAILFAST").json(input_path)
    if source_format == "parquet":
        return reader.parquet(input_path)
    if source_format == "csv":
        # CSV cells are scalars; nested/array fields have no standard CSV
        # encoding, so reject them loudly rather than silently mangle
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        ]
        if nested:
            raise ValueError(
                f"csv source supports flat schemas only; nested fields: {nested} "
                "(use json/parquet, or flatten upstream)"
            )
        return reader.option("mode", "FAILFAST").option("header", "true").csv(
            input_path
        )
    if source_format == "avro":
        try:
            require_format(spark, "avro")
            fmt = reader.format("avro")
            if reader_schema is not None:
                # spark-avro's own resolution hook takes the reader
                # schema as JSON text
                import json as _json

                fmt = fmt.option("avroSchema", _json.dumps(reader_schema))
            return fmt.load(input_path)
        except RuntimeError:
            # no spark-avro jar: the clean-room pure-Python container
            # reader (ingest/avro_py.py) — same bytes, same FAILFAST
            # strictness, file-granular parallelism via binaryFile
            from iceberg_file_writer_spark.ingest.avro_py import (
                spark_read_avro,
            )

            return spark_read_avro(
                spark, input_path, schema, reader_schema=reader_schema
            )
    raise ValueError(f"unsupported source format: {source_format}")


CORRUPT_COLUMN = "_corrupt_record"


def read_source_with_quarantine(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType = LOCATION_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter decode: (valid, quarantined) instead of FAILFAST's stop.

    The reference decodes strictly and halts on the first undecodable
    record (goavro codec error path, main.go:66-69) — correct for a test
    driver, fatal for a 100 TB ingest where one bad byte must not kill
    the stream. PERMISSIVE mode routes undecodable lines into the
    corrupt-record column; the split preserves the raw payload verbatim
    so quarantined records can be replayed after a fix.

    Semantics: syntactically bad JSON and type-mismatched fields
    quarantine; *missing* fields decode as null (schema defaults then
    apply via normalize_defaults) — the Avro-default contract.

    The one-pass cache is load-bearing: Spark disallows filtering the
    corrupt column straight off a JSON scan (the parser would need the
    raw line after pruning dropped it), and without it each branch would
    re-parse the input anyway.
    """
    aug = T.StructType(schema.fields + [T.StructField(CORRUPT_COLUMN, T.StringType())])
    df = (
        spark.read.schema(aug)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COLUMN)
        .json(input_path)
        .cache()
    )
    good = df.where(F.col(CORRUPT_COLUMN).isNull()).drop(CORRUPT_COLUMN)
    bad = df.where(F.col(CORRUPT_COLUMN).isNotNull()).select(
        F.col(CORRUPT_COLUMN).alias("raw_record"),
        F.input_file_name().alias("source_file"),
    )
    return good, bad


def ingest_batch_with_quarantine(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    quarantine_path: str,
    cfg: IngestConfig = IngestConfig(),
    defaults: dict[str, object] | None = None,
    schema: T.StructType = LOCATION_SCHEMA,
) -> tuple[int, int]:
    """Quarantining end-to-end ingest: valid records get the full
    partition/order/bound write, undecodable lines land as text under
    ``quarantine_path`` with their source file recorded. Returns
    (rows_ingested, rows_quarantined)."""
    good, bad = read_source_with_quarantine(spark, input_path, schema)
    ingest_batch(good, output_path, cfg, defaults)
    bad.write.mode("overwrite").json(quarantine_path)
    n_bad = spark.read.json(quarantine_path).count()
    n_good = read_table(spark, output_path, cfg).count()
    return n_good, n_bad


def apply_layout(df: DataFrame, cfg: IngestConfig) -> DataFrame:
    """The partition + order step, shared by ingest and compaction.

    Plain layout: hash-repartition on the partition column, rows sorted
    by (partition, key) — the reference's layout (main.go:50-51,78-79).
    With ``cluster_by``: one bounds pass (broadcast back), then a range
    shuffle on the Morton key — same single-shuffle budget, but the
    written files tile the (cluster_by[0], cluster_by[1]) plane instead
    of striping it. The key is dropped after ordering; projection
    preserves the sort, so it never lands in the table schema.
    """
    if cfg.cluster_by is not None:
        from iceberg_file_writer_spark.operators.zorder import with_zorder_key

        return (
            with_zorder_key(df, cfg.cluster_by, key_name="__zkey")
            .repartitionByRange(cfg.num_buckets, cfg.partition_column, "__zkey")
            .sortWithinPartitions(cfg.partition_column, "__zkey")
            .drop("__zkey")
        )
    return df.repartition(
        cfg.num_buckets, F.col(cfg.partition_column)
    ).sortWithinPartitions(cfg.partition_column, cfg.key_column)


def ingest_batch(
    df: DataFrame,
    output_path: str,
    cfg: IngestConfig = IngestConfig(),
    defaults: dict[str, object] | None = None,
) -> dict[str, object]:
    """Ops #3-#5, #7, #8: partition, order, bound, compress, write, commit.

    Batch write is atomic per job (the _SUCCESS commit protocol) — the
    reference's CommitBlocks(force=true) final flush (main_test.go:86)
    is implied by job completion.

    Returns write-job metrics observed IN the write job itself (Spark's
    Observation API): rows written, distinct-partition estimate, and the
    key column's min/max. At 100 TB a ``count()`` after the write would
    re-scan the table to learn what the write job already knew — observe()
    rides the existing job for free, which is why ingestion pipelines use
    it as the completeness/monitoring hook (the reference's only signal
    was its ``Finished`` channel, main.go:83).
    """
    from pyspark.sql import Observation

    from iceberg_file_writer_spark.ingest.table_format import require_format

    if cfg.table_format == "iceberg":
        raise ValueError(
            "iceberg writes commit through a catalog table, not a filesystem "
            "path: use write_iceberg_table(df, 'catalog.db.table', cfg)"
        )
    if cfg.table_format == "avro":
        try:
            require_format(df.sparkSession, "avro")
        except RuntimeError:
            # no spark-avro jar: the clean-room writer produces the
            # reference's literal output (Hive dirs of key-sorted,
            # row-bounded, snappy Avro containers) without it
            from iceberg_file_writer_spark.ingest.avro_py import (
                write_avro_partitioned,
            )

            return write_avro_partitioned(
                apply_layout(normalize_defaults(df, defaults), cfg),
                output_path,
                cfg,
            )
    else:
        require_format(df.sparkSession, cfg.table_format)
    obs = Observation("ingest")
    out = apply_layout(normalize_defaults(df, defaults), cfg).observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.approx_count_distinct(cfg.partition_column).alias("approx_partitions"),
        F.min(cfg.key_column).alias("min_key"),
        F.max(cfg.key_column).alias("max_key"),
    )
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", cfg.max_rows_per_file)
        .option("compression", cfg.compression)
        .partitionBy(cfg.partition_column)
        .format(cfg.table_format)
        .save(output_path)
    )
    return obs.get


def write_iceberg_table(
    df: DataFrame,
    table_identifier: str,
    cfg: IngestConfig = IngestConfig(),
    defaults: dict[str, object] | None = None,
) -> None:
    """The Iceberg-native write path (BASELINE "DataFrame write with Iceberg
    format connector"): same partition/order/bound semantics as
    :func:`ingest_batch`, committed through an Iceberg catalog table via
    ``writeTo(...).partitionedBy(...)`` — snapshot-isolated, atomic, and
    object-store-safe (manifest commit, no directory renames).

    Requires the iceberg-spark-runtime jar + a configured catalog; raises
    the seam's actionable error otherwise. ``table_identifier`` is a
    catalog identifier like ``local.db.events``, not a path.
    """
    from pyspark.sql.functions import col

    from iceberg_file_writer_spark.ingest.table_format import require_format

    require_format(df.sparkSession, "iceberg")
    out = (
        normalize_defaults(df, defaults)
        .repartition(cfg.num_buckets, F.col(cfg.partition_column))
        .sortWithinPartitions(cfg.partition_column, cfg.key_column)
    )
    (
        # .using("iceberg"): require_format only proves the jar is on the
        # classpath; without an explicit provider a table identifier that
        # resolves to a non-Iceberg catalog (e.g. spark_catalog) would
        # silently create a table with the session default provider
        # (parquet). Pinning the provider makes that misconfiguration fail
        # loudly instead.
        out.writeTo(table_identifier)
        .using("iceberg")
        .partitionedBy(col(cfg.partition_column))
        .tableProperty("write.format.default", "parquet")
        .tableProperty("write.parquet.compression-codec", cfg.compression)
        .option("maxRecordsPerFile", str(cfg.max_rows_per_file))
        .createOrReplace()
    )


def read_table(spark: SparkSession, path: str, cfg: IngestConfig = IngestConfig()) -> DataFrame:
    """Scan of the ingested table; partition pruning fires on the
    partition column, row-group min/max pruning on the sorted key column."""
    return spark.read.format(cfg.table_format).load(path)
