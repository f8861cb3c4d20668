"""Table maintenance: compaction and file inventory.

The Parquet stand-in for Iceberg's ``rewrite_data_files`` — the
reference's commit/force-flush lifecycle (main_test.go:86) generalized to
table upkeep. Streaming ingest produces one file per (micro-batch ×
partition value); compaction rewrites each partition's many small sorted
files into few large sorted files, preserving every §2.3 invariant
(row bound, key order, compression, partition completeness).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from iceberg_file_writer_spark.ingest.batch import IngestConfig


def list_data_files(table_path: str) -> list[str]:
    """All parquet data files of a Hive-layout table."""
    return sorted(
        p
        for p in glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(p).startswith(("_", "."))
    )


def compact_table(
    spark: SparkSession,
    table_path: str,
    cfg: IngestConfig = IngestConfig(),
    target_rows_per_file: int | None = None,
) -> None:
    """Read-rewrite compaction keeping layout invariants.

    At scale this is the periodic job that bounds file counts after
    streaming ingest; `maxRecordsPerFile` keeps the reference's row bound
    (or a larger compaction target), the per-partition sort keeps key
    order, and the rewrite is staged through a temp dir then swapped so a
    failed compaction never corrupts the table.
    """
    target = target_rows_per_file or cfg.max_rows_per_file
    tmp = table_path.rstrip("/") + ".compact-tmp"
    df = spark.read.format(cfg.table_format).load(table_path)
    (
        df.repartition(cfg.num_buckets, cfg.partition_column)
        .sortWithinPartitions(cfg.partition_column, cfg.key_column)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target)
        .option("compression", cfg.compression)
        .partitionBy(cfg.partition_column)
        .format(cfg.table_format)
        .save(tmp)
    )
    import shutil

    old = table_path.rstrip("/") + ".compact-old"
    os.rename(table_path, old)
    os.rename(tmp, table_path)
    shutil.rmtree(old)
