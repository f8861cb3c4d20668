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


def recover_compaction(table_path: str) -> None:
    """Roll the table to a consistent state after a compaction crash.

    The swap is two renames, so a crash can strand the committed data at
    ``.compact-old`` with nothing at ``table_path``; recovery restores it.
    A leftover ``.compact-tmp`` (incomplete rewrite) or ``.compact-old``
    beside a live table (crash after swap, before cleanup) is deleted.
    Runs automatically at every compact_table entry.
    """
    import shutil

    base = table_path.rstrip("/")
    old, tmp = base + ".compact-old", base + ".compact-tmp"
    if os.path.exists(old) and not os.path.exists(base):
        os.rename(old, base)  # crashed between the two swap renames
    if os.path.exists(old):
        shutil.rmtree(old)  # crashed after swap: table is the new data
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # incomplete rewrite: redo from the live table
    # a _SUCCESS-less table dir would mean a torn batch write; Spark's own
    # commit protocol prevents that for the save() below.


def compact_table(
    spark: SparkSession,
    table_path: str,
    cfg: IngestConfig = IngestConfig(),
    target_rows_per_file: int | None = None,
) -> None:
    """Read-rewrite compaction keeping layout invariants.

    At scale this is the periodic job that bounds file counts after
    streaming ingest; `maxRecordsPerFile` keeps the reference's row bound
    (or a larger compaction target), and the per-partition sort keeps key
    order. The rewrite is staged to ``.compact-tmp``, then swapped in via
    two renames with :func:`recover_compaction` covering every crash
    window — so a failed compaction is always recoverable, never silent
    data loss.

    Local-filesystem semantics only: the swap assumes POSIX rename and a
    maintenance window (concurrent readers can observe the table missing
    for the instant between the renames). On an object store this
    operation is the Iceberg ``rewrite_data_files`` seam — a manifest
    commit, not directory renames — via the TableFormat module.
    """
    recover_compaction(table_path)
    target = target_rows_per_file or cfg.max_rows_per_file
    base = table_path.rstrip("/")
    tmp = base + ".compact-tmp"
    from iceberg_file_writer_spark.ingest.batch import apply_layout

    df = spark.read.format(cfg.table_format).load(table_path)
    (
        # apply_layout preserves the table's configured layout, including
        # a cluster_by z-order — compaction must not degrade a clustered
        # table to the single-key stripe layout.
        apply_layout(df, cfg)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target)
        .option("compression", cfg.compression)
        .partitionBy(cfg.partition_column)
        .format(cfg.table_format)
        .save(tmp)
    )
    import shutil

    old = base + ".compact-old"
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
