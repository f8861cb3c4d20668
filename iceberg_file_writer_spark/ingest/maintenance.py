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


def _partition_dir(base: str, cfg: IngestConfig, key) -> str:
    return os.path.join(base, f"{cfg.partition_column}={key}")


def recover_deletes(table_path: str) -> None:
    """Roll partition-level delete rewrites to a consistent state.

    The per-partition swap is two renames; a crash can strand a
    partition's committed data at ``<dir>.delete-old`` with nothing live
    (restore it), or leave ``.delete-old`` beside a live dir after the
    swap (the live dir is the new data — drop the old), or leave the
    staging root ``<table>.delete-tmp`` (incomplete rewrite — drop it and
    redo from the live table). Runs at every apply_deletes entry.
    """
    import shutil

    base = table_path.rstrip("/")
    tmp_root = base + ".delete-tmp"
    if os.path.exists(tmp_root):
        shutil.rmtree(tmp_root)
    if os.path.isdir(base):
        for name in os.listdir(base):
            if not name.endswith(".delete-old"):
                continue
            old = os.path.join(base, name)
            live = old[: -len(".delete-old")]
            if os.path.exists(live):
                shutil.rmtree(old)  # crashed after swap: live dir is current
            else:
                os.rename(old, live)  # crashed mid-swap: restore committed data


def apply_deletes(
    spark: SparkSession,
    table_path: str,
    keys: list,
    cfg: IngestConfig = IngestConfig(),
    predicate: str | None = None,
) -> dict:
    """Targeted copy-on-write delete: the GDPR/right-to-be-forgotten and
    retention-expiry primitive.

    ``keys`` are partition-column values (the reference's ``user_id``
    layout, main.go:50,78); ``predicate`` is an optional SQL condition —
    rows of the keyed partitions matching it are deleted (None = delete
    the whole partition).

    Scale shape — the point of the partition layout: the table is never
    scanned. Whole-partition deletes are metadata-only directory drops.
    Predicate deletes read ONLY the affected partitions' files (partition
    pruning by construction: the scan is rooted at those directories) in
    ONE Spark job however many keys there are, rewrite survivors with the
    layout invariants intact (key order, row bound, compression), and
    swap each partition in with the crash-recoverable two-rename protocol
    (:func:`recover_deletes`). Untouched partitions' files are never
    opened, rewritten, or even listed — asserted byte-for-byte in
    tests/test_maintenance_deletes.py. On Iceberg this operation is the
    delete-file / copy-on-write ``DELETE WHERE`` seam via TableFormat;
    row counts come from parquet footers, not data scans.
    """
    import shutil

    import pyarrow.parquet as pq

    recover_deletes(table_path)
    base = table_path.rstrip("/")
    stats = {"partitions_dropped": 0, "partitions_rewritten": 0, "rows_deleted": 0}

    def _footer_rows(d: str) -> int:
        return sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
            if not os.path.basename(p).startswith(("_", "."))
        )

    affected = [k for k in keys if os.path.isdir(_partition_dir(base, cfg, k))]
    if not affected:
        return stats

    # Captured before any file is dropped: if the delete removes the LAST
    # data file, a bare Hive-layout directory is unreadable (Spark cannot
    # infer a schema from zero files — found by the hypothesis property
    # suite with a delete-everything case). A zero-row keeper file with
    # the data schema, under one deleted key's own partition dir (so the
    # partition-column TYPE stays inferable from a value that actually
    # occurred), keeps "empty table" a readable state — the jar-free
    # stand-in for the metadata an Iceberg/Delta table retains when its
    # last data file is deleted.
    first_files = list_data_files(_partition_dir(base, cfg, affected[0]))
    keeper_schema = pq.ParquetFile(first_files[0]).schema_arrow if first_files else None

    def _keep_schema_if_empty() -> None:
        if keeper_schema is None or list_data_files(base):
            return
        keeper_dir = _partition_dir(base, cfg, affected[0])
        os.makedirs(keeper_dir, exist_ok=True)
        pq.write_table(
            keeper_schema.empty_table(),
            os.path.join(keeper_dir, "part-empty-keeper.snappy.parquet"),
            compression="snappy",
        )

    if predicate is None:
        for k in affected:
            d = _partition_dir(base, cfg, k)
            stats["rows_deleted"] += _footer_rows(d)
            shutil.rmtree(d)
            stats["partitions_dropped"] += 1
        _keep_schema_if_empty()
        return stats

    tmp_root = base + ".delete-tmp"
    # one job over the affected partitions only; basePath keeps the
    # partition column in the schema so the rewrite re-partitions by it
    survivors = (
        spark.read.option("basePath", base)
        .format(cfg.table_format)
        .load([_partition_dir(base, cfg, k) for k in affected])
        # IS NOT TRUE, not NOT(...): a NULL-valued predicate row is not
        # deleted by SQL DELETE semantics and must survive the rewrite
        .where(f"({predicate}) IS NOT TRUE")
    )
    (
        survivors.sortWithinPartitions(cfg.partition_column, cfg.key_column)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", cfg.max_rows_per_file)
        .option("compression", cfg.compression)
        .partitionBy(cfg.partition_column)
        .format(cfg.table_format)
        .save(tmp_root)
    )
    for k in affected:
        live = _partition_dir(base, cfg, k)
        staged = _partition_dir(tmp_root, cfg, k)
        before = _footer_rows(live)
        after = _footer_rows(staged) if os.path.isdir(staged) else 0
        if after == before:
            continue  # predicate matched nothing here: leave files untouched
        stats["rows_deleted"] += before - after
        old = live + ".delete-old"
        os.rename(live, old)
        if after:
            os.rename(staged, live)
            stats["partitions_rewritten"] += 1
        else:
            stats["partitions_dropped"] += 1
        shutil.rmtree(old)
    shutil.rmtree(tmp_root)
    _keep_schema_if_empty()
    return stats


def partition_file_counts(table_path: str) -> dict[str, int]:
    """Data-file count per partition directory (footer-free, listing only)."""
    counts: dict[str, int] = {}
    for p in list_data_files(table_path):
        d = os.path.dirname(p)
        counts[d] = counts.get(d, 0) + 1
    return counts


def recover_auto_compact(table_path: str) -> None:
    """Roll partition-level compaction rewrites to a consistent state.

    Same crash windows as :func:`recover_deletes`: a stranded
    ``<dir>.compact-old`` with nothing live is restored; one beside a
    live dir is dropped (the live dir is the committed rewrite); a
    leftover staging root ``<table>.autocompact-tmp`` is dropped (the
    rewrite never committed — the live partition is untouched).
    Runs at every auto_compact entry.
    """
    import shutil

    base = table_path.rstrip("/")
    tmp_root = base + ".autocompact-tmp"
    if os.path.exists(tmp_root):
        shutil.rmtree(tmp_root)
    if os.path.isdir(base):
        for name in os.listdir(base):
            if not name.endswith(".compact-old"):
                continue
            old = os.path.join(base, name)
            live = old[: -len(".compact-old")]
            if os.path.exists(live):
                shutil.rmtree(old)
            else:
                os.rename(old, live)


def auto_compact(
    spark: SparkSession,
    table_path: str,
    cfg: IngestConfig = IngestConfig(),
    min_files: int = 4,
    target_rows_per_file: int | None = None,
) -> list[str]:
    """Partition-selective small-file compaction (policy + rewrite).

    The operational form of compaction at scale: streaming ingest leaves
    one file per (micro-batch x partition), and rewriting the WHOLE table
    to fix a few hot partitions is exactly the scan compact_table pays.
    This scans nothing it doesn't rewrite: the policy reads only the
    directory listing (file counts), rewrites only partitions holding at
    least ``min_files`` data files, and swaps each via the same
    two-rename protocol as apply_deletes — untouched partitions stay
    byte-for-byte unopened. File count per rewritten partition comes
    from parquet footers (ceil(rows/target) range-partitioned files,
    key-ordered across files), never a data scan.

    Within one partition value the Morton key of a clustered table
    (cluster_by = (partition, key)) is monotone in the key column, so the
    per-partition key sort preserves a clustered layout too.

    Returns the list of rewritten partition directory names.
    """
    import math
    import shutil

    import pyarrow.parquet as pq

    recover_auto_compact(table_path)
    base = table_path.rstrip("/")
    target = target_rows_per_file or cfg.max_rows_per_file
    hot = sorted(
        d for d, c in partition_file_counts(base).items() if c >= min_files
    )
    if not hot:
        return []
    tmp_root = base + ".autocompact-tmp"
    os.makedirs(tmp_root)
    done: list[str] = []
    for pdir in hot:
        rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in list_data_files(pdir)
        )
        n_out = max(1, math.ceil(rows / target))
        staged = os.path.join(tmp_root, os.path.basename(pdir))
        df = spark.read.format(cfg.table_format).load(pdir)
        (
            df.repartitionByRange(n_out, cfg.key_column)
            .sortWithinPartitions(cfg.key_column)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", target)
            .option("compression", cfg.compression)
            .format(cfg.table_format)
            .save(staged)
        )
        old = pdir + ".compact-old"
        os.rename(pdir, old)
        os.rename(staged, pdir)
        shutil.rmtree(old)
        done.append(os.path.basename(pdir))
    shutil.rmtree(tmp_root, ignore_errors=True)
    return done


def storage_report(table_path: str) -> list[dict]:
    """Per-partition storage diagnostics from parquet FOOTERS only — the
    operational readout behind compaction/clustering decisions (which
    partitions have small files, poor compression, oversized rows)
    without reading a single data byte.

    Returns one dict per partition directory (top-level Hive key), each
    with: partition, n_files, n_rows, compressed_bytes,
    uncompressed_bytes, compression_ratio_permille (compressed/raw,
    exact integer), avg_rows_per_file, min/max file rows. At 100 TB this
    is a listing plus one footer read per file — the same metadata the
    auto_compact policy consumes, surfaced as a report.
    """
    import pyarrow.parquet as pq

    groups: dict[str, list[str]] = {}
    base = table_path.rstrip("/")
    for path in list_data_files(base):
        rel = os.path.relpath(path, base)
        part = rel.split(os.sep)[0] if os.sep in rel else "<root>"
        groups.setdefault(part, []).append(path)
    out = []
    for part in sorted(groups):
        rows = comp = raw = 0
        per_file_rows = []
        for path in groups[part]:
            md = pq.ParquetFile(path).metadata
            rows += md.num_rows
            per_file_rows.append(md.num_rows)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                comp += g.total_byte_size  # compressed on-disk pages
                raw += sum(
                    g.column(c).total_uncompressed_size
                    for c in range(g.num_columns)
                )
        out.append(
            {
                "partition": part,
                "n_files": len(groups[part]),
                "n_rows": rows,
                "compressed_bytes": comp,
                "uncompressed_bytes": raw,
                "compression_ratio_permille": (1000 * comp) // raw if raw else 0,
                "avg_rows_per_file": rows // len(groups[part]),
                "min_file_rows": min(per_file_rows),
                "max_file_rows": max(per_file_rows),
            }
        )
    return out


def vacuum(
    table_path: str,
    keep_last: int = 2,
    grace_seconds: int = 3600,
    staging_ttl_seconds: int = 86400,
) -> dict:
    """One-call table maintenance: expire old snapshots, then sweep every
    sidecar class their expiry orphaned — deletion-vector dirs,
    equality-delete dirs, bloom-index dirs (data files, sealed manifest
    segments, and crashed-writer staging debris are swept inside
    ``expire_snapshots`` itself). The Iceberg operational pairing of
    ``expire_snapshots`` + ``remove_orphan_files``, scheduled as one verb.

    Ordering matters and is fixed here so callers cannot get it wrong:
    snapshots first (that is what un-references the sidecars), sidecars
    after. Every sweep honors the same pre-commit grace TTL — an
    in-flight writer's not-yet-referenced artifacts are never collected —
    and tag-pinned snapshots keep every artifact they reference
    (``ingest/tags.py``). Safe to run concurrently with writers and with
    itself; each pass is independently idempotent.

    Returns the merged count report. At 100 TB this is the nightly
    janitor: cost is metadata listing + deletes, never a data scan.
    """
    from iceberg_file_writer_spark.ingest.bloom_index import expire_bloom_index
    from iceberg_file_writer_spark.ingest.deletion_vectors import (
        expire_deletion_vectors,
    )
    from iceberg_file_writer_spark.ingest.equality_deletes import (
        expire_equality_deletes,
    )
    from iceberg_file_writer_spark.ingest.snapshots import expire_snapshots

    report = expire_snapshots(
        table_path,
        keep_last=keep_last,
        staging_ttl_seconds=staging_ttl_seconds,
        data_grace_seconds=grace_seconds,
    )
    report["dropped_dv_dirs"] = expire_deletion_vectors(
        table_path, grace_seconds=grace_seconds
    )
    report["dropped_eq_dirs"] = expire_equality_deletes(
        table_path, grace_seconds=grace_seconds
    )
    report["dropped_bloom_dirs"] = expire_bloom_index(
        table_path, grace_seconds=grace_seconds
    )
    return report
