"""Merge-on-read DELETE via deletion vectors [extension].

Copy-on-write DELETE (``snapshots.commit_delete_where``) rewrites every
file containing a matching row — right when deletes are rare or dense,
wrong for the high-frequency sparse deletes a compliance pipeline
issues (GDPR erasure of single users across a 100 TB corpus would
rewrite almost every file for a handful of rows each). Merge-on-read
inverts the cost: the DELETE commit writes only a positional tombstone
relation — (file_name, row_index) pairs, O(deleted rows) bytes — and
every reader anti-joins it (``snapshots._read_files``), so:

- **DELETE cost** is one predicate scan plus a tombstone write; no data
  file is rewritten, carried files stay by reference.
- **read cost** grows by one anti-join against the deletion-sized DV
  relation until ``commit_compact`` materializes the applied state and
  retires the tombstones (``dvs: []``) — the standard MoR/CoW
  compaction contract (Iceberg v2 position deletes, Delta DVs).
- **time travel** is exact: each snapshot lists the DV set in force at
  that version, so version v replays with exactly v's tombstones.
- **CoW interplay** is sound: CoW delete/merge read affected files
  DV-applied before rewriting, and carried DV entries for rewritten
  files go inert (uuid file names never recur); ``_commit`` carries the
  DV list forward through unrelated appends.

Row addressing uses ``_metadata.file_name`` + ``_metadata.row_index``
(stable physical positions of immutable files). Tombstones are written
DISTRIBUTED (a Spark write, never a driver collect) under ``dv/`` and
expire sweeps unreferenced DV dirs with the same pre-commit grace as
data files.

Reference scope note: the reference (/root/reference/main.go) is
append-only with no delete concept; this is the deletion layer a
governed corpus needs above that write path. [extension]
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import (
    _commit,
    _read_files,
    current_version,
    read_manifest,
)

_DV_DIR = "dv"


def commit_delete_where_mor(
    spark: SparkSession, table_path: str, predicate: str
) -> int:
    """Merge-on-read DELETE: commit positional tombstones for matching
    rows; zero data files rewritten. Already-deleted rows are not
    re-tombstoned (the predicate scan is DV-applied)."""
    parent = current_version(table_path)
    m = read_manifest(table_path, parent)
    files, dvs = m["files"], m.get("dvs") or []
    if not files:
        return _commit(table_path, parent, "delete_mor", [])

    hits = (
        _read_files(spark, table_path, files, dvs, with_position=True)
        .where(predicate)
        .select(
            F.col("_pos_fn").alias("file_name"),
            F.col("_pos_ri").alias("row_index"),
        )
    )
    dv_rel = f"{_DV_DIR}/dv-{uuid.uuid4().hex}"
    hits.write.mode("overwrite").option("compression", "snappy").parquet(
        os.path.join(table_path, dv_rel)
    )
    # empty tombstone sets still commit (predicate matched nothing) but
    # carry the parent's DV list unchanged — and drop the empty dir
    import pyarrow.parquet as pq

    n = sum(
        pq.ParquetFile(os.path.join(table_path, dv_rel, f)).metadata.num_rows
        for f in os.listdir(os.path.join(table_path, dv_rel))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if n == 0:
        shutil.rmtree(os.path.join(table_path, dv_rel))
        return _commit(
            table_path, parent, "delete_mor", files, extra={"dvs": dvs}
        )
    return _commit(
        table_path, parent, "delete_mor", files, extra={"dvs": dvs + [dv_rel]}
    )


def dv_stats(table_path: str, version: int | None = None) -> dict:
    """Observability: tombstone volume in force at a version — the
    compaction trigger input."""
    import pyarrow.parquet as pq

    v = current_version(table_path) if version is None else version
    dvs = read_manifest(table_path, v).get("dvs") or []
    rows = 0
    for rel in dvs:
        d = os.path.join(table_path, rel)
        for f in os.listdir(d):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                rows += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
    return {"n_dvs": len(dvs), "tombstone_rows": rows}


def expire_deletion_vectors(
    table_path: str, grace_seconds: int = 3600
) -> int:
    """GC DV dirs referenced by no retained manifest (run after
    ``expire_snapshots``; same pre-commit grace discipline)."""
    from iceberg_file_writer_spark.ingest.snapshots import _snap_dir

    import json

    root = os.path.join(table_path, _DV_DIR)
    if not os.path.isdir(root):
        return 0
    live: set[str] = set()
    snap = _snap_dir(table_path)
    for name in os.listdir(snap):
        # main manifests AND WAP branch manifests pin their DV dirs
        if name.endswith(".json") and (
            name.startswith("v") or name.startswith("branch-")
        ):
            with open(os.path.join(snap, name)) as f:
                live |= set(json.load(f).get("dvs") or [])
    dropped = 0
    now = time.time()
    for name in os.listdir(root):
        rel = f"{_DV_DIR}/{name}"
        full = os.path.join(root, name)
        if rel in live:
            continue
        try:
            if now - os.path.getmtime(full) > grace_seconds:
                shutil.rmtree(full)
                dropped += 1
        except FileNotFoundError:
            pass
    return dropped
