"""Merge-on-read DELETE / UPSERT via equality deletes [extension].

Positional deletion vectors (ingest/deletion_vectors.py) tombstone
*row addresses*, which the writer can only learn by SCANNING the table
for matching rows — fine for predicate deletes, wrong for the streaming
upsert a CDC ingest pipeline issues at high frequency: reading the
standing table per batch makes batch cost O(table). Equality deletes
(Iceberg v2's second delete-file type, the format Flink's upsert writer
emits) tombstone *key values* instead:

- **a delete file** holds distinct key tuples plus a data sequence
  number; a data row is deleted iff its key equals some delete row AND
  its file's sequence number is STRICTLY BELOW the delete's
  (``snapshots._read_files`` / ``_apply_equality_deletes``).
- **an upsert commit** pairs one equality-delete file (the batch's
  keys, seq = v) with the batch's new data files (also seq = v) in a
  single snapshot: old rows for those keys die, the new rows — equal
  seq, not below — survive. Cost is O(batch): the standing table is
  NEVER read, which is the whole point at 100 TB.
- **read cost** grows by one keys-distinct broadcast equi-join (the
  key relation pre-aggregates to ``key -> max seq``, so "exists a
  newer delete" is one join + filter, never a non-equi anti-join)
  until ``commit_compact`` materializes the applied state and retires
  the delete files (``eqs: []``).
- **time travel** replays each snapshot's exact delete-file set;
  ``changes_between`` derives carried-file visibility under both
  versions' full MoR state (``snapshots._carried_mor_delta``), so an
  upsert reads back as its '-' old row / '+' new row changelog pair.
- **all key columns must match** across a table's delete files
  (enforced here): one consistent equality contract per table, which
  keeps every read a single join. NULL keys never match (SQL
  equality) — upsert keys should be non-null, as in Iceberg.

Reference scope note: the reference (/root/reference/main.go) is
append-only; this is the keyed-mutation layer its partition-by-user_id
layout (main.go:50,78) points toward. [extension]
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import (
    _commit,
    _write_data_files,
    current_version,
    read_manifest,
)

_EQ_DIR = "eq"


def _check_cols(m: dict, cols: list[str]) -> list[dict]:
    eqs = m.get("eqs") or []
    if eqs and eqs[0]["cols"] != cols:
        raise ValueError(
            f"table's equality-delete key is {eqs[0]['cols']}, got {cols} "
            "— one consistent key set per table (keeps reads a single join)"
        )
    return eqs


def _write_eq_file(
    spark: SparkSession, table_path: str, keys: DataFrame
) -> "tuple[str, int]":
    """Write the distinct key tuples as an equality-delete parquet dir;
    returns (relative path, row count). Distributed write — never a
    driver collect."""
    rel = f"{_EQ_DIR}/eq-{uuid.uuid4().hex}"
    keys.distinct().write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(os.path.join(table_path, rel))
    import pyarrow.parquet as pq

    d = os.path.join(table_path, rel)
    n = sum(
        pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    return rel, n


def _keys_from_written(
    spark: SparkSession,
    table_path: str,
    new: "list[dict]",
    df: DataFrame,
    key_cols: "list[str]",
) -> DataFrame:
    """The upsert batch's key tuples, read back from the data files the
    commit just wrote instead of re-executing the batch plan.

    An upsert runs two write jobs (data files, then the equality-delete
    keys); deriving the second from the first's immutable output halves
    the per-commit compute — the batch lineage (a streaming micro-batch's
    window, a CDC reduction) executes once, and the key job becomes a
    batch-sized local parquet read (r13 optimization; guide §1.2 /
    §2.3 "shuffle keys instead of payloads"). Falls back to the original
    plan when the batch wrote no files (empty batch)."""
    if not new:
        return df.select(*key_cols)
    from iceberg_file_writer_spark.ingest.snapshots import fast_parquet_schema

    paths = [os.path.join(table_path, e["path"]) for e in new]
    # the files were written by THIS commit moments ago — their Spark
    # schema comes from one pyarrow footer read, not a JVM inference
    # pass over the set (r14, guide §5)
    sch = fast_parquet_schema(paths[0])
    reader = spark.read.schema(sch) if sch is not None else spark.read
    return reader.parquet(*paths).select(*key_cols)


def commit_delete_keys(
    spark: SparkSession, table_path: str, keys: DataFrame
) -> int:
    """Merge-on-read DELETE by key: every current row whose key tuple
    appears in ``keys`` (columns = the key columns) is tombstoned.
    O(|keys|) write, zero table reads, zero files rewritten."""
    parent = current_version(table_path)
    m = read_manifest(table_path, parent) if parent else {}
    cols = list(keys.columns)
    eqs = _check_cols(m, cols)
    rel, n = _write_eq_file(spark, table_path, keys)
    if n == 0:
        shutil.rmtree(os.path.join(table_path, rel))
        return _commit(
            table_path, parent, "eq_delete", m.get("files") or [],
            extra={"eqs": eqs},
        )
    version = parent + 1  # optimistic: _commit raises on conflict
    entry = {"path": rel, "seq": version, "cols": cols, "rows": n}
    return _commit(
        table_path, parent, "eq_delete", m.get("files") or [],
        extra={"eqs": eqs + [entry]},
    )


def commit_upsert(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    key_cols: "list[str]",
    max_rows: int = 4096,
    extra: "dict | None" = None,
) -> int:
    """One-commit MERGE-on-read upsert: rows of ``df`` replace same-key
    current rows and insert otherwise — without reading the table.

    The commit pairs an equality-delete file (df's distinct keys,
    seq = v) with df's new data files (seq = v): strict ``delete.seq >
    file.seq`` kills every OLDER row for those keys and spares the new
    ones. ``df`` must hold at most one row per key (two same-key rows
    in one batch would both survive); reduce the batch first — that is
    batch-local work, O(batch)."""
    parent = current_version(table_path)
    m = read_manifest(table_path, parent) if parent else {}
    eqs = _check_cols(m, list(key_cols))
    from iceberg_file_writer_spark.ingest.snapshots import _apply_standing_spec

    new = _write_data_files(
        _apply_standing_spec(df, m), table_path, max_rows
    )
    rel, n = _write_eq_file(
        spark, table_path, _keys_from_written(spark, table_path, new, df, key_cols)
    )
    version = parent + 1
    eq_entry = {
        "path": rel, "seq": version, "cols": list(key_cols), "rows": n,
    }
    return _commit(
        table_path,
        parent,
        "upsert_mor",
        (m.get("files") or []) + new,
        extra={"eqs": eqs + ([eq_entry] if n else []), **(extra or {})},
    )


def streaming_upsert_sink(
    table_path: str, key_cols: "list[str]", max_rows: int = 4096
):
    """foreachBatch callback: exactly-once merge-on-read upserts.

    The streaming analog of ``snapshots.streaming_append_sink``, but each
    micro-batch is a keyed MERGE instead of an append: ``commit_upsert``
    pairs the batch's data files with an equality-delete file in one
    snapshot, so per-batch cost is O(batch) — the standing table is never
    read, which is what a CDC upsert stream needs at 100 TB (contrast the
    read-merge-rewrite state sink in queries/streaming_ops.run_cdc_upsert,
    whose per-batch cost is O(state)).

    Exactly-once composes the same way as the append sink: the cumulative
    ``batch_ids`` ledger rides every commit, so a micro-batch replayed
    after a checkpoint recovery is recognized and skipped instead of
    double-applied (an upsert is NOT idempotent against history — a replay
    would bump the delete sequence number and shadow interleaved writers).

    The caller must reduce each batch to at most one row per key before
    the stream (or in a prior transform): blind upsert applies batches in
    arrival order, the contract a per-key-ordered CDC source (a keyed
    Kafka topic, a Flink upsert changelog) provides.
    """
    from iceberg_file_writer_spark.ingest.snapshots import seen_batch_ids

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        parent = current_version(table_path)
        seen = seen_batch_ids(table_path, parent)
        if batch_id in seen:
            return
        commit_upsert(
            batch_df.sparkSession,
            table_path,
            batch_df,
            key_cols,
            max_rows=max_rows,
            extra={
                "batch_id": batch_id,
                "batch_ids": sorted(seen | {batch_id}),
            },
        )

    return _sink


def eq_stats(table_path: str, version: int | None = None) -> dict:
    """Observability: equality-tombstone volume in force at a version —
    the compaction trigger input (pairs with deletion_vectors.dv_stats)."""
    v = current_version(table_path) if version is None else version
    eqs = read_manifest(table_path, v).get("eqs") or []
    return {
        "n_eq_files": len(eqs),
        "eq_key_rows": sum(e.get("rows", 0) for e in eqs),
        "cols": eqs[0]["cols"] if eqs else None,
    }


def expire_equality_deletes(
    table_path: str, grace_seconds: int = 3600
) -> int:
    """GC equality-delete dirs referenced by no retained manifest (run
    after ``expire_snapshots``; same pre-commit grace discipline as
    data files and positional DVs — a dir younger than the grace may
    belong to an in-flight commit)."""
    import json
    import time

    from iceberg_file_writer_spark.ingest.snapshots import _snap_dir

    root = os.path.join(table_path, _EQ_DIR)
    if not os.path.isdir(root):
        return 0
    live: set[str] = set()
    snap = _snap_dir(table_path)
    for name in os.listdir(snap):
        # main manifests AND WAP branch manifests pin their eq files
        if name.endswith(".json") and (
            name.startswith("v") or name.startswith("branch-")
        ):
            with open(os.path.join(snap, name)) as f:
                live |= {
                    e["path"] for e in json.load(f).get("eqs") or []
                }
    dropped = 0
    now = time.time()
    for name in os.listdir(root):
        rel = f"{_EQ_DIR}/{name}"
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
