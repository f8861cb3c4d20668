"""Incremental equi-join view maintenance [extension — not in reference].

The incremental family so far maintains AGGREGATES (ingest/incremental.py
daily rollup); this maintains a materialized JOIN — e.g. orders joined to
customer — under both change sources a 100 TB pipeline sees, without ever
re-joining history:

- **fact appends** (the common case): the delta view is just
  ``fact_batch JOIN dim`` — batch-sized work, broadcast dim side — and
  its files APPEND into their bucket directories. Cost O(|batch|),
  independent of the standing view's size.
- **dim updates** (slowly changing dimension): the view is partitioned
  by ``kb = dim_key % JV_BUCKETS``, so only buckets containing a changed
  key are recomputed (facts pruned to those buckets re-join the updated
  dim) and swapped in; untouched buckets keep their bytes
  (mtime-asserted in tests/test_join_view.py). Cost O(affected buckets),
  not O(view).

Both refreshers commit under the rollup's marker/roll-forward crash
protocol (ingest/ledger.py): stage everything, fsync an atomic marker,
run an idempotent commit phase; recovery rolls back pre-marker and
forward post-marker, and a ``batch_id`` makes caller retries
exactly-once via the bounded ledger. Equality with a from-scratch
``facts JOIN dim`` recompute after any interleaving of fact/dim batches
(including replays and injected crashes) is the pytest contract.

At 100 TB scale notes: bucket count sizes to |dim| / O(10^6) (here 16
for test corpora); the fact-append path never reads the standing view at
all; the dim-update path reads only the affected buckets' fact rows —
with the facts source itself partitioned/bucketed by the key, that read
prunes server-side too.

Reference scope note: the reference (/root/reference/main.go:47-54)
writes partitioned record files only; this derives a maintained join
artifact from that write path. [extension]
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.ledger import (
    ledger_add,
    ledger_contains,
    write_atomic,
)

JV_BUCKETS = 16

# Out-of-band already-applied sentinel: a caller's real batch_id can be any
# string (including "SKIP"), so replay detection must not use an in-band
# string value.
_SKIP = object()


def _with_bucket(df: DataFrame, key: str) -> DataFrame:
    return df.withColumn("kb", F.pmod(F.col(key), F.lit(JV_BUCKETS)))


def init_join_view(
    spark: SparkSession,
    facts: DataFrame,
    dim: DataFrame,
    view_path: str,
    key: str,
) -> None:
    """Materialize ``facts JOIN dim USING (key)`` partitioned by
    ``kb = key % JV_BUCKETS``."""
    _with_bucket(facts.join(dim, key), key).write.mode("overwrite").option(
        "compression", "snappy"
    ).partitionBy("kb").parquet(view_path)


def read_join_view(spark: SparkSession, view_path: str) -> DataFrame:
    return spark.read.parquet(view_path).drop("kb")


def _commit_join_view(base: str) -> None:
    """Idempotent commit phase (runs under the marker; re-runnable from
    any crash point): move staged append files into their bucket dirs,
    swap staged bucket replacements, record the batch id, clean up,
    drop the marker."""
    tmp = base + ".jv-tmp"
    app = os.path.join(tmp, "append")
    if os.path.isdir(app):
        for part in sorted(os.listdir(app)):
            src_dir = os.path.join(app, part)
            if not part.startswith("kb=") or not os.path.isdir(src_dir):
                continue
            dst_dir = os.path.join(base, part)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in sorted(os.listdir(src_dir)):
                if fname.endswith(".parquet") and not fname.startswith(("_", ".")):
                    os.rename(
                        os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
                    )
    swp = os.path.join(tmp, "swap")
    if os.path.isdir(swp):
        for part in sorted(os.listdir(swp)):
            if not part.startswith("kb="):
                continue
            live = os.path.join(base, part)
            staged = os.path.join(swp, part)
            old = live + ".jv-old"
            if os.path.isdir(live):
                os.rename(live, old)
            os.rename(staged, live)
            if os.path.isdir(old):
                shutil.rmtree(old)
    # a bucket whose staged dir is gone already swapped; its .jv-old may
    # remain from a crash between its two renames' cleanup
    if os.path.isdir(base):
        for name in os.listdir(base):
            if name.endswith(".jv-old"):
                shutil.rmtree(os.path.join(base, name))
    marker = base + ".jv-commit"
    if os.path.exists(marker):
        with open(marker) as f:
            batch_id = f.read().strip()
        if batch_id:
            ledger_add(base + ".jv-applied.json", batch_id)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(marker):
        os.remove(marker)


def recover_join_view(view_path: str) -> None:
    """Roll a crashed refresh to a consistent state (runs at every
    refresh entry): marker ABSENT => rollback (restore stranded
    ``kb=*.jv-old`` whose live dir is missing, drop staging and any torn
    marker ``.tmp``); marker PRESENT => everything staged, roll FORWARD
    via the idempotent commit."""
    base = view_path.rstrip("/")
    if os.path.exists(base + ".jv-commit"):
        _commit_join_view(base)
        return
    if os.path.exists(base + ".jv-commit.tmp"):
        os.remove(base + ".jv-commit.tmp")
    if os.path.isdir(base):
        for name in os.listdir(base):
            if name.endswith(".jv-old"):
                live = os.path.join(base, name[: -len(".jv-old")])
                stranded = os.path.join(base, name)
                if os.path.isdir(live):
                    shutil.rmtree(stranded)
                else:
                    os.rename(stranded, live)
    tmp = base + ".jv-tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)


def _enter(base: str, batch_id: "str | int | None"):
    """Shared refresh preamble: recover, then answer the exactly-once
    question. Returns the normalized batch id, or the out-of-band
    ``_SKIP`` sentinel when the id was already applied."""
    recover_join_view(base)
    if batch_id is None:
        return None
    batch_id = str(batch_id)
    if ledger_contains(base + ".jv-applied.json", batch_id):
        return _SKIP
    return batch_id


def refresh_join_view_facts(
    spark: SparkSession,
    fact_batch: DataFrame,
    dim: DataFrame,
    view_path: str,
    key: str,
    batch_id: "str | int | None" = None,
) -> dict:
    """Fold an arriving fact batch into the standing view: the delta is
    ``fact_batch JOIN broadcast(dim)`` — O(|batch|), the standing view
    is never read — staged per bucket and appended atomically.
    Returns {"rows_appended": int}."""
    base = view_path.rstrip("/")
    batch_id = _enter(base, batch_id)
    if batch_id is _SKIP:
        return {"rows_appended": 0}

    delta = _with_bucket(fact_batch.join(F.broadcast(dim), key), key)
    tmp = base + ".jv-tmp"
    app = os.path.join(tmp, "append")
    delta.write.mode("overwrite").option("compression", "snappy").partitionBy(
        "kb"
    ).parquet(app)
    # An empty delta (empty micro-batch, or a fact batch whose keys all
    # miss the dim) writes only _SUCCESS: no kb=* dirs exist, and reading
    # the dir back would throw UNABLE_TO_INFER_SCHEMA. Skip the read-back
    # but still run the marker/commit path so the batch_id is ledgered
    # exactly-once and a retry does not re-fail.
    has_parts = os.path.isdir(app) and any(
        p.startswith("kb=") for p in os.listdir(app)
    )
    # rows_appended from the staged files' parquet footers: the count is
    # pure commit telemetry, and a second Spark job re-reading the delta
    # just to count it doubled the per-batch job count (r13 optimization;
    # guide §1.2). Footer metadata is exact.
    n = 0
    if has_parts:
        import pyarrow.parquet as pq

        for walk_root, _dirs, files in os.walk(app):
            for fname in files:
                if fname.endswith(".parquet") and not fname.startswith(("_", ".")):
                    n += pq.ParquetFile(
                        os.path.join(walk_root, fname)
                    ).metadata.num_rows
    write_atomic(base + ".jv-commit", batch_id or "")
    _commit_join_view(base)
    return {"rows_appended": n}


def refresh_join_view_dim(
    spark: SparkSession,
    facts: DataFrame,
    dim_now: DataFrame,
    changed_keys: DataFrame,
    view_path: str,
    key: str,
    batch_id: "str | int | None" = None,
) -> dict:
    """Apply a dimension update: ``dim_now`` is the dimension AFTER the
    update, ``changed_keys`` the (key) relation of rows that changed.
    Only buckets containing a changed key are recomputed (facts pruned
    to those buckets re-join ``dim_now``) and swapped; every other
    bucket's files are untouched. Returns {"buckets_refreshed": int}."""
    base = view_path.rstrip("/")
    batch_id = _enter(base, batch_id)
    if batch_id is _SKIP:
        return {"buckets_refreshed": 0}

    touched = sorted(
        r.kb for r in _with_bucket(changed_keys, key).select("kb").distinct().collect()
    )
    if not touched:
        # No buckets to rebuild, but the batch still happened: ledger its
        # id through the normal marker/commit path so a retry is a no-op.
        write_atomic(base + ".jv-commit", batch_id or "")
        _commit_join_view(base)
        return {"buckets_refreshed": 0}
    rebuilt = _with_bucket(
        facts.where(F.pmod(F.col(key), F.lit(JV_BUCKETS)).isin(touched)).join(
            F.broadcast(dim_now), key
        ),
        key,
    )
    tmp = base + ".jv-tmp"
    rebuilt.write.mode("overwrite").option("compression", "snappy").partitionBy(
        "kb"
    ).parquet(os.path.join(tmp, "swap"))
    # a touched bucket can be empty after the update (its only facts
    # joined keys that no longer exist) — stage an empty dir so the
    # commit still swaps the stale live bucket out
    for kb in touched:
        os.makedirs(os.path.join(tmp, "swap", f"kb={kb}"), exist_ok=True)
    write_atomic(base + ".jv-commit", batch_id or "")
    _commit_join_view(base)
    return {"buckets_refreshed": len(touched)}
