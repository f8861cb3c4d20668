"""Incremental aggregate maintenance [extension — not in reference].

A materialized daily rollup over the events stream, refreshed per ingest
batch by recomputing ONLY the (day, event_type) groups the batch touches
— incremental view maintenance, the pattern that keeps a 100 TB rollup
current without ever re-scanning history:

1. the arriving batch aggregates to its own partial rows (batch-sized),
2. the touched group keys (a tiny distinct relation) select the affected
   rows of the standing rollup,
3. affected standing rows MERGE with the batch partials (algebraic
   aggregates: count/sum/min/max fold exactly; avg = sum/count derived),
4. untouched rollup rows append through unchanged — never recomputed,
   never re-read from the events table.

The rollup is partitioned by day, so step 2's read prunes to the touched
days' directories and the rewrite swaps only those partitions (the same
two-rename crash protocol as apply_deletes). Late data is just another
batch: a record for a 3-month-old day refreshes exactly that day.

``refresh_daily_rollup`` is pytest-asserted equal to a full recompute
after any sequence of batches, including out-of-order/late arrivals
(tests/test_incremental_rollup.py).

Reference scope note: the reference (/root/reference/main.go:72-85)
maintains in-memory per-partition blocks between flushes; this is that
buffering idea promoted to a durable, queryable aggregate artifact.
[extension]
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

ROLLUP_KEYS = ("day", "event_type")


def _partial(events: DataFrame) -> DataFrame:
    """Algebraic partial rows for a slice of events: mergeable by key."""
    return events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _merge(parts: DataFrame) -> DataFrame:
    """Fold partial rows sharing a key: the aggregate merge functions."""
    return parts.groupBy("day", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def init_daily_rollup(spark: SparkSession, events: DataFrame, rollup_path: str) -> None:
    """Materialize the rollup from scratch, partitioned by day."""
    _partial(events).write.mode("overwrite").option(
        "compression", "snappy"
    ).partitionBy("day").parquet(rollup_path)


def _commit_rollup(base: str) -> None:
    """The idempotent commit phase (runs under the marker; re-runnable
    from any crash point): swap every staged day into the rollup root,
    record the batch id, clean up, drop the marker."""
    tmp = base + ".refresh-tmp"
    if os.path.isdir(tmp):
        for name in sorted(os.listdir(tmp)):
            if not name.startswith("day="):
                continue
            live = os.path.join(base, name)
            staged = os.path.join(tmp, name)
            old = live + ".refresh-old"
            if os.path.isdir(live):
                os.rename(live, old)
            os.rename(staged, live)
            if os.path.isdir(old):
                shutil.rmtree(old)
    # a day whose staged dir is gone already swapped; its .refresh-old may
    # remain from a crash between its two renames' cleanup
    if os.path.isdir(base):
        for name in os.listdir(base):
            if name.endswith(".refresh-old"):
                shutil.rmtree(os.path.join(base, name))
    marker = base + ".refresh-commit"
    if os.path.exists(marker):
        with open(marker) as f:
            batch_id = f.read().strip()
        if batch_id:
            ledger_add(base + ".refresh-applied.json", batch_id)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(marker):
        os.remove(marker)


def recover_rollup(rollup_path: str) -> None:
    """Roll a crashed refresh to a consistent state (runs at every
    refresh entry).

    The refresh is ALL-OR-NOTHING across the batch's touched days,
    decided by the ``.refresh-commit`` marker: with the marker absent
    the crash hit during staging — rollback (restore any stranded
    ``day=<d>.refresh-old`` whose live dir is missing, drop one beside a
    live dir, drop the staging root). With the marker present every
    day's merged result is fully staged — roll FORWARD by re-running
    the idempotent commit phase, so the batch lands in ALL its days
    (the pre-round-6 recovery could leave a batch applied to some days
    and silently lost for the rest). Stranded ``.refresh-old`` dirs are
    also what Spark partition discovery would misparse as bogus
    partition values — both paths clear them.
    """
    base = rollup_path.rstrip("/")
    if os.path.exists(base + ".refresh-commit"):
        _commit_rollup(base)
        return
    # a crash mid-marker-write leaves only the .tmp (write_atomic):
    # the refresh never committed — discard it with the staging
    if os.path.exists(base + ".refresh-commit.tmp"):
        os.remove(base + ".refresh-commit.tmp")
    tmp_root = base + ".refresh-tmp"
    if os.path.exists(tmp_root):
        shutil.rmtree(tmp_root)
    if os.path.isdir(base):
        for name in os.listdir(base):
            if not name.endswith(".refresh-old"):
                continue
            old = os.path.join(base, name)
            live = old[: -len(".refresh-old")]
            if os.path.exists(live):
                shutil.rmtree(old)  # crashed after swap: live dir is current
            else:
                os.rename(old, live)  # crashed mid-swap: restore committed data


def refresh_daily_rollup(
    spark: SparkSession,
    batch: DataFrame,
    rollup_path: str,
    batch_id: "str | int | None" = None,
) -> dict:
    """Fold one arriving batch into the standing rollup, atomically.

    Only the touched days' partition directories are read and swapped;
    history outside them is never opened (mtime-asserted in the tests).
    All touched days commit together: the merged partials stage outside
    the rollup root, then a commit marker flips the refresh from
    rollback-on-crash to roll-forward-on-crash (recover_rollup completes
    it). Pass a stable ``batch_id`` (e.g. the foreachBatch epoch id) to
    make caller retries exactly-once — a replayed id is a no-op instead
    of a double-fold (int epoch ids from foreachBatch are coerced to
    str; the ledger is bounded — see ingest/ledger.py). Returns
    {"days_refreshed": int}.
    """
    recover_rollup(rollup_path)
    base = rollup_path.rstrip("/")
    if batch_id is not None:
        batch_id = str(batch_id)
        if ledger_contains(base + ".refresh-applied.json", batch_id):
            return {"days_refreshed": 0}

    batch_parts = _partial(batch).cache()
    touched_days = [r.day for r in batch_parts.select("day").distinct().collect()]
    if not touched_days:
        batch_parts.unpersist()
        return {"days_refreshed": 0}

    existing_dirs = [
        d for d in touched_days if os.path.isdir(os.path.join(base, f"day={d}"))
    ]
    if existing_dirs:
        standing = (
            spark.read.option("basePath", base)
            .parquet(*[os.path.join(base, f"day={d}") for d in existing_dirs])
            .select(batch_parts.columns)
        )
        merged = _merge(standing.unionByName(batch_parts))
    else:
        merged = batch_parts

    tmp = base + ".refresh-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").option("compression", "snappy").partitionBy(
        "day"
    ).parquet(tmp)
    # everything staged: flip to roll-forward and commit. The marker is
    # fsync'd + rename-installed — a crash mid-write can leave only a
    # .tmp recovery ignores, never a truncated marker that would roll
    # forward with a wrong batch id.
    write_atomic(base + ".refresh-commit", batch_id or "")
    _commit_rollup(base)
    batch_parts.unpersist()
    return {"days_refreshed": len(touched_days)}


def read_daily_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The rollup with derived columns (avg from the algebraic parts)."""
    r = spark.read.parquet(rollup_path)
    return r.select(
        F.col("day").cast("date").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
        (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
    )
