"""Multi-table atomic commit [extension — not in reference].

A training-data pipeline rarely updates ONE table: a fact append also
lands rows in a maintained join view, a derived index, a quality-stats
rollup. The per-table snapshot layer (``ingest/snapshots.py``) makes
each of those atomic alone; this coordinator makes a SET of table
commits all-or-nothing — after any crash + recovery, either every
table's CURRENT advanced to its staged version or none did. (Open
single-table formats have this gap too: Iceberg transactions are
per-table unless a REST catalog coordinates; this is that coordinator,
file-system flavored.)

Protocol (the join-view/rollup marker discipline lifted one level up):

1. **Intent record** (``txn.staging.json``, fsync'd): the (table,
   claimed-version) set, written BEFORE anything else so rollback knows
   exactly which staged manifests are this transaction's.
2. **Stage per table**: write data files (invisible until referenced),
   then CLAIM the version slot by O_EXCL-creating the real
   ``v{n}.json`` manifest WITHOUT flipping CURRENT. The O_EXCL create
   is the same optimistic lock single-table writers use, so a racing
   ``commit_append`` on any member table conflicts honestly (one side
   retries); an unflipped manifest is invisible to CURRENT-readers
   (``snapshot_log`` / ``read_table_version`` ignore versions above
   CURRENT — in-flight slots are not yet history).
3. **Marker flip** (``txn.commit``, fsync'd-atomic): the transaction's
   durability point.
4. **Commit phase** (idempotent, re-runnable from any crash byte): flip
   each table's CURRENT to its claimed version (skipped if already
   there), ledger the ``batch_id`` exactly-once, drop staging record +
   marker.

``recover_multi`` at every entry: marker PRESENT -> roll FORWARD
(finish phase 4); marker ABSENT but intent record present -> roll BACK
(delete exactly the claimed, unflipped manifests; their data files
become unreferenced and the per-table ``expire_snapshots`` grace sweep
collects them).

What is and is not guaranteed: atomic DURABILITY (never a partial
outcome after recovery) and exactly-once retries via the bounded
ledger. NOT cross-table snapshot ISOLATION: during phase 4 a reader
can observe table A advanced milliseconds before table B — the same
read-skew window Iceberg multi-table commits have outside a
serializable catalog; bound it by flipping the most-derived table last.

At 100 TB: the coordinator touches only manifests and two tiny
fsync'd files — data-file volume never crosses it; per-table staging
is the existing parallel Spark write.

Reference scope note: the reference (/root/reference/main.go:95-115)
has a single output root and clean-shutdown-only durability; this is
the crash-safe multi-output upgrade. [extension]
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from iceberg_file_writer_spark.ingest.ledger import (
    ledger_add,
    ledger_contains,
    write_atomic,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    CommitConflict,
    _manifest_path,
    _segment_files,
    _snap_dir,
    _write_data_files,
    current_version,
    read_manifest,
)

_MARKER = "txn.commit"
_STAGING = "txn.staging.json"
_LEDGER = "txn.applied.json"


def _flip_current(table_path: str, version: int) -> None:
    """Idempotently advance CURRENT to ``version`` (never backwards)."""
    if current_version(table_path) >= version:
        return
    write_atomic(os.path.join(_snap_dir(table_path), "CURRENT"), str(version))


def _commit_phase(txn_root: str) -> None:
    """Runs under the marker; re-runnable from any crash point."""
    marker = os.path.join(txn_root, _MARKER)
    with open(marker) as f:
        payload = json.load(f)
    for t, v in payload["claims"]:
        _flip_current(t, v)
    if payload.get("batch_id"):
        ledger_add(os.path.join(txn_root, _LEDGER), payload["batch_id"])
    staging = os.path.join(txn_root, _STAGING)
    if os.path.exists(staging):
        os.remove(staging)
    os.remove(marker)


def recover_multi(txn_root: str) -> None:
    """Roll a crashed transaction to a consistent state: marker PRESENT
    => everything staged, roll FORWARD; marker ABSENT => roll BACK the
    intent record's claimed-but-unflipped manifests (data files become
    unreferenced; the per-table expire grace sweep collects them)."""
    if os.path.exists(os.path.join(txn_root, _MARKER)):
        _commit_phase(txn_root)
        return
    tmp = os.path.join(txn_root, _MARKER + ".tmp")
    if os.path.exists(tmp):
        os.remove(tmp)  # torn marker write: pre-durability, roll back
    staging = os.path.join(txn_root, _STAGING)
    if not os.path.exists(staging):
        return
    try:
        intent = json.load(open(staging))
        claims, txn_id = intent.get("claims", []), intent.get("txn")
    except json.JSONDecodeError:
        claims, txn_id = [], None  # torn intent: nothing claimed yet
    for t, v in claims:
        # only claims THIS txn made AND never flipped are rolled back; a
        # rival's manifest at the same version (our O_EXCL lost the race)
        # carries a different/absent txn stamp and must survive
        mp = _manifest_path(t, v)
        if current_version(t) >= v or not os.path.exists(mp):
            continue
        try:
            owner = json.load(open(mp)).get("txn")
        except (json.JSONDecodeError, ValueError):
            # Unparseable manifest at a claimed version: NOT ours. Our
            # claims are linked into place fully-written + fsync'd
            # (_claim_slot), so a torn manifest here is a rival
            # single-table writer mid-`json.dump` — deleting it would
            # brick the table once the rival flips CURRENT to it.
            continue
        if owner == txn_id:
            os.remove(mp)
    os.remove(staging)


def _claim_slot(t: str, v: int, manifest: dict) -> None:
    """Claim version slot ``v`` of table ``t`` atomically WITH content:
    write + fsync a temp file, then hard-link it into the slot.
    ``os.link`` fails with FileExistsError exactly like O_EXCL, but the
    manifest is never observable half-written — recovery can therefore
    trust that any unparseable ``v{n}.json`` belongs to someone else."""
    tmp = _manifest_path(t, v) + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(t, v))
    except FileExistsError as e:
        raise CommitConflict(f"{t} version {v} claimed by another writer") from e
    finally:
        os.remove(tmp)


def commit_multi(
    spark: SparkSession,
    txn_root: str,
    updates: "list[tuple[str, DataFrame]]",
    max_rows: int = 4096,
    batch_id: "str | int | None" = None,
) -> "dict[str, int]":
    """Atomically append each ``(table_path, df)`` to its snapshot table.

    Returns {table_path: committed_version}; a replayed ``batch_id``
    returns the (empty) no-op dict. Raises ``CommitConflict`` — after
    rolling its own claims back — if any member table's version slot was
    taken by a concurrent writer mid-stage."""
    os.makedirs(txn_root, exist_ok=True)
    recover_multi(txn_root)
    if batch_id is not None:
        batch_id = str(batch_id)
        if ledger_contains(os.path.join(txn_root, _LEDGER), batch_id):
            return {}

    # Phase 1: intent record BEFORE any claim, so rollback knows its set.
    # The txn stamp written into each claimed manifest is what lets
    # rollback distinguish OUR claim from a rival's at the same version.
    txn_id = uuid.uuid4().hex
    claims = [(t, current_version(t) + 1) for t, _df in updates]
    if len({t for t, _v in claims}) != len(claims):
        raise ValueError("duplicate table in one transaction")
    write_atomic(
        os.path.join(txn_root, _STAGING),
        json.dumps({"claims": claims, "txn": txn_id}),
    )

    # Phase 2: stage data + claim version slots (manifest without flip).
    try:
        for (t, df), (_t, v) in zip(updates, claims):
            files = _write_data_files(df, t, max_rows)
            os.makedirs(_snap_dir(t), exist_ok=True)
            parent = v - 1
            pm = read_manifest(t, parent) if parent else {}
            manifest = {
                "version": v,
                "parent": parent,
                "op": "append",
                "txn": txn_id,
                # commit wall-clock stamp, exactly as snapshots._commit:
                # without it version_asof treats the version as "legacy"
                # and TIMESTAMP AS OF silently skips past it
                "ts_ms": int(time.time() * 1000),
            }
            # stamp data sequence numbers exactly as snapshots._commit
            # does — equality-delete semantics must not depend on which
            # commit verb appended the file
            all_files = (pm.get("files") or []) + files
            for e in all_files:
                e.setdefault("seq", v)
            manifest.update(_segment_files(t, all_files))
            # inherit everything a single-table append inherits
            # (snapshots._commit): the exactly-once ledger, the
            # hidden-partition spec, merge-on-read deletion vectors
            # (dropping dvs would resurrect deleted rows), and bloom
            # sidecar pointers.
            for carried in ("batch_ids", "spec", "dvs", "eqs", "bloom"):
                if pm.get(carried) is not None:
                    manifest[carried] = pm[carried]
            _claim_slot(t, v, manifest)
    except CommitConflict:
        recover_multi(txn_root)  # marker absent => rolls our claims back
        raise

    # Phase 3: the durability point.
    write_atomic(
        os.path.join(txn_root, _MARKER),
        json.dumps({"claims": claims, "batch_id": batch_id or ""}),
    )
    # Phase 4: idempotent commit.
    _commit_phase(txn_root)
    return dict(claims)


def streaming_multi_txn_sink(
    txn_root: str,
    members_fn,
    max_rows: int = 4096,
):
    """foreachBatch adapter: each micro-batch commits ONE atomic
    multi-table transaction.

    ``members_fn(batch_df) -> list[(table_path, DataFrame)]`` derives
    every member table's delta from the batch — typically the raw facts
    plus their pre-aggregated rollup — and ``commit_multi`` stages all
    of them, claims each table's next version slot, and flips them
    together behind one fsync'd marker. The consistency this buys at
    100 TB: a reader at ANY instant sees fact and rollup from the same
    set of micro-batches (never a fact row whose rollup is missing),
    and exactly-once is transaction-wide — the batch_id rides the
    TRANSACTION ledger, so a replayed micro-batch is a no-op across all
    members at once rather than per-table ledgers that could disagree
    after a crash between commits.
    """

    def _sink(batch_df, batch_id) -> None:
        commit_multi(
            batch_df.sparkSession,
            txn_root,
            members_fn(batch_df),
            max_rows=max_rows,
            batch_id=batch_id,
        )

    return _sink
