"""Durable commit markers and bounded exactly-once ledgers.

Shared by the incremental-maintenance commit protocols
(``ingest/incremental.py``, ``operators/inverted_index.py``,
``ingest/snapshots.py``): a marker/ledger write must survive a crash at
any byte, so every write here goes temp-file -> flush -> fsync ->
``os.rename`` into place (rename is atomic on POSIX; a crash mid-write
leaves only a ``.tmp`` the recovery paths already ignore/delete). A
truncated marker would otherwise roll forward with a wrong batch id and
silently lose exactly-once.

Ledgers are BOUNDED: an applied-ids ledger that grows one entry per
batch forever is re-read and fully rewritten on every commit —
O(batches) work per batch, which contradicts the streaming posture.
Entries are kept in insertion order and capped at ``LEDGER_CAP``; the
oldest fall off. Replay of an id older than the cap horizon is therefore
no longer deduplicated — safe for the real replay sources (streaming
epoch ids and retried shard appends replay the most recent commits, not
ones thousands of batches back; a checkpointed stream cannot re-emit an
epoch below its checkpoint horizon).

Reference scope note: the reference (/root/reference/main.go:95-115)
guarantees durability only via clean-shutdown ordering and loses open
blocks on crash; these protocols are the crash-safe upgrade. [extension]
"""

from __future__ import annotations

import json
import os

LEDGER_CAP = 1024


def write_atomic(path: str, content: str) -> None:
    """Write ``content`` to ``path`` atomically and durably."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def read_ledger(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def ledger_contains(path: str, entry_id: str) -> bool:
    return str(entry_id) in read_ledger(path)


def ledger_add(path: str, entry_id: str, cap: int = LEDGER_CAP) -> None:
    """Append ``entry_id`` (insertion order, deduplicated) and atomically
    rewrite, keeping only the newest ``cap`` entries."""
    entry_id = str(entry_id)
    applied = read_ledger(path)
    if entry_id in applied:
        return
    applied.append(entry_id)
    write_atomic(path, json.dumps(applied[-cap:]))
