"""Snapshot tags: named immutable refs with independent retention
[extension].

Iceberg's ``tag`` refs (`ALTER TABLE ... CREATE TAG`): a tag names a
snapshot version so it can be read forever by NAME ("the Q3 training
snapshot", "eval-freeze-v2") and — the operational point — is PINNED
against ``expire_snapshots``: the tagged manifest and every data /
delete / segment file it references survive expiry however far the
retention floor advances, while untagged history around it is reclaimed
normally. Reproducibility for a training pipeline costs one pointer
file per freeze, not a full retention window.

Mechanics, matching the branch-pointer idiom (ingest/branching.py):

- A tag is ``snapshots/tag-<name>.json`` = ``{"name", "version",
  "created_ms"}``, written atomically (O_EXCL — tags are immutable;
  retagging a name requires an explicit delete first, so a tag can
  never silently move).
- ``expire_snapshots`` (snapshots.py) skips tagged versions in its
  manifest drop loop; the file sweep already counts every surviving
  ``v*.json``'s references, so pinning the manifest pins its files,
  sealed segments, DVs and equality-delete files with zero extra
  bookkeeping.
- ``delete_tag`` removes the pin; the next expire reclaims the
  manifest (and any files only it referenced) if it is below the
  retention floor.
- Reads resolve the name to its version and take the normal
  time-travel path — a tag adds no read-time cost.

At 100 TB: a tag is one metadata file; the cost of keeping a frozen
snapshot readable is the storage of exactly the files that snapshot
references (shared files are shared — content-equal carries cost
nothing extra).

Reference scope note: the reference (/root/reference/main.go) has no
table metadata at all; this completes the snapshot layer's ref surface
(branches for write-audit-publish, tags for immutable freezes).
[extension]
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from iceberg_file_writer_spark.ingest.snapshots import (
    _manifest_path,
    _snap_dir,
    current_version,
    read_table_version,
)

_TAG_PREFIX = "tag-"


def _tag_path(table_path: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad tag name {name!r}")
    return os.path.join(_snap_dir(table_path), f"{_TAG_PREFIX}{name}.json")


def create_tag(table_path: str, name: str, version: int | None = None) -> int:
    """Tag a committed snapshot (default: CURRENT). Immutable: a name in
    use raises — delete_tag first to retag (never a silent move)."""
    cur = current_version(table_path)
    v = cur if version is None else version
    if v <= 0 or v > cur:
        raise ValueError(f"version {v} is not committed (CURRENT={cur})")
    if not os.path.exists(_manifest_path(table_path, v)):
        raise ValueError(f"version {v} expired; cannot tag")
    p = _tag_path(table_path, name)
    payload = {"name": name, "version": v, "created_ms": int(time.time() * 1000)}
    try:
        fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        raise ValueError(f"tag {name!r} already exists on {table_path}")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    return v


def delete_tag(table_path: str, name: str) -> None:
    p = _tag_path(table_path, name)
    if not os.path.exists(p):
        raise ValueError(f"no tag {name!r} on {table_path}")
    os.remove(p)


def list_tags(table_path: str) -> "dict[str, dict]":
    """name -> {"version", "created_ms"} for every tag on the table."""
    snap = _snap_dir(table_path)
    out: dict[str, dict] = {}
    if not os.path.isdir(snap):
        return out
    for fn in sorted(os.listdir(snap)):
        if fn.startswith(_TAG_PREFIX) and fn.endswith(".json"):
            with open(os.path.join(snap, fn)) as f:
                t = json.load(f)
            out[t["name"]] = {k: t[k] for k in ("version", "created_ms")}
    return out


def tagged_versions(table_path: str) -> set[int]:
    """Versions pinned by any tag — expire_snapshots' skip set."""
    return {t["version"] for t in list_tags(table_path).values()}


def read_tag(spark: SparkSession, table_path: str, name: str) -> DataFrame:
    """Time travel by name: the tagged snapshot's exact state (MoR
    deletes applied as they stood at that version)."""
    tags = list_tags(table_path)
    if name not in tags:
        raise ValueError(f"no tag {name!r} on {table_path}")
    return read_table_version(spark, table_path, tags[name]["version"])
