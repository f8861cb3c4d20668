"""Write-audit-publish branches over snapshot tables [extension].

The WAP pattern: an ingestion job stages commits on a BRANCH that
production readers never see, an audit job queries the branch (row
counts, quality gates, dedup ratios — any query the engine runs), and
only a passing audit PUBLISHES the branch head as the table's new
CURRENT in one atomic step. A failing audit deletes the branch; the
main table never held the bad data. This is Iceberg's
``write.wap.enabled`` / branch workflow, filesystem-flavored.

Mechanics on top of ``ingest/snapshots.py``:

- A branch is a pointer file ``snapshots/branch-<name>.json``
  (``{"base": v, "head": n}``) plus branch-local manifests
  ``snapshots/branch-<name>-v{n}.json`` in their OWN version
  namespace. Branch commits therefore never claim main version slots
  — main writers proceed unblocked while a branch is staged and
  audited (claiming real slots would livelock every ``commit_append``
  retry against the unpublished claim until publish).
- Branch data files land in the shared ``data/`` dir (invisible until
  referenced); ``expire_snapshots`` counts branch-manifest references,
  so staged files survive GC while the branch lives and are swept
  normally after ``delete_branch``.
- **Publish is fast-forward-only and atomic**: one ``_commit`` whose
  file list (and dvs/spec/bloom carries) is the branch head's, claimed
  with the same O_EXCL optimistic lock every writer uses. If main
  advanced past the branch base, publish raises ``BranchDiverged`` —
  re-stage or rebase, exactly Iceberg's semantics. Intermediate branch
  commits squash into the single published snapshot (main history
  stays linear); the publish manifest records its provenance, which
  also makes a crashed publish idempotently re-runnable.
- One writer per branch (the staging job), matching the WAP pattern;
  concurrency across branches and against main writers is handled by
  the publish-time optimistic lock.

At 100 TB: staging cost is the normal parallel append; audit cost is
whatever the audit queries cost; publish moves metadata only.

Reference scope note: the reference (/root/reference/main.go:95-115)
publishes every record file immediately on write; this adds the
gated-publish workflow a production corpus needs. [extension]
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from iceberg_file_writer_spark.ingest.ledger import write_atomic
from iceberg_file_writer_spark.ingest.snapshots import (
    _commit,
    _read_files,
    _resolve_raw,
    _segment_files,
    _snap_dir,
    _write_data_files,
    current_version,
    read_manifest,
    read_table_version,
)

_CARRIED = ("batch_ids", "spec", "dvs", "eqs", "bloom")


class BranchDiverged(Exception):
    """Main advanced past the branch base; fast-forward impossible."""


def _ptr_path(table_path: str, name: str) -> str:
    return os.path.join(_snap_dir(table_path), f"branch-{name}.json")


def _bm_path(table_path: str, name: str, n: int) -> str:
    return os.path.join(
        _snap_dir(table_path), f"branch-{name}-v{n:06d}.json"
    )


def _read_ptr(table_path: str, name: str) -> dict:
    p = _ptr_path(table_path, name)
    if not os.path.exists(p):
        raise ValueError(f"no branch {name!r} on {table_path}")
    with open(p) as f:
        return json.load(f)


def _branch_manifest(table_path: str, name: str, ptr: dict) -> dict:
    """The branch head's manifest (resolved); the base main manifest
    when nothing is staged yet."""
    if ptr["head"] == 0:
        if ptr["base"] == 0:
            return {"files": []}
        return read_manifest(table_path, ptr["base"])
    with open(_bm_path(table_path, name, ptr["head"])) as f:
        return _resolve_raw(table_path, json.load(f))


def create_branch(
    table_path: str, name: str, at_version: "int | None" = None
) -> dict:
    """Start a branch at CURRENT (or a pinned older version)."""
    if not name or not all(c.isalnum() or c == "_" for c in name):
        # '-' is reserved: the pointer/manifest file-name grammar
        # (branch-<name>.json vs branch-<name>-v{n}.json) splits on it
        raise ValueError(f"branch name must be [A-Za-z0-9_]+: {name!r}")
    if os.path.exists(_ptr_path(table_path, name)):
        raise ValueError(f"branch {name!r} already exists")
    base = current_version(table_path) if at_version is None else at_version
    os.makedirs(_snap_dir(table_path), exist_ok=True)
    ptr = {"base": base, "head": 0}
    write_atomic(_ptr_path(table_path, name), json.dumps(ptr))
    return ptr


def commit_append_branch(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    name: str,
    max_rows: int = 4096,
) -> int:
    """Append onto the branch; production readers see nothing. Returns
    the branch-local version. Single writer per branch (the manifest
    write is atomic-replace, not a claim): a crash between manifest
    and pointer leaves an orphan the next commit overwrites."""
    ptr = _read_ptr(table_path, name)
    parent_m = _branch_manifest(table_path, name, ptr)
    if parent_m.get("spec"):
        from iceberg_file_writer_spark.ingest.partitioning import apply_spec

        df = apply_spec(df, parent_m["spec"])
    new = _write_data_files(df, table_path, max_rows)
    n = ptr["head"] + 1
    manifest = {
        "version": n,
        "parent": ptr["head"],
        "base": ptr["base"],
        "op": "append",
        "branch": name,
    }
    # data sequence stamp: staged files become visible at publish, which
    # is ONE fast-forward commit at base+1 — so every staged file gets
    # seq base+1, making carried equality deletes (seq <= base) skip
    # them and post-publish deletes (seq >= base+2) apply to them
    all_files = (parent_m.get("files") or []) + new
    for e in all_files:
        e.setdefault("seq", ptr["base"] + 1)
    manifest.update(_segment_files(table_path, all_files))
    for carried in _CARRIED:
        if parent_m.get(carried) is not None:
            manifest[carried] = parent_m[carried]
    write_atomic(_bm_path(table_path, name, n), json.dumps(manifest))
    write_atomic(
        _ptr_path(table_path, name),
        json.dumps({"base": ptr["base"], "head": n}),
    )
    return n


def read_branch(
    spark: SparkSession, table_path: str, name: str
) -> DataFrame:
    """The audit surface: the branch head as a DataFrame (DV-applied),
    exactly what CURRENT would become on publish."""
    ptr = _read_ptr(table_path, name)
    if ptr["head"] == 0:
        return read_table_version(spark, table_path, ptr["base"])
    m = _branch_manifest(table_path, name, ptr)
    if not m["files"]:
        return read_table_version(spark, table_path, ptr["base"]).limit(0)
    return _read_files(
        spark, table_path, m["files"], m.get("dvs"), eqs=m.get("eqs")
    )


def publish_branch(table_path: str, name: str) -> int:
    """Atomically fast-forward CURRENT to the branch head and drop the
    branch. Raises ``BranchDiverged`` if main moved past the base
    (re-stage or rebase); idempotent across a crash mid-cleanup (a
    re-run that finds its own publish manifest just finishes)."""
    ptr = _read_ptr(table_path, name)
    cur = current_version(table_path)
    if ptr["head"] == 0:
        _drop_branch_files(table_path, name, ptr)
        return cur
    already = cur > ptr["base"] and _is_own_publish(table_path, cur, name, ptr)
    if not already:
        if cur != ptr["base"]:
            raise BranchDiverged(
                f"{table_path} at v{cur}, branch {name!r} based on "
                f"v{ptr['base']} — fast-forward impossible"
            )
        m = _branch_manifest(table_path, name, ptr)
        extra = {
            k: m[k] for k in _CARRIED if m.get(k) is not None
        }
        extra.update(
            {"published_branch": name, "published_head": ptr["head"]}
        )
        cur = _commit(table_path, cur, "publish", m["files"], extra=extra)
    _drop_branch_files(table_path, name, ptr)
    return cur


def _is_own_publish(
    table_path: str, cur: int, name: str, ptr: dict
) -> bool:
    m = read_manifest(table_path, cur)
    return (
        m.get("op") == "publish"
        and m.get("published_branch") == name
        and m.get("published_head") == ptr["head"]
        and m.get("parent") == ptr["base"]
    )


def delete_branch(table_path: str, name: str) -> None:
    """Abandon the branch (failed audit): pointer + manifests go now;
    the staged data files become unreferenced and the normal
    ``expire_snapshots`` grace sweep collects them."""
    _drop_branch_files(table_path, name, _read_ptr(table_path, name))


def _drop_branch_files(table_path: str, name: str, ptr: dict) -> None:
    for n in range(1, ptr["head"] + 1):
        p = _bm_path(table_path, name, n)
        if os.path.exists(p):
            os.remove(p)
    p = _ptr_path(table_path, name)
    if os.path.exists(p):
        os.remove(p)


def list_branches(table_path: str) -> "dict[str, dict]":
    """{name: pointer} for every live branch."""
    out: dict = {}
    snap = _snap_dir(table_path)
    if not os.path.isdir(snap):
        return out
    for fname in os.listdir(snap):
        if (
            fname.startswith("branch-")
            and fname.endswith(".json")
            and "-v" not in fname[len("branch-"):]
        ):
            with open(os.path.join(snap, fname)) as f:
                out[fname[len("branch-"):-len(".json")]] = json.load(f)
    return out
