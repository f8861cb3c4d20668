"""Metadata inspection tables: the table's own metadata as DataFrames
[extension].

Iceberg exposes every table's metadata as queryable relations
(``SELECT * FROM tbl$snapshots / $files / $partitions / $history /
$refs``) — the surface operators use to answer "what changed", "how
big", "what does a maintenance pass owe" WITHOUT scanning data. This
module is that surface for the jar-free snapshot layer:

- ``snapshots`` — one row per retained version: op, parent, file/row
  counts, delete-file counts. The compaction/expiry scheduling input.
- ``files`` — one row per data file of a version: path, rows, per-column
  min/max/null stats (JSON — schemas vary per table). The skew/layout
  audit input.
- ``history`` — snapshot lineage with an ``is_current`` flag.
- ``partitions`` — per-partition file/row counts DERIVED FROM STATS:
  each spec transform's value is recovered per file (day/month from the
  source column's min=max day, bucket from the hidden column's min=max);
  a file straddling a transform boundary (range-partitioned writes may
  place one straddler at each boundary) surfaces as partition NULL
  rather than a wrong bucket — the view never lies, it declines.
- ``refs`` — main + every branch and tag with its version.
- ``stats`` — the persisted ANALYZE column statistics (ndv, nulls,
  min/max, row count) as of a version, from the newest ancestor that
  carries them; never-analyzed tables yield the schema with zero rows.

All six are METADATA-ONLY: built from the manifest JSONs (and ref
pointer files), never opening a data file. At 100 TB that is the point —
"rows per snapshot over the last 50 commits" costs 50 manifest reads;
the DataFrames are createDataFrame over manifest-sized lists (manifests
are the planning unit, same as the scan path). On a real Iceberg
catalog these map 1:1 onto the ``$``-suffixed metadata tables.

Reference scope note: the reference (/root/reference/main.go) keeps no
metadata to inspect; this is the observability layer over the snapshot
extension. [extension]
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from iceberg_file_writer_spark.ingest.snapshots import (
    _snap_dir,
    current_version,
    read_manifest,
)

KINDS = ("snapshots", "files", "history", "partitions", "refs", "stats")


def _retained_versions(table_path: str) -> "list[int]":
    """Retained main versions (dir listing — tolerates expiry gaps and
    tag-pinned islands below the retention floor)."""
    cur = current_version(table_path)
    out = []
    for name in os.listdir(_snap_dir(table_path)):
        if name.startswith("v") and name.endswith(".json"):
            v = int(name[1:-5])
            if v <= cur:  # above-CURRENT files are uncommitted claims
                out.append(v)
    return sorted(out)


def inspect_table(
    spark: SparkSession, table_path: str, kind: str, version: int | None = None
) -> DataFrame:
    """The ``kind`` metadata relation for ``table_path`` (see module
    docstring). ``version`` scopes ``files``/``partitions`` to one
    snapshot (default CURRENT), and ``stats`` to the newest ANALYZE at
    or below it; the other kinds are whole-table."""
    if kind not in KINDS:
        raise ValueError(f"unknown metadata table {kind!r}; one of {KINDS}")
    if kind == "snapshots":
        rows = []
        for v in _retained_versions(table_path):
            m = read_manifest(table_path, v)
            rows.append(
                (
                    v,
                    m.get("parent"),
                    m["op"],
                    len(m["files"]),
                    sum(e["rows"] for e in m["files"]),
                    len(m.get("dvs") or []),
                    len(m.get("eqs") or []),
                )
            )
        return spark.createDataFrame(
            rows,
            "version int, parent int, op string, n_data_files int, "
            "n_rows bigint, n_delete_vectors int, n_eq_delete_files int",
        )
    if kind == "history":
        cur = current_version(table_path)
        rows = [
            (v, read_manifest(table_path, v)["op"], v == cur)
            for v in _retained_versions(table_path)
        ]
        return spark.createDataFrame(
            rows, "version int, op string, is_current boolean"
        )
    if kind == "refs":
        from iceberg_file_writer_spark.ingest.branching import list_branches
        from iceberg_file_writer_spark.ingest.tags import list_tags

        rows = [("main", "branch", current_version(table_path))]
        for name, ptr in list_branches(table_path).items():
            rows.append((name, "branch", ptr.get("base")))
        for name, t in list_tags(table_path).items():
            rows.append((name, "tag", t["version"]))
        return spark.createDataFrame(rows, "name string, type string, version int")

    v = current_version(table_path) if version is None else version
    m = read_manifest(table_path, v)
    if kind == "stats":
        # the persisted ANALYZE statistics (snapshots.table_stats) as a
        # relation: one row per analyzed column; never-analyzed tables
        # yield the declared schema with zero rows (every kind returns a
        # relation — tools iterating KINDS over a fleet must not crash)
        from iceberg_file_writer_spark.ingest.snapshots import table_stats

        schema = (
            "column string, ndv bigint, n_nulls bigint, min string, "
            "max string, n_rows bigint, as_of_version bigint"
        )
        try:
            st = table_stats(table_path, version)
        except ValueError:
            return spark.createDataFrame([], schema)
        rows = [
            (
                c,
                int(s["ndv"]),
                int(s["n_nulls"]),
                None if s["min"] is None else str(s["min"]),
                None if s["max"] is None else str(s["max"]),
                int(st["n_rows"]),
                int(st["as_of_version"]),
            )
            for c, s in sorted(st["columns"].items())
        ]
        return spark.createDataFrame(rows, schema)
    if kind == "files":
        rows = [
            (e["path"], e["rows"], json.dumps(e.get("stats") or {}, default=str))
            for e in m["files"]
        ]
        return spark.createDataFrame(
            rows, "path string, rows bigint, stats_json string"
        )
    # partitions: recover each file's transform tuple from its stats
    spec = m.get("spec") or []
    agg: dict = {}
    for e in m["files"]:
        part = _file_partition(e, spec, columns=m.get("columns"))
        cell = agg.setdefault(part, [0, 0])
        cell[0] += 1
        cell[1] += e["rows"]
    rows = [(k, n, r) for k, (n, r) in sorted(agg.items(), key=lambda kv: str(kv[0]))]
    return spark.createDataFrame(
        rows, "partition string, n_files int, n_rows bigint"
    )


def _file_partition(
    entry: dict, spec: list, columns: "list | None" = None
) -> "str | None":
    """The file's transform-value tuple recovered from stats, or None
    when any transform value is not constant within the file (boundary
    straddler) / not derivable (z-order is a clustering, not a
    partition; missing stats). ``columns`` (mapped tables) marks the
    spec as FIELD-ID-keyed: labels use the current names, stats resolve
    through the file's own commit-epoch stamp."""
    from iceberg_file_writer_spark.ingest.partitioning import (
        _bucket_col_name,
        _mapped_bucket_col_name,
    )

    if not spec:
        return ""
    stats = entry.get("stats") or {}
    if columns is not None:
        id2n = {cid: name for cid, name, _t in columns}
        stamp = {cid: nm for cid, nm in entry.get("cols") or []}

    def _raw_key(ref):
        # plain: the spec names the stats key; mapped: the file's
        # physical name for the field id (None = column postdates file)
        return ref if columns is None else stamp.get(ref)

    def _label(ref):
        return ref if columns is None else id2n.get(ref, f"f{ref}")

    parts = []
    for tr in spec:
        if tr[0] in ("day", "month", "year", "hour"):
            key = _raw_key(tr[1])
            s = stats.get(key) if key is not None else None
            if not s or s[0] is None or s[1] is None:
                return None
            # timestamp-string prefix widths: YYYY=4, YYYY-MM=7,
            # YYYY-MM-DD=10, YYYY-MM-DD HH=13 (r12 ADVICE: year/hour
            # previously fell into the clustering-only branch and were
            # silently omitted from partition labels)
            w = {"year": 4, "month": 7, "day": 10, "hour": 13}[tr[0]]
            lo, hi = str(s[0])[:w], str(s[1])[:w]
            if lo != hi:
                return None
            parts.append(f"{tr[0]}({_label(tr[1])})={lo}")
        elif tr[0] == "truncate":
            key = _raw_key(tr[2])
            s = stats.get(key) if key is not None else None
            if not s or s[0] is None or s[1] is None:
                return None
            w = tr[1]
            if isinstance(s[0], str):
                lo, hi = s[0][:w], s[1][:w]
            else:  # numeric: floor to a width multiple (Iceberg contract)
                lo, hi = s[0] - s[0] % w, s[1] - s[1] % w
            if lo != hi:
                return None
            parts.append(f"truncate[{w}]({_label(tr[2])})={lo}")
        elif tr[0] == "bucket":
            if columns is None:
                cand = [_bucket_col_name(tr[2], tr[1])]
            else:
                cand = [_mapped_bucket_col_name(tr[2], tr[1])]
                phys = stamp.get(tr[2])
                if phys is not None:
                    cand.append(_bucket_col_name(phys, tr[1]))
            s = next(
                (stats[k] for k in cand if k in stats), None
            )
            if not s or s[0] is None or s[0] != s[1]:
                return None
            parts.append(f"bucket[{tr[1]}]({_label(tr[2])})={s[0]}")
        else:  # zorder and future clustering-only transforms
            continue
    return "/".join(parts)


def clustering_report(table_path: str, version: int | None = None) -> dict:
    """Layout-quality triage for one snapshot, manifests only: how much
    of the table still honors its transform spec (a file is "clustered"
    when every spec value is recoverable from its stats — the same
    test the partitions view applies), plus the merge-on-read tombstone
    debt. The inputs to a re-cluster / compact decision:

    - ``clustered_permille`` decays as writers miss spec columns or
      boundary straddlers accumulate → ``commit_compact`` re-applies the
      standing spec and repairs it (pinned in tests/test_inspect.py).
    - ``n_dv_files`` / ``n_eq_rows`` grow with MoR churn → compaction
      retires them.

    At 100 TB: one manifest read; no data file is opened.
    """
    from iceberg_file_writer_spark.ingest.snapshots import current_version

    v = current_version(table_path) if version is None else version
    m = read_manifest(table_path, v)
    spec = m.get("spec") or []
    files = m["files"]
    n = len(files)
    rows = sum(e["rows"] for e in files)
    straddlers = sum(
        1
        for e in files
        if _file_partition(e, spec, columns=m.get("columns")) is None
    )
    return {
        "version": v,
        "spec": spec,
        "n_files": n,
        "n_rows": rows,
        "avg_rows_per_file": rows // n if n else 0,
        "straddler_files": straddlers,
        "clustered_permille": (1000 * (n - straddlers)) // n if n else 1000,
        "n_dv_files": len(m.get("dvs") or []),
        "n_eq_files": len(m.get("eqs") or []),
        "eq_key_rows": sum(e.get("rows", 0) for e in (m.get("eqs") or [])),
    }
