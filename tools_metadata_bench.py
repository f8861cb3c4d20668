"""Metadata-plane planning latency at 10^5 files (VERDICT r9 item 7).

The round-8 verdict flagged O(files) driver-side JSON planning as the
100x metadata bottleneck; round 9 shipped two fixes — the resolved-
manifest memo (snapshots.py) and executor-side segment pruning above
DISTRIBUTED_PRUNE_THRESHOLD (file_skipping.py) — but their win was
pinned by parity tests, not measured. This tool MEASURES it: a
synthetic table whose manifest holds N metadata-only entries (no data
bytes — planning never opens data files), timed three ways:

  loop-cold  : caches cleared; read_manifest (json parse + resolve)
               then the driver-side prune_files loop
  loop-warm  : same, memo hot (the steady-state driver loop)
  distributed: prune_files_distributed over the sealed segments (the
               >threshold path scan_table takes)

Usage: python tools_metadata_bench.py [N ...]   (default 20000 100000)
Appends nothing; prints a markdown table to paste into BASELINE.md.
"""

from __future__ import annotations

import sys
import time


def build_table(path: str, n: int) -> None:
    from iceberg_file_writer_spark.ingest import snapshots as S

    entries = [
        {
            "path": f"data/f{i:07d}.parquet",
            "rows": 4096,
            "stats": {
                "k": [i * 100, i * 100 + 99, 0],
                "v": [0.0, 1.0, None],
            },
        }
        for i in range(n)
    ]
    S._commit(path, 0, "append", entries)


def bench(spark, path: str, n: int) -> dict:
    from iceberg_file_writer_spark.ingest import snapshots as S
    from iceberg_file_writer_spark.ingest.file_skipping import (
        prune_files,
        prune_files_distributed,
    )

    conj = [("k", "=", (n // 2) * 100 + 5)]  # hits exactly one file
    out = {}

    def _loop():
        m = S.read_manifest(path, 1)
        return prune_files(m["files"], conj)

    S._MANIFEST_CACHE.clear()
    S._SEGMENT_CACHE.clear()
    t0 = time.perf_counter()
    kept = _loop()
    out["loop_cold_s"] = time.perf_counter() - t0
    assert len(kept) == 1, len(kept)

    t0 = time.perf_counter()
    kept = _loop()
    out["loop_warm_s"] = time.perf_counter() - t0
    assert len(kept) == 1

    m = S.read_manifest_layout(path, 1)
    segs, tail = m.get("segments") or [], m.get("tail") or []
    if segs:
        for label in ("dist_cold_s", "dist_warm_s"):
            t0 = time.perf_counter()
            kept = prune_files_distributed(spark, path, segs, tail, conj)
            out[label] = time.perf_counter() - t0
            assert len(kept) == 1
    return out


def main() -> None:
    import shutil
    import tempfile

    from iceberg_file_writer_spark.session import get_spark

    ns = [int(a) for a in sys.argv[1:]] or [20_000, 100_000]
    spark = get_spark("metadata-bench")
    spark.range(1).count()  # absorb session startup before timing
    rows = []
    for n in ns:
        d = tempfile.mkdtemp(prefix="meta-bench-")
        try:
            t0 = time.perf_counter()
            build_table(d, n)
            commit_s = time.perf_counter() - t0
            r = bench(spark, d, n)
            r["n"], r["commit_s"] = n, commit_s
            rows.append(r)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print("| files | commit | loop cold | loop warm | dist cold | dist warm |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n']:,} | {r['commit_s']:.2f} s "
            f"| {r['loop_cold_s']:.3f} s | {r['loop_warm_s']:.3f} s "
            f"| {r.get('dist_cold_s', float('nan')):.3f} s "
            f"| {r.get('dist_warm_s', float('nan')):.3f} s |"
        )


if __name__ == "__main__":
    main()
