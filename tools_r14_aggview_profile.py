"""r14 item-1 profiler: decompose streaming_agg_view_maintenance /
streaming_upsert_mor_state into their per-phase costs.

Wraps the ingest-layer verbs with timers (no behavior change) and runs the
entries once, printing per-call timings:
  commit_upsert, refresh_agg_view, changes_tagged, _carried_mor_delta
so the r14 optimization targets the phase that actually costs.
"""

from __future__ import annotations

import os
import time

calls: list[tuple[str, float]] = []


def _wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.time()
        out = orig(*a, **kw)
        calls.append((name, time.time() - t0))
        return out

    setattr(mod, name, timed)
    return orig


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from iceberg_file_writer_spark.queries import all_queries
    from iceberg_file_writer_spark.session import get_spark
    from iceberg_file_writer_spark.tables import load_tables

    import iceberg_file_writer_spark.ingest.agg_view as agg_view
    import iceberg_file_writer_spark.ingest.equality_deletes as eqd
    import iceberg_file_writer_spark.ingest.snapshots as snaps

    spark = get_spark("r14-aggview-profile")
    tables = load_tables(spark, sf_dir)
    tables["lineitem"].count()

    queries = all_queries()
    # streaming warm-up identical to bench.py
    base = os.path.dirname(sf_dir.rstrip("/"))
    candidates = sorted(
        os.path.join(base, n)
        for n in os.listdir(base or ".")
        if n.startswith("sf") and os.path.isdir(os.path.join(base, n))
    )
    warm_dir = candidates[0] if candidates else sf_dir
    for warm_name in ("streaming_stateful_totals", "streaming_windowed_stats"):
        if warm_name in queries:
            queries[warm_name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    # wrap AFTER import so entry code resolves the wrapped attributes —
    # note agg_view/streaming_ops import these inside functions, so the
    # module-attribute wrap is what they see
    _wrap(eqd, "commit_upsert")
    _wrap(agg_view, "refresh_agg_view")
    _wrap(snaps, "changes_tagged")
    _wrap(snaps, "_carried_mor_delta")
    _wrap(snaps, "_read_files")
    _wrap(agg_view, "_fold_signed")
    _wrap(agg_view, "_write_data")

    import sys

    for entry in sys.argv[1:] or ["streaming_agg_view_maintenance"]:
        for run in range(2):
            calls.clear()
            t0 = time.time()
            df = queries[entry].fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            print(f"\n=== {entry} run{run}: build={t1-t0:.3f}s exec={t2-t1:.3f}s")
            agg: dict[str, list[float]] = {}
            for n, dt in calls:
                agg.setdefault(n, []).append(dt)
            for n, ds in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
                print(
                    f"  {n}: n={len(ds)} total={sum(ds):.3f}s "
                    f"each={'/'.join(f'{d:.3f}' for d in ds)}"
                )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
