"""Round-13 optimization profiler: isolate entries, decompose plan-build
vs execution time, and dump .explain("formatted") plans.

Usage:
  python tools_opt_profile.py <entry> [<entry> ...] [--plans-dir plans/r13] \
      [--runs 2] [--suffix before]

For each entry (fresh shared session, bench warm-up protocol):
  - t_build: time for fn(spark, sf_dir) to return (eager entries run their
    stream/index build here)
  - t_exec[i]: per-run noop-sink write times
  - writes plans/r13/<entry>_<suffix>.txt with explain("formatted")

Mirrors bench.py methodology (best-of-2, clearCache between entries) so the
numbers are comparable to BENCH_DETAIL.json rows.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_dir = "plans/r14"
    runs = 2
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--no-plans":
            plans_dir = ""
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from iceberg_file_writer_spark.queries import all_queries
    from iceberg_file_writer_spark.session import get_spark
    from iceberg_file_writer_spark.tables import load_tables

    # validate entry names BEFORE paying session + warm-up cost (r14,
    # ADVICE: a typo'd name used to KeyError only in the profiling loop)
    known = all_queries()
    unknown = [n for n in names if n not in known]
    if unknown:
        sys.exit(
            f"unknown entr{'y' if len(unknown) == 1 else 'ies'}: "
            f"{', '.join(unknown)} — pick from all_queries() "
            f"({len(known)} registered)"
        )

    spark = get_spark("opt-profile")
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
    if any(n.startswith("streaming") or queries[n].eager for n in names if n in queries):
        for warm_name in ("streaming_stateful_totals", "streaming_windowed_stats"):
            if warm_name in queries:
                queries[warm_name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        q = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        builds = []
        df = None
        for r in range(runs):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            times.append(t2 - t1)
            print(
                f"  {name} run{r}: build={t1-t0:.3f}s exec={t2-t1:.3f}s total={t2-t0:.3f}s",
                flush=True,
            )
        best_total = min(b + e for b, e in zip(builds, times))
        print(f"{name}: best_total={best_total:.3f}s", flush=True)
        if plans_dir and df is not None:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
