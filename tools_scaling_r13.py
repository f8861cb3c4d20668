"""Round-13 sf0.1 -> sf1 scaling study for this round's new/changed
entries (VERDICT scale-grade protocol; sf1 corpus from tools_gen_sf.py,
distributionally honest 10x of sf0.1).

Covers: the twelfth-rotation promotions (now driver-attested), the four
new statement-surface oracle entries, and regression sentinels for the
two read-path changes of the round (the CDF planner step delta and the
explicit-schema epoch projection). Best-of-2 noop-sink timings per
entry per SF; per-entry ratios land in scaling_r13.json (10x data =>
ratio ~1-2x is the healthy band; entry-isolation clearCache between
entries as in bench.py).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.session import get_spark
from iceberg_file_writer_spark.tables import load_tables

NAMES = [
    # twelfth-rotation promotions (driver-attested this round)
    "mapped_partitioned_pruned_scan",
    "relayout_cdc_quiet",
    # new statement-surface entries
    "sql_cdf_lifecycle",
    "sql_wap_lifecycle",
    "type_widening_lifecycle",
    "snapshots_metadata_log",  # now routed through execute_query
    # read-path change regression sentinels
    "cdc_typed_changes",
    "streaming_cdf_feed",
    "mapped_table_lifecycle",
]

spark = get_spark("scaling-r13")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
for wn in ("streaming_stateful_totals", "streaming_windowed_stats"):
    if wn in qs:
        qs[wn].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

out = {}
for sf_label, sf_dir in [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scratch/sf1"),
]:
    load_tables(spark, sf_dir)["lineitem"].count()
    res = {}
    for n in NAMES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            try:
                qs[n].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:
                res[n] = {"err": str(ex)[:200]}
                break
            best = min(best, time.time() - t0)
        else:
            res[n] = round(best, 3)
        print(f"{sf_label} {n}: {res[n]}", flush=True)
        spark.catalog.clearCache()
    out[sf_label] = res

ratios = {}
for n in NAMES:
    a, b = out["sf0.1"].get(n), out["sf1"].get(n)
    if isinstance(a, float) and isinstance(b, float) and a > 0:
        ratios[n] = round(b / a, 2)
out["ratio_sf1_over_sf0.1"] = ratios
with open("/root/repo/scaling_r13.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps(ratios, indent=1, sort_keys=True))
