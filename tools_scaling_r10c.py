"""Round-10 fourth-continuation scaling: the 12 newest registry entries
(link-prediction/nDCG/EWMA/key-audit from the third continuation plus the
eight classifier-eval / time-series / profiling / recommendation entries)
measured at sf0.1 vs the generated sf1 (tools_gen_sf.py), best-of-2
noop-sink per SF; results MERGED into scaling_r10.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.session import get_spark
from iceberg_file_writer_spark.tables import load_tables

TARGETS = [
    "user_adamic_adar_links",
    "knn_ndcg_at_k",
    "event_type_daily_ewma",
    "orders_key_candidate_audit",
    "knn_confusion_stats",
    "event_value_auc",
    "event_value_calibration",
    "event_type_autocorrelation",
    "clicks_purchases_crosscorr",
    "fd_violation_audit",
    "token_zipf_fit",
    "customer_item_recommendations",
    "orders_benford_audit",
    "events_k_anonymity_audit",
    "incremental_agg_view_refresh",
]

spark = get_spark("scaling-r10c")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

out = {}
for sf_label, sf_dir in [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scratch/sf1"),
]:
    load_tables(spark, sf_dir)["lineitem"].count()  # footer/JIT warm
    res = {}
    for name in TARGETS:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        res[name] = round(best, 3)
        print(f"{sf_label} {name}: {best:.2f}s", flush=True)
    out[sf_label] = res

merged = json.load(open("/root/repo/scaling_r10.json"))
for name in TARGETS:
    merged["sf0.1"][name] = out["sf0.1"][name]
    merged["sf1"][name] = out["sf1"][name]
json.dump(merged, open("/root/repo/scaling_r10.json", "w"), indent=1)
for name in TARGETS:
    r = out["sf1"][name] / max(out["sf0.1"][name], 1e-9)
    print(f"ratio {name}: {r:.2f}x")
print("merged into scaling_r10.json")
