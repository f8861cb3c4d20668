"""Round-9 sf0.1 -> sf1 scaling study (VERDICT r8 directive 1).

Runs the driver surface + top-cost registry extras at sf0.1 and at the
generated sf1 (tools_gen_sf.py) in ONE session, best-of-2 noop-sink
timings per entry per SF, and writes per-entry ratios to scaling.json.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")

from iceberg_file_writer_spark.queries import all_queries, driver_queries
from iceberg_file_writer_spark.session import get_spark
from iceberg_file_writer_spark.tables import load_tables

EXTRAS = [
    "streaming_interval_left_join", "event_value_trends",
    "neardup_canonical_by_quality", "ivf_knn_cosine",
    "minhash_estimator_error", "customer_entity_clusters",
    "entity_survivorship", "embedding_cluster_dedup",
    "upsert_mor_orders_read", "user_triangle_count",
    "part_association_rules", "fuzzy_name_matches",
    "exact_dedup_documents", "doc_fingerprints", "kmv_theta_user_overlap",
    "zorder_box_scan", "bloom_point_lookup", "snapshot_changes_feed",
    "table_snapshot_diff",
]

spark = get_spark("scaling")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
names = list(driver_queries()) + [e for e in EXTRAS if e in qs]

# one-time streaming machinery warm at the smallest SF (bench.py:69)
for wn in ("streaming_stateful_totals", "streaming_windowed_stats"):
    if wn in qs:
        qs[wn].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

out = {}
for sf_label, sf_dir in [("sf0.1", "/root/testdata/sf0.1"),
                         ("sf1", "/root/repo/.scratch/sf1")]:
    load_tables(spark, sf_dir)["lineitem"].count()  # footer/JIT warm
    res = {}
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            try:
                qs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as ex:
                res[n] = {"err": str(ex)[:200]}
                break
            best = min(best, time.time() - t0)
        else:
            res[n] = round(best, 3)
        print(f"{sf_label} {n}: {res[n]}", flush=True)
    out[sf_label] = res

ratios = {}
for n in names:
    a, b = out["sf0.1"].get(n), out["sf1"].get(n)
    if isinstance(a, float) and isinstance(b, float) and a > 0:
        ratios[n] = round(b / a, 2)
out["ratio_sf1_over_sf0.1"] = ratios
with open("/root/repo/SCALING_r09.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("WROTE /root/repo/SCALING_r09.json")
