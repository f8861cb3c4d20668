"""Round-10 continuation scaling: the post-closing-record entries.

Measures the five second-half additions at sf0.1 vs the generated sf1
(10x bench data), best-of-2 noop-sink per SF (first-build for the eager
DDL lifecycle), and MERGES the results into scaling_r10.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.session import get_spark
from iceberg_file_writer_spark.tables import load_tables

TARGETS = [
    "doc_dup_span_removal",
    "purchase_multitouch_attribution",
    "user_label_propagation",
    "user_bfs_hops",
    "sql_ddl_lifecycle",
]

spark = get_spark("scaling-r10b")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

out = {}
for sf_label, sf_dir in [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scratch/sf1"),
]:
    load_tables(spark, sf_dir)["lineitem"].count()  # footer/JIT warm
    res = {}
    for n in TARGETS:
        q = qs[n]
        runs = 1 if q.eager else 2
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            try:
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:
                res[n] = {"err": str(ex)[:200]}
                break
            best = min(best, time.time() - t0)
        else:
            res[n] = round(best, 3)
        print(f"{sf_label} {n}: {res[n]}", flush=True)
    out[sf_label] = res

with open("/root/repo/scaling_r10.json") as f:
    merged = json.load(f)
for sf_label in ("sf0.1", "sf1"):
    merged[sf_label].update(out[sf_label])
with open("/root/repo/scaling_r10.json", "w") as f:
    json.dump(merged, f, indent=1)

print("\n| entry | sf0.1 | sf1 | ratio (10x data) | timing |")
print("|---|---|---|---|---|")
for n in TARGETS:
    a, b = out["sf0.1"].get(n), out["sf1"].get(n)
    r = (
        round(b / a, 2)
        if isinstance(a, float) and isinstance(b, float) and a > 0
        else "err"
    )
    print(
        f"| `{n}` | {a} s | {b} s | {r}x "
        f"| {'first-build (eager)' if qs[n].eager else 'best-of-2'} |"
    )
