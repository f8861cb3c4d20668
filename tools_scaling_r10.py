"""Round-10 sf0.1 -> sf1 scaling extension (VERDICT r9 item 3).

The round-9 study predates its own second-half entries; this measures
them: the rewritten funnel, the skyline pair, the quality-gate scan,
and the three eager storage/streaming lifecycles. Lazy entries time
best-of-2 noop-sink runs; EAGER entries (work happens at first plan
build, memoized per (app, sf_dir)) time the FIRST build — the honest
number, since a repeat would time the memo.

Writes scaling_r10.json and prints a markdown table for BASELINE.md.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.session import get_spark
from iceberg_file_writer_spark.tables import load_tables

TARGETS = [
    "user_conversion_funnel",
    "pareto_cheapest_large_parts",
    "pareto_lineitems_3d",
    "orders_quality_expectations",
    "sql_dml_lifecycle",
    "avro_container_roundtrip",
    "streaming_multi_table_txn",
]

spark = get_spark("scaling-r10")
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

rows = []
for n in TARGETS:
    a, b = out["sf0.1"].get(n), out["sf1"].get(n)
    ratio = (
        round(b / a, 2)
        if isinstance(a, float) and isinstance(b, float) and a > 0
        else None
    )
    rows.append((n, a, b, ratio, qs[n].eager))

with open("/root/repo/scaling_r10.json", "w") as f:
    json.dump({"sf0.1": out["sf0.1"], "sf1": out["sf1"]}, f, indent=1)

print("\n| entry | sf0.1 | sf1 | ratio (10x data) | timing |")
print("|---|---|---|---|---|")
for n, a, b, r, eager in rows:
    print(
        f"| `{n}` | {a} s | {b} s | {r if r is not None else 'err'}x "
        f"| {'first-build (eager)' if eager else 'best-of-2'} |"
    )
