"""Round-13 third scaling batch: sql_copy_lifecycle at sf0.1 -> sf1
(same best-of-2 noop-sink protocol; merges into scaling_r13.json)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.session import get_spark
from iceberg_file_writer_spark.tables import load_tables

NAMES = ["sql_copy_lifecycle"]

spark = get_spark("scaling-r13c")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

with open("/root/repo/scaling_r13.json") as f:
    out = json.load(f)

for sf_label, sf_dir in [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scratch/sf1"),
]:
    load_tables(spark, sf_dir)["lineitem"].count()
    res = out.setdefault(sf_label, {})
    for n in NAMES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        res[n] = round(best, 3)
        print(f"{sf_label} {n}: {res[n]}", flush=True)
        spark.catalog.clearCache()

ratios = out.setdefault("ratio_sf1_over_sf0.1", {})
for n in NAMES:
    a, b = out["sf0.1"].get(n), out["sf1"].get(n)
    if isinstance(a, float) and isinstance(b, float) and a > 0:
        ratios[n] = round(b / a, 2)
with open("/root/repo/scaling_r13.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({n: ratios.get(n) for n in NAMES}))
