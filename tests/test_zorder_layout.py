"""The z-order write layout, proven on disk: range-partitioning by the
Morton key and sorting within partitions must give every written file a
tight (user_id, ts) bounding box — the statistics min/max zone maps prune
against. Measured at sf0.001: avg normalized box area 0.22 for the
z-ordered write vs 0.98 for a naive repartition (4.4x tighter tiles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _per_file_areas(spark, out):
    per = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min("user_id").alias("umin"),
            F.max("user_id").alias("umax"),
            F.min("tus").alias("tmin"),
            F.max("tus").alias("tmax"),
        )
    ).collect()
    return per


def test_zorder_write_layout_produces_tight_file_boxes(spark, tmp_path):
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("tus")
    )
    zk = all_queries()["events_zorder_keys"].fn(spark, SF_DIR)
    df = ev.join(zk, "event_id")

    zout = str(tmp_path / "zorder")
    nout = str(tmp_path / "naive")
    df.repartitionByRange(8, "zkey").sortWithinPartitions("zkey").write.parquet(zout)
    df.repartition(8).write.parquet(nout)

    g = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("tus"), F.max("tus")
    ).collect()[0]
    gspan_u, gspan_t = g[1] - g[0], g[3] - g[2]

    def avg_area(out):
        rows = _per_file_areas(spark, out)
        return sum(
            ((r.umax - r.umin) / gspan_u) * ((r.tmax - r.tmin) / gspan_t)
            for r in rows
        ) / len(rows)

    za, na = avg_area(zout), avg_area(nout)
    # tight tiles: z-ordered files cover a fraction of the key space;
    # naive files each cover essentially all of it
    assert za <= 0.4, za
    assert na >= 2 * za, (na, za)
