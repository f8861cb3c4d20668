"""Semantic contracts for analytics operators beyond the value oracle."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cusum_equals_sequential_recursion(spark):
    """The distributed prefix-min form must equal the textbook recursion
    S_t = max(0, S_{t-1} + (x_t - mu - k)) exactly — the identity, not an
    approximation."""
    from collections import defaultdict

    from iceberg_file_writer_spark.queries import all_queries
    from iceberg_file_writer_spark.queries.analytics_ext import (
        CUSUM_SLACK_CENTS,
    )
    from iceberg_file_writer_spark.tables import load_tables

    rows = all_queries()["event_type_cusum_drift"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = defaultdict(list)
    for r in rows:
        got[r.event_type].append((r.day, r.cusum_cents))
    import math

    daily = (
        load_tables(spark, "/root/testdata/sf0.001")["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                0,
            )
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.cents))
    for et, sr in series.items():
        sr.sort()
        # HALF_UP like both engines' round() — Python round() is
        # half-to-even and would diverge on an exactly-.5 mean
        mu = math.floor(sum(c for _, c in sr) / len(sr) + 0.5)
        s, seq = 0, []
        for d, c in sr:
            s = max(0, s + (c - mu - CUSUM_SLACK_CENTS))
            seq.append((d, s))
        assert sorted(got[et]) == seq, et
