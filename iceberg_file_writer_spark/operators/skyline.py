"""Skyline (Pareto-front) operator [extension — not in reference].

The skyline of a relation under per-column preferences is the set of
rows no other row DOMINATES (at least as good on every dimension,
strictly better on one) — "cheapest large parts", "newest high-value
events". Naive evaluation is the O(n²) NOT-EXISTS self-join; at 100 TB
that is never an option, and the distributed literature ("Integration
of Skyline Queries into Spark SQL", EDBT 2023 — PAPERS.md) exploits
that skylines COMPOSE: skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B).

Two-dimensional skylines reduce to a prefix MIN-scan: after orienting
both dimensions to MINIMIZE, a row is dominated iff some row with
strictly smaller x has y <= mine, or an equal-x row has strictly
smaller y. Distributed exactly like any prefix scan:

1. ``repartitionByRange`` on x — equal keys land in ONE partition, and
   partition ids are range-ordered.
2. Within each partition, two window frames over one sort: the
   strictly-smaller-x running min (RANGE .. 1 PRECEDING) and the
   tie-group min (RANGE 0 .. 0). No single-task global window.
3. Cross-partition carry-in: per-partition min(y) (a partitions-count-
   sized relation) prefix-scanned and broadcast back — partition p's
   rows also compete against min(y) of every earlier partition, whose
   x are all strictly smaller by the range partitioning.

Total cost: one range shuffle + one windowed pass + one tiny broadcast
— O(n log n) work, no all-pairs anywhere, every partition independent.
Ties on BOTH dimensions are mutually non-dominating and all kept —
exactly the NOT-EXISTS semantics (the DuckDB oracle runs that literal
definition; parity proves this plan equivalent).

RANGE frames require an integral ORDER key, so callers pass ``scale``
— the factor that makes the x dimension exact-integer (100 for
2-decimal money; 1 for ints). Exact, not approximate: testdata money
IS 2-decimal (checked).

Dimensions beyond 2 need the composition + broadcast-verify plan
(local skylines are small; verification is candidates x candidates);
no registry entry needs it yet — the EDBT paper has the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    x: str,
    y: str,
    minimize_x: bool = True,
    minimize_y: bool = True,
    scale: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the 2-D Pareto front of (x, y) under the given
    orientations. Output columns = input columns; duplicates on both
    dimensions are all kept (mutually non-dominating)."""
    sx = F.round(F.col(x) * scale).cast("long")
    if not minimize_x:
        sx = -sx
    yy = F.col(y) if minimize_y else -F.col(y)
    nparts = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    d = (
        df.withColumn("_sk_x", sx)
        .withColumn("_sk_y", yy)
        .repartitionByRange(nparts, "_sk_x")
        .withColumn("_pid", F.spark_partition_id())
    )
    w_prev = (
        Window.partitionBy("_pid")
        .orderBy("_sk_x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tie = Window.partitionBy("_pid").orderBy("_sk_x").rangeBetween(0, 0)
    d = d.withColumn("_sk_prev", F.min("_sk_y").over(w_prev)).withColumn(
        "_sk_tie", F.min("_sk_y").over(w_tie)
    )
    # carry-in: min(y) of every EARLIER range partition (strictly
    # smaller x by construction); partitions-count-sized, broadcast
    carry = d.groupBy("_pid").agg(F.min("_sk_y").alias("_pmin"))
    w_c = Window.orderBy("_pid").rangeBetween(Window.unboundedPreceding, -1)
    carry = carry.withColumn("_carry", F.min("_pmin").over(w_c)).select(
        "_pid", "_carry"
    )
    d = d.join(F.broadcast(carry), "_pid", "left")
    best_prev = F.least("_sk_prev", "_carry")  # least ignores NULLs
    kept = d.where(
        (best_prev.isNull() | (best_prev > F.col("_sk_y")))
        & (F.col("_sk_tie") == F.col("_sk_y"))
    )
    return kept.drop("_sk_x", "_sk_y", "_sk_prev", "_sk_tie", "_carry", "_pid")
