"""As-of and bounded range joins over event streams [extension].

Spark has no native as-of join; the engine provides the two scalable
formulations (pyspark guide "Common OLAP patterns"):

- ``merge_asof``: union + carry-forward window — one shuffle on the
  entity key, linear per partition. The right tool when every left row
  needs the latest earlier right row.
- ``bounded_range_join``: time-bucketized equi-join — join key =
  (entity, time bucket), each left row probes its own and the previous
  bucket, then the exact range predicate filters. Turns an O(n·m)
  inequality join into a co-partitioned equi-join whose cost is bounded
  by bucket occupancy. The right tool for "all right rows within a
  window before the left row".

Both are pure DataFrame plans; the queries layer (queries/events.py,
queries/relational_ext.py) oracle-checks them against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    tie_break: str,
) -> DataFrame:
    """For each left row, attach the most recent strictly-earlier right row.

    ``on``: event-time column present in both; ``by``: entity key;
    ``right_cols``: right columns to carry (renamed as given);
    ``tie_break``: unique ordering column present in both sides.

    Left rows sort before right rows at an equal ``on`` value (kind 0 < 1)
    and the carry-forward frame ends at 1 PRECEDING, giving strict
    "earlier than" semantics — same contract as pandas merge_asof with
    allow_exact_matches=False.
    """
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lk = left.select(
        *left.columns,
        F.lit(0).alias("_kind"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in right_cols],
    )
    rk = right.select(
        *[
            F.col(c) if c in right.columns else F.lit(None).cast(ltypes[c]).alias(c)
            for c in left.columns
        ],
        F.lit(1).alias("_kind"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    stream = lk.unionByName(rk)
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_kind", tie_break)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = stream.select(
        "*",
        *[
            F.last(F.when(F.col("_kind") == 1, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_kind") == 0).drop(
        "_kind", *[f"_r_{c}" for c in right_cols]
    )


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same ``by`` key where
    ``0 <= left_ts - right_ts < window_seconds`` — bucketized.

    Bucket width = the window, so a left row's matches lie in its own or
    the previous bucket: explode the left side to those two bucket probes
    and equi-join on (key, bucket). Shuffle is on (key, bucket) — bounded
    fan-out of 2×, no inequality-join blowup.
    """
    wsec = F.lit(window_seconds)
    lb = F.floor(F.unix_micros(F.col(left_ts)) / (wsec * 1_000_000)).cast("long")
    rb = F.floor(F.unix_micros(F.col(right_ts)) / (wsec * 1_000_000)).cast("long")
    probes = F.explode(F.array(lb, lb - 1)).alias("_bucket")
    lx = left.select("*", probes)
    rx = right.select("*", rb.alias("_bucket"))
    # a right row lives in exactly one bucket, and the two probe buckets
    # differ — no duplicate pairs, so no distinct() needed
    joined = lx.join(rx, [by, "_bucket"]).drop("_bucket")
    delta_us = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
    return joined.where((delta_us >= 0) & (delta_us < wsec * 1_000_000))
