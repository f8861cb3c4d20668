"""Skew-mitigation utilities for hot keys [extension — not in reference].

At 100 TB the entity distribution is never uniform: a hot ``user_id``
(reference main.go:50's partition column) turns one shuffle partition into
a straggler. Two standard mitigations, engine-native:

1. AQE skew-join splitting — enabled session-wide (session.py); handles
   moderately skewed *joins* automatically at runtime.
2. Salted two-phase aggregation (this module) — for heavy *aggregations*
   on skewed keys: aggregate on (key, salt) first (spreading a hot key
   over ``n_salts`` reducers), then re-aggregate on key. Correct for any
   algebraic aggregate expressed as (partial, merge) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt column in [0, n_salts).

    ``rand()`` is seeded per task attempt; results stay correct (the salt
    only routes rows) but plans using it are non-deterministic row-wise —
    keep salting out of oracle-checked queries.
    """
    return df.withColumn(col_name, (F.rand(seed=42) * n_salts).cast("int"))


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """count(*) + sum(value) per key via salted two-phase aggregation.

    Phase 1 groups on (key, salt) — a key with 10^9 rows spreads over
    ``n_salts`` reducers; phase 2 merges the ≤ n_salts partials per key.
    Result is identical to a direct groupBy(key).
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"), F.sum("_s").alias("total_value")
    )


def broadcast_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join a skewed big side against a small side without a skewed
    shuffle: replicate the small side across salts and join on (key, salt).

    Use when the small side is broadcastable anyway but AQE skew handling
    is unavailable (e.g. a non-AQE runtime); with AQE on, prefer a plain
    broadcast join.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = with_salt(big, n_salts)
    return big_salted.join(F.broadcast(small_rep), [key, "_salt"]).drop("_salt")
