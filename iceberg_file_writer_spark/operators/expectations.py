"""Declarative data-quality expectations [extension — not in reference].

A 100 TB ingest needs its contracts CHECKED where the data lives: the
"expectations" pattern (not-null, uniqueness, value ranges, enum
membership, referential integrity) evaluated as ONE relational pass
rather than a per-rule scan storm. Every non-referential rule compiles
to a conditional aggregate over the same scan (Catalyst fuses them into
a single HashAggregate — k rules cost one table read); uniqueness adds
count(DISTINCT col) to that same aggregate; referential rules each add
one broadcast anti-join semijoin count (dimension-sized relations).

Rule shapes (tuples, order = report order):

    ("not_null", col)                   NULL values
    ("unique", col)                     duplicated non-null values
    ("range", col, lo, hi)              non-null values outside [lo, hi]
    ("in_set", col, [v, ...])           non-null values outside the set
    ("ref", col, dim_df, dim_col)       non-null values absent from dim

Returns one row per rule: (rule, column, n_violations, passed) — a
report relation, joinable/storable like any other, so quality gates
compose with the rest of the engine (e.g. refuse a publish when any
``passed`` is false).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, expectations: list) -> DataFrame:
    aggs = []
    names = []
    ref_rules = []
    for rule in expectations:
        kind, col = rule[0], rule[1]
        label = f"{kind}:{col}"
        if kind == "not_null":
            aggs.append(
                F.count_if(F.col(col).isNull()).alias(label)
            )
        elif kind == "unique":
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col))).alias(label)
            )
        elif kind == "range":
            lo, hi = rule[2], rule[3]
            aggs.append(
                F.count_if(
                    F.col(col).isNotNull()
                    & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))
                ).alias(label)
            )
        elif kind == "in_set":
            vals = list(rule[2])
            aggs.append(
                F.count_if(
                    F.col(col).isNotNull() & ~F.col(col).isin(vals)
                ).alias(label)
            )
        elif kind == "ref":
            ref_rules.append(rule)
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
        names.append((kind, col, label))

    spark = df.sparkSession
    rows = []
    if aggs:
        agg_row = df.agg(*aggs).first()
        for kind, col, label in names:
            n = int(agg_row[label] or 0)
            rows.append((f"{kind}", col, n, n == 0))
    for kind, col, dim_df, dim_col in ref_rules:
        # broadcast anti-join: orphaned foreign keys (dimension-sized
        # build side — the only rule shape that cannot fuse into the
        # single-scan aggregate)
        n = int(
            df.where(F.col(col).isNotNull())
            .join(
                F.broadcast(dim_df.select(F.col(dim_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .count()
        )
        rows.append(("ref", col, n, n == 0))
    return spark.createDataFrame(
        rows, "rule string, column string, n_violations long, passed boolean"
    )
