"""Bucketed tables: pre-shuffled layout for co-located joins.

The 100 TB rationale: a fact-to-fact equi-join (e.g. orders ⋈ lineitem on
the order key) shuffles BOTH sides on every query. Writing each table
bucketed by the join key moves that shuffle to ingest time, once — every
subsequent join of two tables bucketed on the same key with the same
bucket count is planned with zero Exchange (and zero sort, if sortBy
matches). This is the persistent-table complement to the per-query
``repartition`` in ingest/batch.py, and the Hive-layout stand-in for
Iceberg's bucket partition transform behind the TableFormat seam.

Bucketed writes must go through the session catalog (``saveAsTable``) —
bucket metadata lives in the table definition, not the files — so these
functions take table names, not paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_column: str,
    num_buckets: int = 16,
    sort_column: str | None = None,
    table_format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table, replacing any previous version."""
    writer = (
        df.write.mode("overwrite")
        .format(table_format)
        .bucketBy(num_buckets, bucket_column)
    )
    if sort_column is not None:
        writer = writer.sortBy(sort_column)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-key, same-bucket-count tables.

    With compatible bucketing Spark plans this without any Exchange —
    each task joins bucket i of the left with bucket i of the right.
    ``tests/test_bucketed.py`` pins that plan shape.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
