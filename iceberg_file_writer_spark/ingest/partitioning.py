"""Hidden partitioning: transform specs, bucket pruning [extension].

Iceberg's insight: users query RAW columns; the table silently
maintains a partition layout derived from transforms of them, and the
scanner maps raw predicates onto the layout. Here the layout is
manifest-stats file skipping (``ingest/file_skipping.py``), so:

- **time transforms** (day/month of a timestamp) need NO hidden
  column at all: clustering by the transform makes each file's RAW
  min/max tight, and a raw ``ts >= X`` predicate prunes directly —
  the transform's only job is the write-side clustering.
- **bucket transforms** add pruning power range stats cannot give: a
  point lookup on a high-cardinality key that the sort order does not
  cover. The writer materializes a hidden ``_b_<col>`` column
  (md5-derived bucket id — bit-identical in Spark SQL and Python, so
  the scanner computes the literal's bucket driver-side) and clusters
  by it; the scanner augments ``col = v`` with ``_b_<col> =
  bucket(v)``, which the per-file stats then prune on.

The spec rides in the manifest (``"spec"``), so scans self-configure
and the spec can EVOLVE: files written under an old spec simply lack
the new hidden column's stats and survive pruning conservatively —
correctness never depends on layout, only scan cost does.

At 100 TB: a day+bucket spec turns full-corpus point lookups into
O(files-per-day / n_buckets) reads with zero layout knowledge in
queries.

Reference scope note: the reference (/root/reference/main.go:47-54)
partitions by a literal column value only; this derives the
transform-based layout above that write path. [extension]
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# spec entry forms: ("day", col) | ("month", col) | ("bucket", n, col)


def _bucket_expr(col: str, n: int):
    """md5-based bucket id — replayable in Python for literals."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(n),
    )


def bucket_of(value, n: int) -> int:
    """The driver-side twin of ``_bucket_expr`` for a literal."""
    digest = hashlib.md5(str(value).encode()).hexdigest()[:15]
    return int(digest, 16) % n


def _hidden_cols(spec: list) -> "list[tuple[str, object]]":
    out = []
    for tr in spec:
        if tr[0] == "bucket":
            _k, n, col = tr
            out.append((f"_b_{col}", _bucket_expr(col, n)))
    return out


def _cluster_cols(spec: list) -> list[str]:
    cols = []
    for tr in spec:
        if tr[0] == "day":
            cols.append(f"_d_{tr[1]}")
        elif tr[0] == "month":
            cols.append(f"_m_{tr[1]}")
        elif tr[0] == "bucket":
            cols.append(f"_b_{tr[2]}")
        else:
            raise ValueError(f"unknown transform: {tr[0]}")
    return cols


def commit_append_partitioned(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    spec: list,
    max_rows: int = 4096,
) -> int:
    """Append under a hidden-partition spec: rows cluster by the
    transforms (files align with transform values, making their stats
    tight), hidden bucket columns are materialized, and the spec is
    recorded in the manifest."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        _commit,
        _write_data_files,
        current_version,
        read_manifest,
    )

    work = df
    cluster = []
    for tr in spec:
        if tr[0] == "day":
            c = f"_d_{tr[1]}"
            work = work.withColumn(c, F.date_format(tr[1], "yyyy-MM-dd"))
        elif tr[0] == "month":
            c = f"_m_{tr[1]}"
            work = work.withColumn(c, F.date_format(tr[1], "yyyy-MM"))
        elif tr[0] == "bucket":
            c = f"_b_{tr[2]}"
            work = work.withColumn(c, _bucket_expr(tr[2], tr[1]))
        else:
            raise ValueError(f"unknown transform: {tr[0]}")
        cluster.append(c)
    # cluster files along the spec; drop the time helpers (raw stats
    # prune time ranges), KEEP bucket cols (their stats carry the
    # pruning signal range stats cannot)
    keep_hidden = [c for c in cluster if c.startswith("_b_")]
    work = (
        work.repartitionByRange(*[F.col(c) for c in cluster])
        .sortWithinPartitions(*cluster)
        .drop(*[c for c in cluster if c not in keep_hidden])
    )
    parent = current_version(table_path)
    prev = read_manifest(table_path, parent)["files"] if parent else []
    files = _write_data_files(work, table_path, max_rows)
    return _commit(
        table_path, parent, "append", prev + files, extra={"spec": spec}
    )


def scan_partitioned(
    spark: SparkSession,
    table_path: str,
    conjuncts: list,
    version: int | None = None,
) -> DataFrame:
    """File-skipping scan where predicates on RAW columns also prune via
    the spec's transforms (bucket equality); hidden columns never
    surface. Row-identical to the unpruned filtered read."""
    from iceberg_file_writer_spark.ingest.file_skipping import (
        conjuncts_to_sql,
        prune_files,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )
    import os

    v = current_version(table_path) if version is None else version
    m = read_manifest(table_path, v)
    spec = m.get("spec", [])
    buckets = {tr[2]: tr[1] for tr in spec if tr[0] == "bucket"}
    augmented = list(conjuncts)
    for col, op, *rest in conjuncts:
        if op == "=" and col in buckets:
            augmented.append((f"_b_{col}", "=", bucket_of(rest[0], buckets[col])))
    kept = prune_files(m["files"], augmented)
    scan_partitioned.last_files = (len(kept), len(m["files"]))
    residual = conjuncts_to_sql(conjuncts)  # raw predicates only
    hidden = [f"_b_{c}" for c in buckets]
    if not kept:
        from iceberg_file_writer_spark.ingest.snapshots import (
            read_table_version,
        )

        out = read_table_version(spark, table_path, v).where("false")
        return out.drop(*hidden)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(*[os.path.join(table_path, e["path"]) for e in kept])
        .where(residual)
        .drop(*hidden)
    )
