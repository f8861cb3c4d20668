"""Manifest-level file skipping [extension — not in reference].

Every snapshot-table data file carries column min/max/null-count stats
in its manifest entry (``snapshots._file_stats`` — harvested from the
parquet footer the writer already parses, zero extra IO). This module
turns those into scan-time FILE PRUNING: a predicate like
``ts >= '2024-03-01'`` eliminates whole files before Spark ever lists
them — the Iceberg/Delta "data skipping" win, and at 100 TB the
difference between scanning a day and scanning a decade.

Semantics are conservative and exact: a file is skipped ONLY when its
stats PROVE no row can match (min/max disjoint from the predicate
range, or zero nulls for IS NULL); files with absent stats always
survive, and the residual predicate is still applied to the surviving
rows — so ``scan_table(...)`` is always row-identical to
``read_table_version(...).where(...)``, just cheaper. String min/max
prune with byte-order comparisons, matching Spark's BinaryComparison
on StringType.

Predicates are conjunction lists ``[(col, op, value), ...]`` with ops
``< <= > >= = != isnull notnull`` — the same shapes engines push into
scans; ``conjuncts_to_sql`` renders the residual filter.

Reference scope note: the reference (/root/reference/main.go:47-54)
writes record files with no per-file statistics; this is the metadata
index a query layer builds above that write path. [extension]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_OPS = {"<", "<=", ">", ">=", "=", "!=", "isnull", "notnull"}


def _file_can_match(stats: dict, col: str, op: str, value) -> bool:
    """False ONLY when the file's stats prove no row matches."""
    st = stats.get(col)
    if st is None:
        return True  # no stats: cannot exclude
    lo, hi, *rest = st  # legacy backfilled entries may lack null counts
    nulls = rest[0] if rest else None
    if op == "isnull" and nulls is None:
        return True  # unknown null count: cannot exclude
    if op == "isnull":
        return nulls > 0
    if op == "notnull":
        return True  # min/max exist => at least one non-null value
    if not isinstance(value, type(lo)) and not (
        isinstance(value, (int, float))
        and isinstance(lo, (int, float))
        and not isinstance(value, bool)
        and not isinstance(lo, bool)
    ):
        return True  # incomparable literal: cannot exclude
    if op == "<":
        return lo < value
    if op == "<=":
        return lo <= value
    if op == ">":
        return hi > value
    if op == ">=":
        return hi >= value
    if op == "=":
        return lo <= value <= hi
    if op == "!=":
        return not (lo == hi == value)
    raise ValueError(f"unknown op: {op}")


def prune_files(files: list, conjuncts: list) -> list:
    """Manifest entries whose stats cannot rule out every conjunct."""
    for col, op, *rest in conjuncts:
        if op not in _OPS:
            raise ValueError(f"unknown op: {op}")
    out = []
    for e in files:
        stats = e.get("stats", {})
        if all(
            _file_can_match(stats, col, op, rest[0] if rest else None)
            for col, op, *rest in conjuncts
        ):
            out.append(e)
    return out


def conjuncts_to_sql(conjuncts: list) -> str:
    parts = []
    for col, op, *rest in conjuncts:
        if op == "isnull":
            parts.append(f"`{col}` IS NULL")
        elif op == "notnull":
            parts.append(f"`{col}` IS NOT NULL")
        else:
            v = rest[0]
            if isinstance(v, str):
                # Spark string literals treat backslash as an escape;
                # escape it and the quote so a value like O'Brien cannot
                # malform (or alter) the rendered predicate
                esc = v.replace("\\", "\\\\").replace("'", "\\'")
                lit = f"'{esc}'"
            else:
                lit = repr(v)
            parts.append(f"`{col}` {op} {lit}")
    return " AND ".join(parts) if parts else "true"


def scan_table(
    spark: SparkSession,
    table_path: str,
    conjuncts: list,
    version: int | None = None,
) -> DataFrame:
    """Row-identical to ``read_table_version(...).where(conjuncts)`` but
    reads only files whose manifest stats can match. Exposes the
    surviving/total file counts on the returned DataFrame as
    ``scan_table.last_files = (kept, total)`` for observability."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        _read_files,
        current_version,
        read_manifest,
        read_table_version,
    )

    v = current_version(table_path) if version is None else version
    m = read_manifest(table_path, v)
    files = m["files"]
    kept = prune_files(files, conjuncts)
    if m.get("bloom"):
        from iceberg_file_writer_spark.ingest.bloom_index import bloom_prune

        kept = bloom_prune(table_path, m["bloom"], kept, conjuncts)
    scan_table.last_files = (len(kept), len(files))
    residual = conjuncts_to_sql(conjuncts)
    if not kept:
        # preserve the exact schema with an always-false read
        return read_table_version(spark, table_path, v).where("false")
    if len(kept) == len(files):
        return read_table_version(spark, table_path, v).where(residual)
    # Pruned path: the kept files must still honor the snapshot's
    # merge-on-read deletion vectors (anti-join in _read_files) and the
    # snapshot's FULL schema — additive evolution can leave the kept
    # subset without a column the residual (or the caller) references,
    # so align by adding typed NULL columns. The full schema comes from
    # a lazy read_table_version (parquet footer metadata only — no data
    # IO; at 100 TB the manifest would carry the schema inline).
    pruned = _read_files(spark, table_path, kept, m.get("dvs"), eqs=m.get("eqs"))
    full_schema = read_table_version(spark, table_path, v).schema
    return _align_schema(pruned, full_schema).where(residual)


def _align_schema(df: DataFrame, schema) -> DataFrame:
    """Add typed NULL columns for fields of ``schema`` missing from
    ``df`` (files that predate an additive evolution) and project to the
    schema's column order."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    for field in schema.fields:
        if field.name not in have:
            df = df.withColumn(
                field.name, F.lit(None).cast(field.dataType)
            )
    return df.select(*[f.name for f in schema.fields])
