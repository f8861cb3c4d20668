"""COPY INTO: file-idempotent bulk loading on the statement surface
[extension — re-expressing the reference's own pipeline].

The reference (/root/reference/main.go:117-141) is exactly this verb as
a process: list record files, decode them, land the rows in a
partitioned table. Here it is one statement:

    COPY INTO t FROM '<file-or-dir>' [FORMAT PARQUET|CSV|AVRO]

with the contract production COPY INTO (Delta's) carries and the
reference's restart story needs:

- **file-level idempotence**: every loaded source file is recorded in
  the commit's manifest under ``"copied"`` — keyed by (absolute path,
  mtime_ns, size), so a re-run after a crash or on a schedule loads
  only files it has not seen (a REWRITTEN source file is a new key and
  loads again). The ledger rides IN the manifest — atomically with the
  data it describes, carried across interleaved DML by ``_commit`` —
  so there is no window where data committed but the ledger did not.
- **target-shaped decode**: rows project to the TABLE's schema.
  Parquet columns resolve by name and cast to the declared types; CSV
  parses under the table schema (header expected); Avro containers
  decode through the jar-free codec with the table's Avro schema as
  the READER schema — the spec's Schema Resolution rules, the same
  contract the ingest edge applies (``avro_py.decode_resolved``).
- both table flavors: mapped targets append through the field-id verb
  (files stamped with the current mapping), plain targets through
  ``commit_append``; either way the standing hidden-partition spec
  clusters the batch like every other write.

At 100 TB: listing is the object store's problem (one LIST per COPY);
decode and write are executor-parallel (one task per source file for
Avro via binaryFile, native parallel reads for parquet/CSV); the skip
check is a set difference against manifest metadata — no data IO for
already-loaded files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXTS = {"parquet": ".parquet", "csv": ".csv", "avro": ".avro"}


def _source_files(src: str, fmt: str) -> list:
    """Absolute source file paths: the file itself, or a recursive
    listing of ``fmt``-suffixed files under a directory (skipping
    dot/underscore bookkeeping like _SUCCESS)."""
    src = os.path.abspath(src)
    if os.path.isfile(src):
        return [src]
    if not os.path.isdir(src):
        raise ValueError(f"COPY INTO source does not exist: {src}")
    ext = _EXTS[fmt]
    out = []
    for root, _dirs, names in os.walk(src):
        for n in names:
            if n.endswith(ext) and not n.startswith((".", "_")):
                out.append(os.path.join(root, n))
    return sorted(out)


def _file_key(path: str) -> str:
    st = os.stat(path)
    return f"{path}:{st.st_mtime_ns}:{st.st_size}"


def _table_schema(spark: SparkSession, table_path: str, m: dict):
    """The target table's Spark schema (mapped: synthesized from the
    mapping, so an EMPTY table still types the load)."""
    from pyspark.sql import types as T

    if "columns" in m:
        ddl = ", ".join(f"`{name}` {typ}" for _id, name, typ in m["columns"])
        return T.StructType.fromDDL(ddl)
    from iceberg_file_writer_spark.ingest.snapshots import read_table_version

    return read_table_version(spark, table_path).schema


def _read_source(
    spark: SparkSession, paths: list, fmt: str, schema
) -> DataFrame:
    if fmt == "parquet":
        df = spark.read.parquet(*paths)
        return df.select(
            *[F.col(f.name).cast(f.dataType) for f in schema.fields]
        )
    if fmt == "csv":
        return spark.read.schema(schema).option("header", "true").csv(paths)
    if fmt == "avro":
        from iceberg_file_writer_spark.ingest.avro_py import (
            avro_schema_of,
            spark_read_avro,
        )

        return spark_read_avro(
            spark, paths, schema, reader_schema=avro_schema_of(schema)
        )
    raise ValueError(f"unknown COPY INTO format: {fmt}")


def copy_into(
    spark: SparkSession,
    table_path: str,
    src: str,
    fmt: str = "parquet",
    max_rows: int = 4096,
) -> dict:
    """Load unseen source files into the table; returns
    ``{"version", "files_loaded", "files_skipped"}`` (version unchanged
    when everything was already loaded — a re-run is a no-op commit-
    wise, not an empty commit)."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )

    fmt = fmt.strip().lower()
    if fmt not in _EXTS:
        raise ValueError(
            f"COPY INTO supports FORMAT {sorted(_EXTS)}, got {fmt!r}"
        )
    v = current_version(table_path)
    m = read_manifest(table_path, v)
    seen = set(m.get("copied") or [])
    files = _source_files(src, fmt)
    if not files:
        raise ValueError(f"no .{fmt} files under {src}")
    todo = [p for p in files if _file_key(p) not in seen]
    if not todo:
        return {
            "version": v,
            "files_loaded": 0,
            "files_skipped": len(files),
        }
    schema = _table_schema(spark, table_path, m)
    df = _read_source(spark, todo, fmt, schema)
    ledger = sorted(seen | {_file_key(p) for p in todo})
    if "columns" in m:
        from iceberg_file_writer_spark.ingest.column_mapping import (
            append_mapped,
        )

        nv = append_mapped(
            spark,
            df,
            table_path,
            max_rows=max_rows,
            extra_manifest={"copied": ledger},
            op="copy",
        )
    else:
        from iceberg_file_writer_spark.ingest.snapshots import commit_append

        nv = commit_append(
            spark,
            df,
            table_path,
            max_rows=max_rows,
            extra={"copied": ledger},
            op="copy",
        )
    return {
        "version": nv,
        "files_loaded": len(todo),
        "files_skipped": len(files) - len(todo),
    }
