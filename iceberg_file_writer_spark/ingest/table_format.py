"""TableFormat seam — Parquet today, Iceberg/Avro when jars are present.

The reference reads Avro records and writes snappy Avro object-container
files in an "Iceberg-style" partitioned layout (reference main.go:61-65,
47-54). This environment has neither the spark-avro datasource nor an
Iceberg runtime jar (SURVEY.md §7.0), so the default is Hive-layout
Parquet — the semantics under test (partitioned, key-sorted, row-bounded,
compressed files) are format-independent. This module is the one place
format capability is probed, so swapping formats never touches pipeline
code: ``read_source(..., source_format="avro")`` and
``write_iceberg_table(...)`` light up as soon as the jars are on the
classpath, and fail with the exact fix otherwise.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

SUPPORTED_ALWAYS = ("parquet", "orc", "json", "csv")

# applicationId -> probe results; a plain dict (not lru_cache on the session
# object) so SparkSession instances aren't pinned by the cache.
_PROBE_CACHE: dict[str, dict[str, bool]] = {}


def available_formats(spark: SparkSession) -> dict[str, bool]:
    """Probe which reader/writer formats the running session supports.

    Probing must go through datasource *resolution*, not Class.forName —
    Spark 4 ships the avro classes in its jar but the module is still
    "external" and unregistered, so only a real lookup tells the truth.
    A read of a nonexistent path distinguishes the two failure modes:
    unsupported format fails at resolution ("Failed to find data
    source"), a supported one fails later at path listing.

    Takes the session explicitly — ``getActiveSession()`` is None on
    threads that didn't create the session, which would turn a missing-jar
    condition into an AttributeError.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _PROBE_CACHE:
        return _PROBE_CACHE[app_id]
    out = {f: True for f in SUPPORTED_ALWAYS}
    for fmt in ("avro", "iceberg"):
        try:
            spark.read.format(fmt).load("/nonexistent-format-probe")
            out[fmt] = True
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            out[fmt] = "Failed to find data source" not in msg and "ClassNotFound" not in msg
    _PROBE_CACHE[app_id] = out
    return out


def require_format(spark: SparkSession, fmt: str) -> str:
    """Validate a table format, with actionable errors for missing jars."""
    fmt = fmt.lower()
    if fmt in SUPPORTED_ALWAYS:
        return fmt
    if available_formats(spark).get(fmt):
        return fmt
    if fmt == "avro":
        raise RuntimeError(
            "avro I/O needs the spark-avro module on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
            "falling back is intentional — pass source_format/table_format='parquet'"
        )
    if fmt == "iceberg":
        raise RuntimeError(
            "iceberg output needs the iceberg-spark-runtime jar and a catalog "
            "config (spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
            "pass table_format='parquet' for the jar-less layout"
        )
    raise ValueError(f"unknown table format: {fmt}")
