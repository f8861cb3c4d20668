"""TableFormat seam — Parquet today, Iceberg/Avro when jars are present.

The reference writes snappy Avro object-container files in an
"Iceberg-style" partitioned layout (reference main.go:47-54). This
environment has neither the spark-avro datasource nor an Iceberg runtime
jar (SURVEY.md §7.0), so the default is Hive-layout Parquet — the
semantics under test (partitioned, key-sorted, row-bounded, compressed
files) are format-independent. This module is the one place format
capability is probed, so swapping formats never touches pipeline code.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import SparkSession

SUPPORTED_ALWAYS = ("parquet", "orc", "json", "csv")


@lru_cache(maxsize=None)
def available_formats(app_id: str) -> dict[str, bool]:
    """Probe which writer formats the running session supports.

    Probing must go through datasource *resolution*, not Class.forName —
    Spark 4 ships the avro classes in its jar but the module is still
    "external" and unregistered, so only a real lookup tells the truth.
    A read of a nonexistent path distinguishes the two failure modes:
    unsupported format fails at resolution ("Failed to find data
    source"), a supported one fails later at path listing.
    """
    spark = SparkSession.getActiveSession()
    out = {f: True for f in SUPPORTED_ALWAYS}
    for fmt in ("avro", "iceberg"):
        try:
            spark.read.format(fmt).load("/nonexistent-format-probe")
            out[fmt] = True
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            out[fmt] = "Failed to find data source" not in msg and "ClassNotFound" not in msg
    return out


def require_format(spark: SparkSession, fmt: str) -> str:
    """Validate a table format, with actionable errors for missing jars."""
    fmt = fmt.lower()
    if fmt in SUPPORTED_ALWAYS:
        return fmt
    formats = available_formats(spark.sparkContext.applicationId)
    if formats.get(fmt):
        return fmt
    if fmt == "avro":
        raise RuntimeError(
            "avro output needs the spark-avro module on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
            "falling back is intentional — pass table_format='parquet'"
        )
    if fmt == "iceberg":
        raise RuntimeError(
            "iceberg output needs the iceberg-spark-runtime jar and a catalog "
            "config (spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
            "pass table_format='parquet' for the jar-less layout"
        )
    raise ValueError(f"unknown table format: {fmt}")
