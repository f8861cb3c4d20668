"""Custom data sources (Spark 4 Python DataSource API)."""

from iceberg_file_writer_spark.sources.location_stream import (
    LocationStreamDataSource,
    register_location_source,
)

__all__ = ["LocationStreamDataSource", "register_location_source"]
