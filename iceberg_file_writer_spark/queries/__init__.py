"""Query registry.

Every operator/query the engine claims is registered here as a ``Query``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the
same parquet tables. The driver's correctness gate compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    description: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, description: str = ""):
    """Decorator: add a query function to the global registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return all."""
    from iceberg_file_writer_spark.queries import (  # noqa: F401
        dedup,
        events,
        relational,
        relational_ext,
        similarity,
        streaming_ops,
        text,
    )

    return dict(_REGISTRY)
