"""Testdata table loaders.

Loads the driver-generated parquet tables (TESTDATA.md) and registers them
as temp views so queries can be written either as DataFrame chains or SQL.
Loading is a metadata-only operation — Catalyst prunes columns and pushes
predicates into each parquet scan at execution time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table under ``sf_dir`` and register temp views.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as long via the legacy conf and
    truncate nanos → micros (matching DuckDB's own ns→us truncation) so
    both engines see identical microsecond timestamps.
    """
    cache_key = (id(spark), sf_dir)
    if cache_key in _TABLE_CACHE:
        cached = _TABLE_CACHE[cache_key]
        # Re-point the temp views at THIS sf_dir: a prior load for a
        # different sf_dir left the session's views aimed there, and the
        # SQL surface (create_views / spark.sql users) resolves by view
        # name — without the refresh, DataFrame results and SQL results
        # could silently read different scale factors.
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Wide aggregates (64-column MinHash/SimHash) must stay inside
    # whole-stage codegen; the default field limit (100) silently drops
    # them to interpreted mode (~5x slower). Runtime-set so the driver's
    # own plain session gets it too.
    spark.conf.set("spark.sql.codegen.maxFields", "1000")
    # The timestamp_ntz -> timestamp cast below is value-preserving only
    # under a UTC session TZ; pin it so a non-UTC host cannot shift epoch
    # values (unix_micros, z-order keys, watermarks) vs DuckDB's naive
    # timestamps. Runtime-set so the driver's plain session gets it too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":
                # Testdata written as TIMESTAMP(MICROS, isAdjustedToUTC=false)
                # reads as TIMESTAMP_NTZ; the engine standardizes on session-TZ
                # TIMESTAMP (machine TZ is UTC, so the cast is value-preserving
                # and matches DuckDB's naive timestamps) — watermarks and
                # window() require it.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(name)
        out[name] = df
    _TABLE_CACHE[cache_key] = out
    return out


_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def create_views(
    spark: SparkSession,
    sf_dir: str,
    query_names: "list[str] | None" = None,
    include_eager: bool = False,
) -> list[str]:
    """Register the full SQL surface as temp views: every testdata table
    (by its own name) plus registered queries (each as ``q_<name>``), so
    users compose everything through ``spark.sql`` — the composability a
    user of "the reference + extensions" expects.

    View registration is plan construction only — nothing executes until
    a view is queried, and Catalyst optimizes ACROSS the view boundary
    (filters over a ``q_`` view push into its underlying scans). The
    exceptions are entries whose builder runs work at plan time
    (streaming run-to-completion harnesses, trained-artifact loaders,
    index materializers) — each is flagged ``eager=True`` in the
    registry, and the default surface excludes them (lint:
    tests/test_sql_surface.py patches every Spark action and registers
    the default set to prove nothing executes). Register eager entries
    by passing their names in ``query_names`` or ``include_eager=True``.

    Returns the list of registered view names.
    """
    from iceberg_file_writer_spark.queries import all_queries

    tables = load_tables(spark, sf_dir)  # registers base-table views
    registered = list(tables)
    qs = all_queries()
    if query_names is None:
        query_names = [n for n, q in qs.items() if include_eager or not q.eager]
    unknown = [n for n in query_names if n not in qs]
    if unknown:
        raise ValueError(
            f"unknown quer{'y' if len(unknown) == 1 else 'ies'}: "
            f"{', '.join(sorted(unknown))} (see list-queries)"
        )
    for name in query_names:
        qs[name].fn(spark, sf_dir).createOrReplaceTempView(f"q_{name}")
        registered.append(f"q_{name}")
    return registered


def materialize_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Opt-in SQL surface for the eager entries ``create_views`` excludes.

    An ``eager=True`` entry executes work when its builder runs (trains
    an index artifact, drives a stream to completion) — registering it as
    a lazy view would silently re-run that work on every SQL reference.
    This runs the entry ONCE, localCheckpoints the result (severing the
    lineage back to the eager builder so later SQL reads the materialized
    rows, not a re-execution), and registers it as ``q_<name>`` — so
    ``spark.sql`` users can join streaming/index results with the
    plan-only views. Returns the view name.

    The result must fit the session's storage for the checkpoint — true
    for every registered eager entry (their outputs are report-sized);
    at 100 TB a giant eager result would instead be written to a table
    and read back, which is what the ingest APIs are for.
    """
    from iceberg_file_writer_spark.queries import all_queries

    qs = all_queries()
    if name not in qs:
        raise ValueError(f"unknown query: {name} (see list-queries)")
    if not qs[name].eager:
        # plan-only entries belong in create_views; registering them here
        # would needlessly pin a checkpoint copy
        raise ValueError(
            f"{name} is plan-only — register it via create_views(); "
            "materialize_view is for eager entries"
        )
    load_tables(spark, sf_dir)
    result = qs[name].fn(spark, sf_dir).localCheckpoint(eager=True)
    view = f"q_{name}"
    result.createOrReplaceTempView(view)
    return view
