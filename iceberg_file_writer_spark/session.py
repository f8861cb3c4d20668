"""SparkSession factory.

Single place where session-level tuning lives so tests, the driver entry
point, and bench.py all run the same configuration.

Scale posture: these settings are the *local* profile. On a real cluster the
same builder is used with a different master; the scale-relevant settings
(AQE, skew-join handling, partition sizing, UTC session time zone, Arrow)
are cluster-appropriate as-is.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Shuffle-partition default: env override, else CPU count."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(app_name: str = "iceberg_file_writer_spark") -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    - AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
      which is what keeps hot partition keys (e.g. a hot ``user_id``,
      reference main.go:50) from producing straggler tasks at scale.
    - UTC session time zone: required for value parity with the DuckDB
      oracle (DuckDB timestamps are UTC-naive).
    - Arrow on: vectorized exchange for the Pandas-UDF slow path.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.codegen.maxFields", "1000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # When no master is configured (plain `pytest` / `python bench.py` runs),
    # run local with all requested cores. Under a real cluster submit, the
    # externally-provided master wins.
    if not os.environ.get("SPARK_MASTER") and "spark.master" not in os.environ.get(
        "SPARK_SUBMIT_OPTS", ""
    ):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession, changelog: bool = True) -> None:
    """Opt into the RocksDB state store for stateful streaming queries.

    The default HDFS-backed provider keeps every state key on the executor
    heap — fine at test scale, an OOM risk once state approaches executor
    memory (streaming dedup keys, open sessions, per-user state at 100 TB).
    RocksDB keeps state on local disk with bounded memory, and changelog
    checkpointing ships per-batch deltas to the checkpoint instead of full
    snapshots — the scale-safe configuration for large-state streaming.

    Session-level conf: applies to queries started after the call; a query
    restarted from an existing checkpoint keeps the provider it was created
    with. Not enabled by default here because the local-FS test harness
    measures faster on the in-memory provider at test scale.
    """
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    if changelog:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
