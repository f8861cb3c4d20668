"""Ingestion invariants — SURVEY.md §2.3 as executed assertions.

The reference's implicit contract (partition completeness, ≤4096-row
files, intra-file key ordering, snappy compression, schema+default
fidelity; reference main.go:47-85) tested against both the batch and the
streaming formulation, plus compaction.
"""

from __future__ import annotations

import json
import os
import random

import pyarrow.parquet as pq
import pytest

from iceberg_file_writer_spark.ingest.batch import (
    IngestConfig,
    ingest_batch,
    read_source,
    read_table,
)
from iceberg_file_writer_spark.ingest.maintenance import compact_table, list_data_files
from iceberg_file_writer_spark.ingest.streaming import ingest_stream_once

N_BIG_USER = 9000  # forces file rolling: > 2 * MaxSize (4096)
USERS_SMALL = ["userid2", "userid3"]


def _write_fixture_json(path: str) -> int:
    """Synthetic Location stream per FIXTURES.md §1: one hot user (rolling),
    small users, shuffled timestamps, nulls, null source (default check)."""
    rng = random.Random(42)
    rows = []
    for i in range(N_BIG_USER):
        rows.append(
            {
                "accuracy": None if i % 3 == 0 else rng.uniform(1, 50),
                "altitude": None,
                "altitudeAccuracy": None,
                "course": rng.uniform(0, 360),
                "features": [f"osm-{rng.randrange(10000)}"] if i % 2 else [],
                "latitude": 37.0 + rng.uniform(-1, 1),
                "longitude": -121.0 + rng.uniform(-1, 1),
                "speed": None,
                "source": None,  # -> default "device"
                "timestamp": 100000 + rng.randrange(10_000_000),
                "user_id": "userid1",
            }
        )
    for u in USERS_SMALL:
        for i in range(50):
            rows.append(
                {
                    "accuracy": None,
                    "altitude": None,
                    "altitudeAccuracy": None,
                    "course": None,
                    "features": ["osm-2332"],
                    "latitude": 37.0,
                    "longitude": -121.0,
                    "speed": None,
                    "source": "satellite",
                    "timestamp": 100000 + rng.randrange(10_000_000),
                    "user_id": u,
                }
            )
    rng.shuffle(rows)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return len(rows)


def _assert_invariants(table_path: str, expected_rows: int, cfg: IngestConfig) -> None:
    files = list_data_files(table_path)
    assert files, "no data files written"
    total = 0
    seen_users = set()
    for fp in files:
        # partition correctness: Hive layout user_id=<value>/...
        part_dir = os.path.basename(os.path.dirname(fp))
        assert part_dir.startswith("user_id="), fp
        user = part_dir.split("=", 1)[1]
        seen_users.add(user)
        pf = pq.ParquetFile(fp)
        md = pf.metadata
        total += md.num_rows
        # §2.3.3 file row bound
        assert md.num_rows <= cfg.max_rows_per_file, (fp, md.num_rows)
        # §2.3.5 snappy compression
        assert md.row_group(0).column(0).compression == "SNAPPY", fp
        # §2.3.4 intra-file key ordering
        ts = pf.read(columns=["timestamp"])["timestamp"].to_pylist()
        assert ts == sorted(ts), f"timestamps not sorted in {fp}"
    # §2.3.1 completeness
    assert total == expected_rows
    assert seen_users == {"userid1", *USERS_SMALL}


@pytest.fixture(scope="module")
def fixture_input(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("location-input"))
    n = _write_fixture_json(path)
    return path, n


def test_batch_ingest_invariants(spark, fixture_input, tmp_path):
    input_path, n_rows = fixture_input
    out = str(tmp_path / "table")
    cfg = IngestConfig()
    df = read_source(spark, input_path)
    ingest_batch(df, out, cfg)
    _assert_invariants(out, n_rows, cfg)

    # §2.3.6 schema fidelity + defaults: null source -> "device"
    back = read_table(spark, out)
    assert back.where(back.source.isNull()).count() == 0
    assert back.where(back.source == "device").count() == N_BIG_USER
    got = dict(back.dtypes)
    assert got["latitude"] == "double" and got["features"] == "array<string>"
    assert got["timestamp"] == "bigint"
    # partition column round-trips (read back from directory layout)
    assert set(r.user_id for r in back.select("user_id").distinct().collect()) == {
        "userid1",
        *USERS_SMALL,
    }


def test_batch_ingest_partition_pruning(spark, fixture_input, tmp_path):
    """The layout's purpose: a single-user query scans one directory."""
    input_path, _ = fixture_input
    out = str(tmp_path / "table")
    ingest_batch(read_source(spark, input_path), out)
    q = read_table(spark, out).where("user_id = 'userid2'")
    plan = q.queryExecution if False else q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == 50
    # pruned scan: only the userid2 partition directory is listed
    assert "PartitionFilters: [isnotnull(user_id" in plan, plan


def test_streaming_ingest_invariants(spark, fixture_input, tmp_path):
    input_path, n_rows = fixture_input
    out = str(tmp_path / "stream-table")
    ckpt = str(tmp_path / "ckpt")
    cfg = IngestConfig()
    ingest_stream_once(spark, input_path, out, ckpt, cfg=cfg)
    _assert_invariants(out, n_rows, cfg)


def test_streaming_restart_is_lossless(spark, fixture_input, tmp_path):
    """Checkpointed restart: a second run over the same source adds nothing
    (the reference's clean-shutdown contract, upgraded to crash-safety)."""
    input_path, n_rows = fixture_input
    out = str(tmp_path / "stream-table")
    ckpt = str(tmp_path / "ckpt")
    ingest_stream_once(spark, input_path, out, ckpt)
    ingest_stream_once(spark, input_path, out, ckpt)  # replay with same checkpoint
    back = read_table(spark, out)
    assert back.count() == n_rows


def test_compaction_preserves_invariants(spark, fixture_input, tmp_path):
    input_path, n_rows = fixture_input
    out = str(tmp_path / "stream-table")
    ckpt = str(tmp_path / "ckpt")
    cfg = IngestConfig()
    ingest_stream_once(spark, input_path, out, ckpt, cfg=cfg)
    n_before = len(list_data_files(out))
    compact_table(spark, out, cfg)
    _assert_invariants(out, n_rows, cfg)
    assert len(list_data_files(out)) <= n_before


def test_compaction_crash_recovery(spark, fixture_input, tmp_path):
    """Every compaction crash window is recoverable: stranded-at-old
    (between the swap renames), stale .compact-old beside a live table,
    and a torn .compact-tmp are all rolled forward/back on re-entry."""
    import shutil

    input_path, n_rows = fixture_input
    out = str(tmp_path / "table")
    cfg = IngestConfig()
    ingest_batch(read_source(spark, input_path), out, cfg)

    # crash window 1: between the two renames — table gone, data at .compact-old
    os.rename(out, out + ".compact-old")
    compact_table(spark, out, cfg)
    _assert_invariants(out, n_rows, cfg)

    # crash window 2: torn tmp + stale old beside a live table
    os.makedirs(out + ".compact-tmp/junk", exist_ok=True)
    shutil.copytree(out, out + ".compact-old")
    compact_table(spark, out, cfg)
    _assert_invariants(out, n_rows, cfg)
    assert not os.path.exists(out + ".compact-old")
    assert not os.path.exists(out + ".compact-tmp")


def test_epoch_commit_is_replay_idempotent(spark, fixture_input, tmp_path):
    """A replayed epoch (crash between write and checkpoint commit)
    replaces its own files instead of duplicating rows."""
    from pyspark.sql import functions as F

    from iceberg_file_writer_spark.ingest.streaming import _commit_epoch

    input_path, _ = fixture_input
    out = str(tmp_path / "table")
    os.makedirs(out, exist_ok=True)
    df = read_source(spark, input_path).limit(500)

    def stage(n_files: int) -> str:
        staging = out + ".epoch-staging"
        (
            df.repartition(n_files)
            .write.mode("overwrite")
            .partitionBy("user_id")
            .parquet(staging)
        )
        return staging

    # first attempt of epoch 7 (more files), then the "replay" (fewer files)
    _commit_epoch(stage(4), out, 7)
    _commit_epoch(stage(2), out, 7)
    # a different epoch's files are untouched by epoch 7's replay
    _commit_epoch(stage(1), out, 8)

    back = spark.read.parquet(out)
    assert back.count() == 2 * 500  # one copy from epoch 7, one from epoch 8
    names = [os.path.basename(p) for p in list_data_files(out)]
    assert all(n.startswith("epoch-") for n in names)
    assert not os.path.exists(out + ".epoch-staging")


def test_concurrent_streams_into_same_table(spark, fixture_input, tmp_path):
    """Two streaming writers committing into the SAME table path (distinct
    checkpoints, the multi-writer-append topology): per-writer staging dirs
    and writer-namespaced epoch file names mean neither stream deletes or
    overwrites the other's epochs — the table ends with both copies."""
    from iceberg_file_writer_spark.ingest.streaming import (
        drain_and_stop,
        read_stream,
        start_ingest_stream,
    )

    input_path, n_rows = fixture_input
    out = str(tmp_path / "shared-table")
    queries = []
    for i in (1, 2):
        ckpt = str(tmp_path / f"ckpt{i}")
        os.makedirs(ckpt, exist_ok=True)
        queries.append(
            start_ingest_stream(
                read_stream(spark, input_path),
                out,
                ckpt,
                trigger_seconds=1,
                query_name=f"writer{i}",
            )
        )
    for q in queries:
        drain_and_stop(q)

    back = spark.read.parquet(out)
    assert back.count() == 2 * n_rows
    names = [os.path.basename(p) for p in list_data_files(out)]
    # every committed file carries a writer namespace, and both writers landed
    widths = {n.split("-")[1] for n in names}
    assert all(n.startswith("epoch-") for n in names)
    assert len(widths) == 2, names
    # no staging residue from either writer
    assert not [d for d in os.listdir(tmp_path) if ".epoch-staging" in d]


def test_quarantine_ingest_routes_bad_records(spark, fixture_input, tmp_path):
    """Dead-letter decode: malformed lines must not kill the ingest (the
    FAILFAST contrast is asserted), must be preserved verbatim for
    replay, and the valid rows must land with the full layout
    invariants."""
    from iceberg_file_writer_spark.ingest.batch import (
        ingest_batch_with_quarantine,
        read_source,
    )

    input_path, n_rows = fixture_input
    poisoned = str(tmp_path / "poisoned.json")
    bad_lines = [
        '{"latitude": 1.0, "longitude": ',  # truncated JSON
        '{"latitude": "not-a-double", "longitude": 2.0, "features": [],'
        ' "source": "s", "timestamp": 1, "user_id": "userid9"}',  # type mismatch
    ]
    import glob

    with open(poisoned, "w") as f:
        for src in sorted(glob.glob(os.path.join(input_path, "*"))):
            with open(src) as g:
                f.write(g.read().rstrip("\n") + "\n")
        f.write("\n".join(bad_lines) + "\n")

    # the reference's strict mode refuses the same input
    with pytest.raises(Exception):
        read_source(spark, poisoned).count()

    out = str(tmp_path / "table")
    q = str(tmp_path / "quarantine")
    cfg = IngestConfig()
    n_good, n_bad = ingest_batch_with_quarantine(spark, poisoned, out, q, cfg)
    assert n_good == n_rows
    assert n_bad == len(bad_lines)
    _assert_invariants(out, n_rows, cfg)
    kept = {
        r.raw_record
        for r in spark.read.json(q).select("raw_record").collect()
    }
    assert kept == set(bad_lines)


def test_ingest_batch_observed_metrics(spark, tmp_path):
    """Write-job observability: ingest_batch returns metrics measured IN
    the write job (Observation API), matching a post-hoc scan exactly —
    without costing one."""
    src = str(tmp_path / "in")
    n = _write_fixture_json(src)
    out = str(tmp_path / "table")
    m = ingest_batch(read_source(spark, src), out, IngestConfig())
    assert m["rows_written"] == n
    table = spark.read.parquet(out)
    assert m["rows_written"] == table.count()
    lo, hi = table.selectExpr("min(timestamp)", "max(timestamp)").first()
    assert (m["min_key"], m["max_key"]) == (lo, hi)
    # approx distinct partitions lands within HLL error of the truth (3)
    assert 2 <= m["approx_partitions"] <= 4
