"""Property-based ingestion tests (SURVEY.md §5.2.4).

Random record streams — varying partition cardinality, nulls, duplicate
and out-of-order timestamps, empty/multi-element arrays — must uphold the
§2.3 invariants: completeness, file row bound, intra-file key ordering,
partition correctness, default application.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_file_writer_spark.ingest.batch import IngestConfig, ingest_batch, read_source
from iceberg_file_writer_spark.ingest.maintenance import list_data_files

# small row bound so file rolling is exercised with few rows
CFG = IngestConfig(max_rows_per_file=16)


def _record(rng_user: int, ts: int, null_source: bool, features: list[str]) -> dict:
    return {
        "accuracy": None,
        "altitude": None,
        "altitudeAccuracy": None,
        "course": None,
        "features": features,
        "latitude": 37.0,
        "longitude": -121.0,
        "speed": None,
        "source": None if null_source else "satellite",
        "timestamp": ts,
        "user_id": f"u{rng_user}",
    }


records = st.lists(
    st.builds(
        _record,
        st.integers(min_value=0, max_value=5),  # 1-6 partition values
        st.integers(min_value=0, max_value=1000),  # duplicate + out-of-order ts
        st.booleans(),
        st.lists(st.sampled_from(["osm-1", "osm-2", ""]), max_size=3),
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=records)
def test_ingest_invariants_hold_for_random_streams(spark, tmp_path_factory, rows):
    base = tmp_path_factory.mktemp("prop")
    inp = str(base / "in")
    out = str(base / "out")
    os.makedirs(inp)
    with open(os.path.join(inp, "data.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ingest_batch(read_source(spark, inp), out, CFG)

    files = list_data_files(out)
    total = 0
    per_user_counts: dict[str, int] = {}
    for fp in files:
        user = os.path.basename(os.path.dirname(fp)).split("=", 1)[1]
        pf = pq.ParquetFile(fp)
        assert pf.metadata.num_rows <= CFG.max_rows_per_file
        ts = pf.read(columns=["timestamp"])["timestamp"].to_pylist()
        assert ts == sorted(ts)
        total += len(ts)
        per_user_counts[user] = per_user_counts.get(user, 0) + len(ts)

    # completeness: every record in exactly one file of its own partition
    assert total == len(rows)
    expect_counts: dict[str, int] = {}
    for r in rows:
        expect_counts[r["user_id"]] = expect_counts.get(r["user_id"], 0) + 1
    assert per_user_counts == expect_counts

    # defaults: null source became "device"
    back = spark.read.parquet(out)
    assert back.where(back.source.isNull()).count() == 0
    n_defaulted = sum(1 for r in rows if r["source"] is None)
    assert back.where(back.source == "device").count() == n_defaulted


# --- apply_deletes property: random streams, random tombstones --------------

delete_cases = st.tuples(
    st.lists(
        st.builds(
            _record,
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=1000),
            st.booleans(),
            st.lists(st.sampled_from(["osm-1", "osm-2", ""]), max_size=2),
        ),
        min_size=1,
        max_size=120,
    ),
    st.sets(st.integers(min_value=0, max_value=6), max_size=4),  # tombstoned users
    st.integers(min_value=0, max_value=1000),  # retention cutoff ts
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=delete_cases)
def test_apply_deletes_invariants_hold_for_random_tables(
    spark, tmp_path_factory, case
):
    """For any table, tombstone set, and retention predicate: survivors =
    rows not matching (key AND predicate); layout invariants hold on the
    rewritten partitions; untouched partitions keep their exact files."""
    from iceberg_file_writer_spark.ingest.maintenance import apply_deletes

    rows, users, cutoff = case
    keys = [f"u{u}" for u in users]
    base = tmp_path_factory.mktemp("prop-del")
    inp, out = str(base / "in"), str(base / "out")
    os.makedirs(inp)
    with open(os.path.join(inp, "data.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ingest_batch(read_source(spark, inp), out, CFG)

    untouched_before = {
        fp: os.stat(fp).st_mtime_ns
        for fp in list_data_files(out)
        if os.path.basename(os.path.dirname(fp)).split("=", 1)[1] not in keys
    }

    stats = apply_deletes(
        spark, out, keys, CFG, predicate=f"timestamp < {cutoff}"
    )

    expect_deleted = sum(
        1 for r in rows if r["user_id"] in keys and r["timestamp"] < cutoff
    )
    assert stats["rows_deleted"] == expect_deleted

    files = list_data_files(out)
    total = 0
    for fp in files:
        pf = pq.ParquetFile(fp)
        assert pf.metadata.num_rows <= CFG.max_rows_per_file
        ts = pf.read(columns=["timestamp"])["timestamp"].to_pylist()
        assert ts == sorted(ts)
        total += len(ts)
    assert total == len(rows) - expect_deleted

    untouched_after = {
        fp: os.stat(fp).st_mtime_ns
        for fp in list_data_files(out)
        if os.path.basename(os.path.dirname(fp)).split("=", 1)[1] not in keys
    }
    assert untouched_after == untouched_before

    back = spark.read.parquet(out)
    for k in keys:
        assert (
            back.where(f"user_id = '{k}' AND timestamp < {cutoff}").count() == 0
        )
