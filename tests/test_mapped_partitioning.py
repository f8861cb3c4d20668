"""Hidden partitioning on COLUMN-MAPPED tables (r12): the spec is
pinned to FIELD IDS at DDL time, so Iceberg's two marquee features —
transform-based layout pruning and rename-safe evolution — compose.
A RENAME of a spec'd column re-labels reads without detaching the
layout; every write verb clusters by the standing spec; the pruned
scan resolves raw predicates per evolution epoch and through the
id-keyed hidden bucket columns.

Reference posture: the spec-partitioned write layout is the
reference's whole output contract (/root/reference/main.go:47-54);
this composes it with the mapped flavor the SQL CREATE produces."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.column_mapping import (
    append_mapped,
    convert_to_mapped,
    create_mapped_table,
    delete_where_mapped,
    evolve_mapped,
    read_mapped,
    respec_mapped,
    scan_mapped_partitioned,
    upsert_mapped,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    current_version,
    read_manifest,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _events(spark, n=4000, days=8):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2024-01-0"),
                    (F.col("id") % days + 1).cast("string"),
                    F.lit(" 10:00:00"),
                )
            ).alias("ts"),
            (F.col("id") * 10).alias("v"),
        )
    )


@pytest.fixture()
def spec_table(spark, tmp_path):
    t = str(tmp_path / "t")
    create_mapped_table(
        spark,
        _events(spark),
        t,
        max_rows=500,
        spec=[("day", "ts"), ("bucket", 8, "id")],
    )
    return t


def test_create_spec_is_id_keyed_and_prunes(spark, spec_table):
    t = spec_table
    m = read_manifest(t, current_version(t))
    # durable manifest form: transforms keyed by FIELD ID
    assert m["spec"] == [["day", 2], ["bucket", 8, 1]]
    out = scan_mapped_partitioned(spark, t, [("id", "=", 7)])
    kept, total = scan_mapped_partitioned.last_files
    assert kept < total, "bucket transform gave no file pruning"
    assert _canon(out) == _canon(read_mapped(spark, t).where("id = 7"))


def test_rename_does_not_detach_the_layout(spark, spec_table):
    """The done-criterion of VERDICT r11 item 2: a rename of BOTH
    spec'd columns must keep transform pruning working (fewer files
    scanned), with results row-identical to the unpruned read."""
    t = spec_table
    base = scan_mapped_partitioned(spark, t, [("id", "=", 7)])
    kept_before, total_before = scan_mapped_partitioned.last_files
    want = _canon(base)
    evolve_mapped(t, renames={"id": "ident", "ts": "event_ts"})
    out = scan_mapped_partitioned(spark, t, [("ident", "=", 7)])
    kept_after, total_after = scan_mapped_partitioned.last_files
    assert (kept_after, total_after) == (kept_before, total_before)
    assert _canon(out) == want
    # time transform prunes through the renamed raw column's stats
    out = scan_mapped_partitioned(
        spark,
        t,
        [
            ("event_ts", ">=", "2024-01-03 00:00:00"),
            ("event_ts", "<", "2024-01-04 00:00:00"),
        ],
    )
    kept, total = scan_mapped_partitioned.last_files
    assert kept < total, "day transform gave no file pruning after rename"
    assert _canon(out) == _canon(
        read_mapped(spark, t).where(
            "event_ts >= '2024-01-03' AND event_ts < '2024-01-04'"
        )
    )


def test_every_write_verb_clusters_by_the_standing_spec(spark, spec_table):
    """The spec belongs to the TABLE: appends, MoR upserts, and CoW
    rewrites all carry hidden bucket columns, so files written by any
    verb keep pruning (no silent layout decay)."""
    t = spec_table
    evolve_mapped(t, renames={"id": "ident"})
    append_mapped(
        spark,
        _events(spark, 1000).selectExpr(
            "id + 100000 AS ident", "ts", "v"
        ),
        t,
        max_rows=500,
    )
    upsert_mapped(
        spark,
        spark.createDataFrame(
            [(7, datetime.datetime(2024, 1, 8, 10), 777)],
            "ident long, ts timestamp, v long",
        ),
        t,
        ["ident"],
    )
    delete_where_mapped(spark, t, "v = 120")
    m = read_manifest(t, current_version(t))
    # every data file written under the spec carries the id-keyed
    # hidden bucket column's stats (carried pre-spec files would not)
    assert all("_b8_f1" in (e.get("stats") or {}) for e in m["files"])
    out = scan_mapped_partitioned(spark, t, [("ident", "=", 7)])
    kept, total = scan_mapped_partitioned.last_files
    assert kept < total
    assert _canon(out) == _canon(read_mapped(spark, t).where("ident = 7"))
    # upsert won: exactly one ident=7 row with the new value
    assert [r for r in out.collect() if r["ident"] == 7][0]["v"] == 777


def test_convert_to_mapped_carries_standing_spec(spark, tmp_path):
    """A plain spec-partitioned table converts WITH its layout: the
    spec re-keys to the fresh field ids, pre-conversion files keep
    pruning through their name-keyed hidden stats, and a post-convert
    rename keeps both epochs pruned."""
    from iceberg_file_writer_spark.ingest.partitioning import (
        commit_append_partitioned,
    )

    t = str(tmp_path / "p")
    commit_append_partitioned(
        spark, _events(spark), t, spec=[["bucket", 8, "id"]], max_rows=500
    )
    convert_to_mapped(spark, t)
    m = read_manifest(t, current_version(t))
    assert m["spec"] == [["bucket", 8, 1]]
    out = scan_mapped_partitioned(spark, t, [("id", "=", 7)])
    kept, total = scan_mapped_partitioned.last_files
    assert kept < total, "pre-conversion name-keyed stats lost pruning"
    want = _canon(out)
    evolve_mapped(t, renames={"id": "ident"})
    out = scan_mapped_partitioned(spark, t, [("ident", "=", 7)])
    assert scan_mapped_partitioned.last_files == (kept, total)
    assert _canon(out) == want
    # new writes cluster id-keyed; both epochs prune in one scan
    append_mapped(
        spark,
        spark.createDataFrame(
            [(7, datetime.datetime(2024, 1, 1, 0), 999)],
            "ident long, ts timestamp, v long",
        ),
        t,
    )
    out = scan_mapped_partitioned(spark, t, [("ident", "=", 7)])
    k2, t2 = scan_mapped_partitioned.last_files
    assert k2 < t2
    assert _canon(out) == _canon(read_mapped(spark, t).where("ident = 7"))


def test_sql_partitioned_by_and_set_partition_spec(spark, tmp_path):
    from iceberg_file_writer_spark.ingest.inspect import inspect_table
    from iceberg_file_writer_spark.sql_dml import execute_dml

    t = str(tmp_path / "s")
    execute_dml(
        spark,
        "CREATE TABLE s PARTITIONED BY (day(ts), bucket(8, id)) AS "
        "SELECT CAST(id AS BIGINT) AS id, "
        "CAST(CONCAT('2024-01-0', CAST(id % 4 + 1 AS STRING), "
        "' 10:00:00') AS TIMESTAMP) AS ts, id * 10 AS v "
        "FROM range(4000)",
        {"s": t},
    )
    m = read_manifest(t, current_version(t))
    assert m["spec"] == [["day", 2], ["bucket", 8, 1]]
    execute_dml(spark, "ALTER TABLE s RENAME COLUMN ts TO event_ts", {"s": t})
    # the partitions metadata view labels cells under CURRENT names
    parts = inspect_table(spark, t, "partitions")
    labels = [r["partition"] for r in parts.collect() if r["partition"]]
    assert labels and all("day(event_ts)=" in p for p in labels)
    # spec evolution is metadata-only and re-keys by id
    execute_dml(
        spark, "ALTER TABLE s SET PARTITION SPEC (bucket(4, id))", {"s": t}
    )
    m = read_manifest(t, current_version(t))
    assert m["spec"] == [["bucket", 4, 1]]
    # files written under the OLD spec survive pruning conservatively
    out = scan_mapped_partitioned(spark, t, [("id", "=", 7)])
    assert _canon(out) == _canon(read_mapped(spark, t).where("id = 7"))


def test_empty_schema_create_with_spec(spark, tmp_path):
    from iceberg_file_writer_spark.sql_dml import execute_dml

    t = str(tmp_path / "e")
    execute_dml(
        spark,
        "CREATE TABLE e (id BIGINT, ts TIMESTAMP, v BIGINT) "
        "PARTITIONED BY (bucket(4, id))",
        {"e": t},
    )
    m = read_manifest(t, current_version(t))
    assert m["spec"] == [["bucket", 4, 1]]
    # the first INSERT clusters under the spec
    execute_dml(
        spark,
        "INSERT INTO e SELECT CAST(id AS BIGINT) AS id, "
        "CAST('2024-01-01' AS TIMESTAMP) AS ts, id * 10 AS v "
        "FROM range(3000)",
        {"e": t},
    )
    m = read_manifest(t, current_version(t))
    assert m["files"] and all(
        "_b4_f1" in (e.get("stats") or {}) for e in m["files"]
    )


def test_bloom_index_on_mapped_table_across_rename(spark, tmp_path):
    """VERDICT r11 item 3: the per-file bloom sidecar keys by FIELD ID
    on mapped tables — point-lookup file-count pinned across a rename."""
    from iceberg_file_writer_spark.ingest.bloom_index import (
        attach_bloom_index,
    )

    t = str(tmp_path / "b")
    # no spec: bucket-less layout is exactly where bloom pruning is the
    # only point-lookup signal
    create_mapped_table(
        spark,
        _events(spark, 4000).selectExpr(
            "CAST(hash(id) AS STRING) AS key", "ts", "v"
        ),
        t,
        max_rows=500,
    )
    probe = read_mapped(spark, t).limit(1).collect()[0]["key"]
    out = scan_mapped_partitioned(spark, t, [("key", "=", probe)])
    unpruned_kept, total = scan_mapped_partitioned.last_files
    attach_bloom_index(spark, t, ["key"])
    out = scan_mapped_partitioned(spark, t, [("key", "=", probe)])
    bloom_kept, _ = scan_mapped_partitioned.last_files
    assert bloom_kept < unpruned_kept, "bloom gave no extra pruning"
    want = _canon(out)
    evolve_mapped(t, renames={"key": "doc_key"})
    out = scan_mapped_partitioned(spark, t, [("doc_key", "=", probe)])
    assert scan_mapped_partitioned.last_files[0] == bloom_kept, (
        "rename detached the field-id-keyed bloom sidecar"
    )
    assert _canon(out) == want


def test_spec_referencing_dropped_column_refused(spark, spec_table):
    """Tightened by the r12 ADVICE fix: the DROP itself now refuses at
    evolve time (the old contract let the drop through and only the
    next write failed at resolve_spec_ids — a bricked table)."""
    t = spec_table
    with pytest.raises(ValueError, match="partition spec source"):
        evolve_mapped(t, drops=["id"])
    # table is NOT bricked: writes still work after the refusal
    append_mapped(
        spark,
        spark.createDataFrame(
            [(99991, datetime.datetime(2024, 1, 1), 1)],
            "id long, ts timestamp, v long",
        ),
        t,
    )


def test_respec_drop_then_write_plain(spark, spec_table):
    t = spec_table
    respec_mapped(t, [])
    m = read_manifest(t, current_version(t))
    assert m["spec"] == []
    append_mapped(
        spark,
        spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), 1)],
            "id long, ts timestamp, v long",
        ),
        t,
    )
    # results stay correct with a mixed spec'd/plain file population
    out = scan_mapped_partitioned(spark, t, [("id", "=", 1)])
    assert _canon(out) == _canon(read_mapped(spark, t).where("id = 1"))


def test_residual_pushes_into_every_epoch_scan(spark, spec_table):
    """Plan gate: the pruned scan's residual predicate reaches the
    parquet readers as PushedFilters under each epoch's PHYSICAL
    column name (Catalyst rewrites through the field-id aliasing), so
    row-group/page pruning works inside the kept files too."""
    import re

    t = spec_table
    evolve_mapped(t, renames={"id": "ident"})
    append_mapped(
        spark,
        spark.createDataFrame(
            [(99999, datetime.datetime(2024, 1, 1), 1)],
            "ident long, ts timestamp, v long",
        ),
        t,
    )
    out = scan_mapped_partitioned(spark, t, [("ident", "=", 7)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = set(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert pushed, "no parquet scan in the plan?"
    assert all("EqualTo(id" in p or "EqualTo(ident" in p for p in pushed), (
        f"residual not pushed under the physical name: {pushed}"
    )


def test_describe_shows_partition_spec_under_current_names(spark, spec_table):
    from iceberg_file_writer_spark.sql_dml import execute_query

    t = spec_table
    evolve_mapped(t, renames={"ts": "event_ts"})
    rows = {
        r["col_name"]: r["data_type"]
        for r in execute_query(spark, "DESCRIBE t", {"t": t}).collect()
    }
    assert rows["# partition spec"] == "day(event_ts), bucket(8, id)"
    # spec-less tables keep the unchanged DESCRIBE shape
    t2 = str(spec_table) + "2"
    create_mapped_table(spark, _events(spark, 10), t2)
    rows2 = [
        r["col_name"]
        for r in execute_query(spark, "DESCRIBE t", {"t": t2}).collect()
    ]
    assert "# partition spec" not in rows2


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# random lifecycle ops over a spec'd mapped table; every op keeps the
# two-column contract (key k, value v, timestamp ts) so conjuncts stay
# well-formed after renames
_ops = st.lists(
    st.sampled_from(
        ["append", "upsert", "delete_cow", "delete_mor", "rename",
         "respec", "widen"]
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops, seed=st.integers(0, 2**16))
def test_property_pruned_scan_equals_unpruned_after_any_lifecycle(
    spark, tmp_path_factory, ops, seed
):
    """Property: for ANY interleaving of appends, MoR upserts, CoW/MoR
    deletes, renames, and spec evolutions over a spec'd mapped table,
    the pruned scan is row-identical to the unpruned filtered read for
    point, IN, and range conjuncts — a wrong prune is silent data loss,
    so this is the load-bearing guarantee of the r12 feature."""
    import random

    rng = random.Random(seed)
    t = str(tmp_path_factory.mktemp("prop") / "t")
    kname = "k"
    create_mapped_table(
        spark,
        spark.createDataFrame(
            [
                (rng.randint(0, 50), rng.randint(0, 999),
                 datetime.datetime(2024, 1, rng.randint(1, 9)))
                for _ in range(rng.randint(5, 60))
            ],
            "k long, v int, ts timestamp",
        ),
        t,
        max_rows=10,
        spec=[("bucket", 4, "k"), ("day", "ts")],
    )
    for op in ops:
        rows = [
            (rng.randint(0, 50), rng.randint(0, 999),
             datetime.datetime(2024, 1, rng.randint(1, 9)))
            for _ in range(rng.randint(1, 8))
        ]
        if op == "append":
            append_mapped(
                spark,
                spark.createDataFrame(rows, f"{kname} long, v int, ts timestamp"),
                t,
                max_rows=10,
            )
        elif op == "upsert":
            uniq = list({r[0]: r for r in rows}.values())
            upsert_mapped(
                spark,
                spark.createDataFrame(uniq, f"{kname} long, v int, ts timestamp"),
                t,
                [kname],
            )
        elif op == "widen":
            from iceberg_file_writer_spark.ingest.column_mapping import (
                alter_column_type_mapped,
            )

            alter_column_type_mapped(t, "v", "bigint")
        elif op == "delete_cow":
            delete_where_mapped(spark, t, f"v % 5 = {rows[0][1] % 5}")
        elif op == "delete_mor":
            from iceberg_file_writer_spark.ingest.column_mapping import (
                delete_where_mor_mapped,
            )

            delete_where_mor_mapped(spark, t, f"{kname} = {rows[0][0]}")
        elif op == "rename":
            new = f"k{rng.randint(0, 9)}"
            if new != kname:
                evolve_mapped(t, renames={kname: new})
                kname = new
        else:  # respec
            respec_mapped(
                t,
                rng.choice(
                    [[("bucket", 8, kname)], [("day", "ts")], []]
                ),
            )
    probe = rng.randint(0, 50)
    cases = [
        ([(kname, "=", probe)], f"{kname} = {probe}"),
        ([(kname, "in", [probe, probe + 1])], f"{kname} IN ({probe}, {probe + 1})"),
        (
            [("v", ">=", 200), ("v", "<", 700)],
            "v >= 200 AND v < 700",
        ),
        (
            [("ts", ">=", "2024-01-03 00:00:00"), ("ts", "<", "2024-01-06 00:00:00")],
            "ts >= '2024-01-03' AND ts < '2024-01-06'",
        ),
    ]
    base = read_mapped(spark, t)
    for conjuncts, sql in cases:
        got = _canon(scan_mapped_partitioned(spark, t, conjuncts))
        want = _canon(base.where(sql))
        assert got == want, (conjuncts, got, want)


def test_cdf_stream_over_spec_mapped_table(spark, tmp_path):
    """Composition pin (r12): the streaming CHANGE DATA FEED over a
    table that is BOTH column-mapped and hidden-partitioned — with a
    rename and MoR state mid-history — emits the logical schema only
    (current names, no hidden bucket columns) and net-folds to the
    batch feed per version."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_snapshot_source import _drain_cdf, _net

    from iceberg_file_writer_spark.ingest.column_mapping import (
        delete_where_mor_mapped,
        upsert_mapped,
    )
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    t = str(tmp_path / "m")
    df = spark.createDataFrame([(i, i * 10) for i in range(200)], "k long, v long")
    create_mapped_table(spark, df, t, max_rows=50, spec=[("bucket", 4, "k")])
    evolve_mapped(t, renames={"k": "key"})
    upsert_mapped(
        spark, spark.createDataFrame([(7, 777)], "key long, v long"), t, ["key"]
    )
    delete_where_mor_mapped(spark, t, "key = 3")
    end = current_version(t)
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    _drain_cdf(spark, t, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.columns == ["change", "_commit_version", "key", "v"]
    for v in range(2, end + 1):
        got = _net(out.where(F.col("_commit_version") == v), ["key", "v"])
        want = sorted(
            (tuple(r) for r in changes_between(spark, t, v - 1, v).collect()),
            key=repr,
        )
        assert got == want, f"version {v}"


_mapped_cdf_ops = st.lists(
    st.sampled_from(
        ["append", "upsert", "delete_cow", "delete_mor", "rename",
         "respec", "widen"]
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_mapped_cdf_ops, seed=st.integers(0, 2**16))
def test_property_mapped_cdf_nets_to_batch_feed(
    spark, tmp_path_factory, ops, seed
):
    """Property: over a column-mapped, hidden-partitioned table, ANY
    interleaving of appends, MoR upserts, CoW/MoR deletes, renames, and
    spec evolutions nets the CDF stream to the batch feed per version.
    The stream emits under the START-TIME schema by field id while the
    batch feed uses current names — comparison is positional (same
    field ids in the same order on both sides)."""
    import random
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_snapshot_source import _drain_cdf

    from iceberg_file_writer_spark.ingest.column_mapping import (
        delete_where_mor_mapped,
    )
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    rng = random.Random(seed)
    base = tmp_path_factory.mktemp("mcdf")
    t = str(base / "t")
    kname = "k"
    create_mapped_table(
        spark,
        spark.createDataFrame(
            [(rng.randint(0, 20), rng.randint(0, 99)) for _ in range(20)],
            "k long, v int",
        ),
        t,
        max_rows=5,
        spec=[("bucket", 4, "k")],
    )
    for op in ops:
        rows = [
            (rng.randint(0, 20), rng.randint(0, 99))
            for _ in range(rng.randint(1, 5))
        ]
        if op == "append":
            append_mapped(
                spark,
                spark.createDataFrame(rows, f"{kname} long, v int"),
                t,
                max_rows=5,
            )
        elif op == "upsert":
            uniq = list({r[0]: r for r in rows}.values())
            upsert_mapped(
                spark,
                spark.createDataFrame(uniq, f"{kname} long, v int"),
                t,
                [kname],
            )
        elif op == "widen":
            from iceberg_file_writer_spark.ingest.column_mapping import (
                alter_column_type_mapped,
            )

            alter_column_type_mapped(t, "v", "bigint")
        elif op == "delete_cow":
            delete_where_mapped(spark, t, f"v % 5 = {rows[0][1] % 5}")
        elif op == "delete_mor":
            delete_where_mor_mapped(spark, t, f"{kname} = {rows[0][0]}")
        elif op == "rename":
            new = f"k{rng.randint(0, 9)}"
            if new != kname:
                evolve_mapped(t, renames={kname: new})
                kname = new
        else:
            respec_mapped(
                t, rng.choice([[("bucket", 8, kname)], []])
            )
    end = current_version(t)
    sink, ckpt = str(base / "s"), str(base / "c")
    _drain_cdf(spark, t, sink, ckpt)
    out = spark.read.parquet(sink)
    scols = [c for c in out.columns if c not in ("change", "_commit_version")]

    def _net_pos(df, cols):
        from collections import Counter

        n = Counter()
        for r in df.select("change", *cols).collect():
            n[tuple(r)[1:]] += 1 if r[0] == "+" else -1
        return [
            ("+" if c > 0 else "-", *vals)
            for vals, c in n.items()
            if c
            for _ in range(abs(c))
        ]

    for v in range(2, end + 1):
        feed = changes_between(spark, t, v - 1, v)
        fcols = [c for c in feed.columns if c != "change"]
        got = sorted(
            _net_pos(out.where(F.col("_commit_version") == v), scols),
            key=repr,
        )
        want = sorted(
            _net_pos(feed, fcols),
            key=repr,
        )
        assert got == want, f"v{v}: {got} != {want}"


def test_drop_of_spec_source_column_is_refused(spark, spec_table):
    """Regression (r12 ADVICE, medium): dropping a column the standing
    id-keyed spec sources from used to succeed at evolve time and then
    brick EVERY write verb at resolve_spec_ids — refuse at evolve time
    instead (Iceberg likewise blocks dropping partition source columns),
    and keep the refusal rename-proof (field-id keyed)."""
    t = spec_table
    with pytest.raises(ValueError, match="partition spec source"):
        evolve_mapped(t, drops=["ts"])
    with pytest.raises(ValueError, match="partition spec source"):
        evolve_mapped(t, drops=["id"])
    # rename-proof: the guard keys on field id, not name
    evolve_mapped(t, renames={"ts": "event_ts"})
    with pytest.raises(ValueError, match="partition spec source"):
        evolve_mapped(t, drops=["event_ts"])
    # a non-spec column still drops fine, and writes keep working
    evolve_mapped(t, drops=["v"])
    append_mapped(spark, _events(spark, n=50).withColumnRenamed(
        "ts", "event_ts").drop("v"), t)
    assert read_mapped(spark, t).count() == 4050
    # after SET PARTITION SPEC without the column, the drop is legal
    respec_mapped(t, [("bucket", 8, "id")])
    evolve_mapped(t, drops=["event_ts"])
    assert set(read_mapped(spark, t).columns) == {"id"}


def test_reserved_hidden_names_are_rejected_loudly(spark, tmp_path):
    """Regression (r12 ADVICE, low): a user column named like a hidden
    layout column (_b<n>_<suffix>) used to be written and then silently
    dropped by _read_files from every read surface — now every mapped
    commit and the plain append/overwrite verbs refuse it at write
    time."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        commit_append,
        commit_overwrite,
    )

    bad = spark.range(5).select(F.col("id"), F.lit(1).alias("_b2_x"))
    with pytest.raises(ValueError, match="reserved hidden"):
        create_mapped_table(spark, bad, str(tmp_path / "m"))
    with pytest.raises(ValueError, match="reserved hidden"):
        commit_append(spark, bad, str(tmp_path / "p"))
    with pytest.raises(ValueError, match="reserved hidden"):
        commit_overwrite(spark, bad, str(tmp_path / "p2"))
    # rename TO a reserved name is refused too (same commit-time gate)
    t = str(tmp_path / "ok")
    create_mapped_table(spark, spark.range(5), t)
    with pytest.raises(ValueError, match="reserved hidden"):
        evolve_mapped(t, renames={"id": "_b16_id"})
    with pytest.raises(ValueError, match="reserved hidden"):
        evolve_mapped(t, adds=[("_b4_z", "bigint")])
