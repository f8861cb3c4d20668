"""Field-id column mapping: renames/drops/adds are metadata-only, reads
resolve by id (old files readable under new names, dropped-then-re-added
names never resurrect old data), time travel is schema-as-of."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.column_mapping import (
    append_mapped,
    create_mapped_table,
    evolve_mapped,
    read_mapped,
    table_columns,
)
from iceberg_file_writer_spark.ingest.snapshots import current_version
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _data_mtimes(t):
    d = os.path.join(t, "data")
    return {n: os.path.getmtime(os.path.join(d, n)) for n in os.listdir(d)}


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_mapped_table(spark, orders.limit(50), t, max_rows=20)
    return t, orders.limit(50)


def test_rename_is_metadata_only_and_readable(spark, table):
    t, orders = table
    before = _data_mtimes(t)
    v = evolve_mapped(t, renames={"o_totalprice": "price"})
    assert _data_mtimes(t) == before  # zero data bytes moved
    got = read_mapped(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "price"]
    want = _canon(orders.withColumnRenamed("o_totalprice", "price"))
    assert _canon(got) == want
    # appends after the rename write under the NEW name; both epochs read
    extra = orders.limit(5).select(
        (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
        "o_custkey",
        F.col("o_totalprice").alias("price"),
    )
    append_mapped(spark, extra, t, max_rows=20)
    assert read_mapped(spark, t).count() == 55
    # time travel below the rename: as-of schema has the OLD name
    assert read_mapped(spark, t, 1).columns == [
        "o_orderkey", "o_custkey", "o_totalprice"
    ]


def test_drop_then_readd_never_resurrects(spark, table):
    t, orders = table
    evolve_mapped(t, drops=["o_totalprice"])
    assert read_mapped(spark, t).columns == ["o_orderkey", "o_custkey"]
    # re-add the SAME name: fresh id, old bytes must NOT come back
    evolve_mapped(t, adds=[("o_totalprice", "double")])
    got = read_mapped(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "o_totalprice"]
    assert got.where(F.col("o_totalprice").isNotNull()).count() == 0
    # new appends fill the new column; old files stay null for it
    extra = orders.limit(5).select(
        (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit(9.5).alias("o_totalprice"),
    )
    append_mapped(spark, extra, t, max_rows=20)
    got = read_mapped(spark, t)
    assert got.where("o_totalprice IS NOT NULL").count() == 5
    assert got.count() == 55
    # while time travel BEFORE the drop still reads the original values
    v1 = read_mapped(spark, t, 1)
    assert _canon(v1) == _canon(orders)


def test_add_column_null_fills_history(spark, table):
    t, orders = table
    evolve_mapped(t, adds=[("note", "string")])
    got = read_mapped(spark, t)
    assert got.columns == ["o_orderkey", "o_custkey", "o_totalprice", "note"]
    assert got.where("note IS NOT NULL").count() == 0


def test_append_schema_mismatch_rejected(spark, table):
    t, orders = table
    with pytest.raises(ValueError, match="schema mismatch"):
        append_mapped(spark, orders.select("o_orderkey", "o_custkey"), t)


def test_evolution_guards(spark, table):
    t, _ = table
    with pytest.raises(ValueError, match="no such column"):
        evolve_mapped(t, drops=["nope"])
    with pytest.raises(ValueError, match="column exists"):
        evolve_mapped(t, adds=[("o_custkey", "bigint")])
    with pytest.raises(ValueError, match="rename collision"):
        evolve_mapped(t, renames={"o_orderkey": "o_custkey"})


def test_ids_are_never_recycled(spark, table):
    t, _ = table
    evolve_mapped(t, drops=["o_totalprice"])          # id 3 retired
    evolve_mapped(t, adds=[("a", "bigint")])          # must take id 4
    cols = {name: cid for cid, name, _t in table_columns(t)}
    assert cols["a"] == 4
    evolve_mapped(t, drops=["a"])
    evolve_mapped(t, adds=[("b", "bigint")])          # id 5, not 3 or 4
    cols = {name: cid for cid, name, _t in table_columns(t)}
    assert cols["b"] == 5


def test_pushdown_and_pruning_survive_evolution(spark, table):
    """The scale property: a filter on the RENAMED column must reach the
    parquet scan of BOTH epochs — translated to each epoch's physical
    name — and column pruning must hold (ReadSchema excludes unselected
    columns). Two epochs => exactly two scans, not one per file."""
    t, orders = table
    evolve_mapped(t, renames={"o_totalprice": "price"})
    extra = orders.limit(5).select(
        (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
        "o_custkey",
        F.col("o_totalprice").alias("price"),
    )
    append_mapped(spark, extra, t, max_rows=20)
    df = read_mapped(spark, t).where(F.col("price") > 100.0).select(
        "o_orderkey", "price"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 2  # one per evolution epoch
    old_epoch = [ln for ln in scans if "o_totalprice" in ln]
    new_epoch = [ln for ln in scans if "price#" in ln and "o_totalprice" not in ln]
    assert len(old_epoch) == 1 and len(new_epoch) == 1
    assert "(o_totalprice" in old_epoch[0]  # filter under the OLD name
    assert "(price" in new_epoch[0]  # filter under the NEW name
    for ln in scans:
        assert "o_custkey" not in ln  # pruned everywhere


def test_streaming_append_sink_mapped_exactly_once_with_midstream_rename(
    spark, tmp_path
):
    """The mapped streaming sink: replayed batch ids are no-ops, files
    stamp the mapping CURRENT at their batch's commit, and a rename
    between micro-batches leaves earlier files resolving by id."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        create_mapped_table,
        evolve_mapped,
        read_mapped,
        streaming_append_sink_mapped,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )
    from iceberg_file_writer_spark.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id", F.col("value").alias("v")
    )
    t = str(tmp_path / "ev")
    create_mapped_table(spark, ev.where("event_id < 100"), t)
    sink = streaming_append_sink_mapped(t)

    sink(ev.where("event_id >= 100 AND event_id < 200"), batch_id=0)
    n1 = read_mapped(spark, t).count()
    # crash replay: same batch id is a no-op
    sink(ev.where("event_id >= 100 AND event_id < 200"), batch_id=0)
    assert read_mapped(spark, t).count() == n1
    assert current_version(t) == 2

    # mid-stream rename; the NEXT batch must speak the new schema
    evolve_mapped(t, renames={"v": "val"})
    with pytest.raises(ValueError, match="schema mismatch"):
        sink(
            ev.where("event_id >= 200 AND event_id < 300"), batch_id=1
        )
    sink(
        ev.selectExpr("event_id", "v AS val").where(
            "event_id >= 200 AND event_id < 300"
        ),
        batch_id=1,
    )
    got = read_mapped(spark, t)
    assert got.columns == ["event_id", "val"]
    # all three epochs' values resolve (none null-filled away)
    assert got.where("val IS NOT NULL").count() == got.count()
    assert got.count() == ev.where("event_id < 300").count()
    # entries carry the mapping current at their commit
    m = read_manifest(t, current_version(t))
    names = {tuple(dict(e["cols"]).values()) for e in m["files"]}
    assert ("event_id", "v") in names and ("event_id", "val") in names


def test_vacuum_respects_mapped_tombstones_then_sweeps_after_compact(
    spark, tmp_path
):
    """The janitor must never collect a delete file a mapped manifest
    still references; after compaction retires the tombstones and the
    old versions expire, the sidecar dirs sweep."""
    import os

    from iceberg_file_writer_spark.ingest.column_mapping import (
        create_mapped_table,
        compact_mapped,
        delete_where_mor_mapped,
        read_mapped,
        upsert_mapped,
    )
    from iceberg_file_writer_spark.ingest.maintenance import vacuum
    from iceberg_file_writer_spark.tables import load_tables

    cust = load_tables(spark, "/root/testdata/sf0.001")["customer"].select(
        "c_custkey", "c_acctbal"
    )
    t = str(tmp_path / "cust")
    create_mapped_table(spark, cust, t)
    upsert_mapped(
        spark,
        cust.where("c_custkey < 10").withColumn("c_acctbal", F.lit(-1.0)),
        t,
        ["c_custkey"],
    )
    delete_where_mor_mapped(spark, t, "c_custkey % 5 = 4")
    want = sorted(tuple(r) for r in read_mapped(spark, t).collect())

    vacuum(t, keep_last=1, grace_seconds=0)
    # both sidecar classes survive the vacuum (still referenced)
    assert os.listdir(os.path.join(t, "eq")) and os.listdir(
        os.path.join(t, "dv")
    )
    assert sorted(tuple(r) for r in read_mapped(spark, t).collect()) == want

    compact_mapped(spark, t)
    vacuum(t, keep_last=1, grace_seconds=0)
    for d in ("eq", "dv"):
        p = os.path.join(t, d)
        assert not os.path.isdir(p) or not os.listdir(p)
    assert sorted(tuple(r) for r in read_mapped(spark, t).collect()) == want


def test_mapped_commit_conflicts_instead_of_lost_update(spark, tmp_path):
    """A mapped commit built against a stale parent must raise
    CommitConflict (the O_EXCL slot is taken), never silently rebase
    onto — and erase — the commit it never saw (review finding: the
    streaming sink's exactly-once check reads ITS parent, so a silent
    rebase would drop a concurrent upsert's tombstones)."""
    import pytest

    from iceberg_file_writer_spark.ingest.column_mapping import (
        _commit_with_columns,
        create_mapped_table,
        read_mapped,
        table_columns,
        upsert_mapped,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        CommitConflict,
        current_version,
        read_manifest,
    )
    from iceberg_file_writer_spark.tables import load_tables

    cust = load_tables(spark, "/root/testdata/sf0.001")["customer"].select(
        "c_custkey", "c_acctbal"
    )
    t = str(tmp_path / "cust")
    create_mapped_table(spark, cust, t)
    stale_parent = current_version(t)  # what a slow writer observed
    # a concurrent upsert lands first
    upsert_mapped(
        spark,
        spark.sql("SELECT CAST(1 AS BIGINT) AS c_custkey, "
                  "CAST(-1.0 AS DOUBLE) AS c_acctbal"),
        t,
        ["c_custkey"],
    )
    before = sorted(tuple(r) for r in read_mapped(spark, t).collect())
    eqs_before = read_manifest(t, current_version(t))["eqs"]
    assert eqs_before
    # the slow writer now commits against its STALE parent
    m_stale = read_manifest(t, stale_parent)
    with pytest.raises(CommitConflict):
        _commit_with_columns(
            t,
            "append",
            m_stale["files"],
            m_stale["columns"],
            parent=stale_parent,
        )
    # nothing was lost: the upsert's state and tombstones are intact
    assert sorted(tuple(r) for r in read_mapped(spark, t).collect()) == before
    assert read_manifest(t, current_version(t))["eqs"] == eqs_before


# --- row-level change feed (CDC) on mapped tables ----------------------------


def _feed(spark, t, a, b):
    from iceberg_file_writer_spark.ingest.snapshots import changes_between

    return changes_between(spark, t, a, b)


def _feed_canon(spark, t, a, b):
    return sorted(tuple(r) for r in _feed(spark, t, a, b).collect())


def test_mapped_feed_appends_and_rename_silence(spark, tmp_path):
    """Appends emit '+' rows; a metadata-only RENAME between the
    versions emits an EMPTY feed, and spans crossing the rename emit
    under the CURRENT names with pre-rename epochs resolved by id."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        delete_where_mapped,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, tag string, v long"
    )
    v1 = create_mapped_table(spark, df, t, max_rows=10)
    v2 = append_mapped(
        spark,
        spark.createDataFrame([(3, "c", 30)], "id long, tag string, v long"),
        t,
        max_rows=10,
    )
    assert _feed_canon(spark, t, v1, v2) == [("+", 3, "c", 30)]

    v3 = evolve_mapped(t, renames={"v": "val"})
    # rename alone: EMPTY feed (no spurious NULL-filled pairs)
    assert _feed(spark, t, v2, v3).count() == 0
    # span crossing the rename: emitted under the NEW name
    f = _feed(spark, t, v1, v3)
    assert f.columns == ["change", "id", "tag", "val"]
    assert sorted(tuple(r) for r in f.collect()) == [("+", 3, "c", 30)]

    # CoW delete of a pre-rename row: '-' under current names
    v4 = delete_where_mapped(spark, t, "id = 1")
    got = _feed_canon(spark, t, v3, v4)
    assert got == [("-", 1, "a", 10)]


def test_mapped_feed_upsert_and_mor_delete(spark, tmp_path):
    """An upsert's key tombstone emits the old row as '-' and the new
    as '+' (identical values net to zero); a MoR positional delete
    emits '-' without any file changing."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        delete_where_mor_mapped,
        upsert_mapped,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, v long"
    )
    v1 = create_mapped_table(spark, df, t, max_rows=10)
    # upsert: replace id=2, insert id=4, and re-assert id=3 unchanged
    v2 = upsert_mapped(
        spark,
        spark.createDataFrame([(2, 99), (4, 40), (3, 30)], "id long, v long"),
        t,
        ["id"],
        max_rows=10,
    )
    got = _feed_canon(spark, t, v1, v2)
    assert got == [("+", 2, 99), ("+", 4, 40), ("-", 2, 20)]  # id=3 nets out

    # MoR positional delete: zero files rewritten, feed still sees it
    v3 = delete_where_mor_mapped(spark, t, "id = 1")
    assert _feed_canon(spark, t, v2, v3) == [("-", 1, 10)]

    # whole span folds consistently
    whole = _feed_canon(spark, t, v1, v3)
    assert whole == [("+", 2, 99), ("+", 4, 40), ("-", 1, 10), ("-", 2, 20)]


def test_mapped_feed_compaction_nets_to_zero(spark, tmp_path):
    """OPTIMIZE rewrites bytes without changing values: the multiset
    diff nets every row out — an empty feed, like the plain path."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        compact_mapped,
        upsert_mapped,
    )

    t = str(tmp_path / "t")
    v0 = create_mapped_table(
        spark,
        spark.createDataFrame([(i, i * 10) for i in range(8)], "id long, v long"),
        t,
        max_rows=2,
    )
    upsert_mapped(
        spark,
        spark.createDataFrame([(1, 111)], "id long, v long"),
        t,
        ["id"],
        max_rows=10,
    )
    va = current_version(t)
    vb = compact_mapped(spark, t, target_rows=100)
    assert _feed(spark, t, va, vb).count() == 0
    # and the span across upsert+compact shows just the upsert's net
    assert _feed_canon(spark, t, v0, vb) == [("+", 1, 111), ("-", 1, 10)]


def test_mapped_feed_drop_and_add_columns(spark, tmp_path):
    """Feed emits under the TO-version schema: a dropped column is
    absent, an added column null-fills pre-addition rows."""
    t = str(tmp_path / "t")
    v1 = create_mapped_table(
        spark,
        spark.createDataFrame([(1, "x", 5)], "id long, tag string, v long"),
        t,
        max_rows=10,
    )
    evolve_mapped(t, drops=["tag"], adds=[("score", "double")])
    v2 = append_mapped(
        spark,
        spark.createDataFrame([(2, 7, 1.5)], "id long, v long, score double"),
        t,
        max_rows=10,
    )
    f = _feed(spark, t, v1, v2)
    assert f.columns == ["change", "id", "v", "score"]
    assert sorted(tuple(r) for r in f.collect()) == [("+", 2, 7, 1.5)]


def test_feed_across_convert_refused_with_clear_error(spark, tmp_path):
    from iceberg_file_writer_spark.ingest.column_mapping import (
        convert_to_mapped,
    )
    from iceberg_file_writer_spark.ingest.snapshots import commit_append

    t = str(tmp_path / "t")
    commit_append(
        spark,
        spark.createDataFrame([(1, 2)], "a long, b long"),
        t,
        max_rows=10,
    )
    v1 = current_version(t)
    v2 = convert_to_mapped(spark, t)
    with pytest.raises(ValueError, match="CONVERT"):
        _feed(spark, t, v1, v2).count()
    # from the conversion onward the feed works
    v3 = append_mapped(
        spark, spark.createDataFrame([(3, 4)], "a long, b long"), t, max_rows=10
    )
    assert _feed_canon(spark, t, v2, v3) == [("+", 3, 4)]


# --- initial DEFAULT values (Iceberg v3 shape) --------------------------------


def test_add_column_with_default_fills_history(spark, tmp_path):
    """DEFAULT on ADD COLUMN: rows written BEFORE the column existed
    read the default (not NULL) through EVERY read path — read_mapped,
    the format batch read, the incremental stream, and the CDF — while
    rows written after carry their own values; rename keeps the default
    (id-keyed), drop retires it, and time travel shows each version
    under its own defaults."""
    from iceberg_file_writer_spark.sql_dml import execute_dml, execute_query
    from iceberg_file_writer_spark.sources.snapshot_stream import (
        register_snapshot_source,
    )

    t = str(tmp_path / "m")
    execute_dml(
        spark,
        "CREATE TABLE m AS SELECT 1 AS id, 10 AS v "
        "UNION ALL SELECT 2, 20",
        {"m": t},
    )
    execute_dml(
        spark, "ALTER TABLE m ADD COLUMN tier STRING DEFAULT 'bronze'", {"m": t}
    )
    execute_dml(
        spark, "ALTER TABLE m ADD COLUMN score BIGINT DEFAULT 7", {"m": t}
    )
    execute_dml(
        spark,
        "INSERT INTO m SELECT 3 AS id, 30 AS v, 'gold' AS tier, "
        "99 AS score",
        {"m": t},
    )
    got = _canon(
        execute_query(spark, "SELECT id, tier, score FROM m", {"m": t})
    )
    assert got == [(1, "bronze", 7), (2, "bronze", 7), (3, "gold", 99)]

    # time travel: version 1 predates the columns entirely
    v1 = execute_query(
        spark, "SELECT * FROM m VERSION AS OF 1", {"m": t}
    )
    assert v1.columns == ["id", "v"]

    # rename keeps the default (keyed by field id, not name)
    execute_dml(spark, "ALTER TABLE m RENAME COLUMN tier TO rank", {"m": t})
    got = _canon(execute_query(spark, "SELECT id, rank FROM m", {"m": t}))
    assert got == [(1, "bronze"), (2, "bronze"), (3, "gold")]

    # the format surfaces agree
    register_snapshot_source(spark)
    fmt = spark.read.format("snapshot_table").option("path", t).load()
    assert _canon(fmt.select("id", "rank", "score")) == [
        (1, "bronze", 7),
        (2, "bronze", 7),
        (3, "gold", 99),
    ]
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _canon(
        spark.read.parquet(sink).select("id", "rank", "score")
    ) == [(1, "bronze", 7), (2, "bronze", 7), (3, "gold", 99)]
    # CDF: the '+' rows of the pre-default files carry the default too
    sink2, ckpt2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", sink2)
        .option("checkpointLocation", ckpt2)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    cdf = spark.read.parquet(sink2)
    assert _canon(cdf.select("change", "id", "rank")) == [
        ("+", 1, "bronze"),
        ("+", 2, "bronze"),
        ("+", 3, "gold"),
    ]

    # drop retires the default; re-adding the NAME gets a fresh id with
    # no default (and never resurrects)
    execute_dml(spark, "ALTER TABLE m DROP COLUMN rank", {"m": t})
    execute_dml(spark, "ALTER TABLE m ADD COLUMN rank STRING", {"m": t})
    got = _canon(execute_query(spark, "SELECT id, rank FROM m", {"m": t}))
    assert got == [(1, None), (2, None), (3, None)]


def test_format_write_onto_mapped_table_keeps_defaults(spark, tmp_path):
    """Regression (r12 ADVICE, high): a ``format("snapshot_table")``
    append onto a mapped table with ADD COLUMN ... DEFAULT metadata must
    carry ``column_defaults`` into the manifest it publishes — dropping
    it silently null-fills pre-default-epoch history on every later
    read. Covers the batch writer, the streaming writer, AND the generic
    ``_commit`` parent-carry (a plain maintenance commit between mapped
    appends)."""
    from iceberg_file_writer_spark.sql_dml import execute_dml, execute_query
    from iceberg_file_writer_spark.sources.snapshot_stream import (
        register_snapshot_source,
    )
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )

    t = str(tmp_path / "m")
    execute_dml(
        spark,
        "CREATE TABLE m AS SELECT 1 AS id, 10 AS v UNION ALL SELECT 2, 20",
        {"m": t},
    )
    execute_dml(
        spark, "ALTER TABLE m ADD COLUMN tier STRING DEFAULT 'bronze'", {"m": t}
    )

    register_snapshot_source(spark)
    # batch format append (writer provides all columns incl. tier)
    spark.createDataFrame([(3, 30, "gold")], "id int, v int, tier string") \
        .write.format("snapshot_table").option("path", t).mode("append").save()
    m = read_manifest(t, current_version(t))
    assert m.get("column_defaults"), "batch format append dropped defaults"
    got = _canon(execute_query(spark, "SELECT id, tier FROM m", {"m": t}))
    assert got == [(1, "bronze"), (2, "bronze"), (3, "gold")]

    # streaming format append
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "c")
    spark.createDataFrame(
        [(4, 40, "silver")], "id int, v int, tier string"
    ).write.parquet(src)
    q = (
        spark.readStream.schema("id int, v int, tier string")
        .parquet(src)
        .writeStream.format("snapshot_table")
        .option("path", t)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    m = read_manifest(t, current_version(t))
    assert m.get("column_defaults"), "streaming format append dropped defaults"
    got = _canon(execute_query(spark, "SELECT id, tier FROM m", {"m": t}))
    assert got == [
        (1, "bronze"),
        (2, "bronze"),
        (3, "gold"),
        (4, "silver"),
    ]


class TestAlterColumnType:
    """ALTER COLUMN ... TYPE <wider> (r13, VERDICT r12 missing #3):
    field-id-keyed type epochs along Iceberg's promotion lattice —
    metadata-only, read-side cast in the epoch projection."""

    def _mk(self, spark, tmp_path, typ="int"):
        from iceberg_file_writer_spark.ingest.column_mapping import (
            alter_column_type_mapped,
        )

        t = str(tmp_path / "t")
        df = spark.range(10).select(
            F.col("id").cast("bigint"),
            (F.col("id") * 7).cast(typ).alias("v"),
        )
        create_mapped_table(spark, df, t)
        return t, alter_column_type_mapped

    def test_widen_is_metadata_only_and_reads_uniformly(
        self, spark, tmp_path
    ):
        t, alter = self._mk(spark, tmp_path)
        before = _data_mtimes(t)
        alter(t, "v", "bigint")
        assert _data_mtimes(t) == before, "widen moved data bytes"
        got = read_mapped(spark, t)
        assert dict(got.dtypes)["v"] == "bigint"
        # post-widen appends carry the wide type; both epochs read as one
        append_mapped(
            spark,
            spark.range(10, 15).select(
                F.col("id").cast("bigint"),
                (F.col("id") * 7 + 3_000_000_000).cast("bigint").alias("v"),
            ),
            t,
        )
        got = read_mapped(spark, t)
        assert dict(got.dtypes)["v"] == "bigint"
        assert _canon(got) == [
            (i, i * 7 if i < 10 else i * 7 + 3_000_000_000)
            for i in range(15)
        ]
        # DESCRIBE shows the widened type on the same field id
        assert [tuple(c) for c in table_columns(t)] == [
            (1, "id", "bigint"), (2, "v", "bigint"),
        ]
        # time travel: the pre-widen epoch still describes narrow
        assert [tuple(c) for c in table_columns(t, 1)] == [
            (1, "id", "bigint"), (2, "v", "int"),
        ]

    def test_narrowing_and_cross_family_refused(self, spark, tmp_path):
        t, alter = self._mk(spark, tmp_path, typ="bigint")
        for bad in ("int", "float", "string"):
            with pytest.raises(ValueError, match="only widening"):
                alter(t, "v", bad)
        with pytest.raises(ValueError, match="no such column"):
            alter(t, "nope", "bigint")
        # float -> double is legal; double -> float is not
        t2 = str(tmp_path / "f")
        create_mapped_table(
            spark,
            spark.range(3).select("id", F.col("id").cast("float").alias("x")),
            t2,
        )
        alter(t2, "x", "double")
        assert dict(read_mapped(spark, t2).dtypes)["x"] == "double"
        with pytest.raises(ValueError, match="only widening"):
            alter(t2, "x", "float")

    def test_widen_survives_rename_and_composes_with_cdf(
        self, spark, tmp_path
    ):
        """The widened type keys on FIELD ID: a rename neither detaches
        it nor re-narrows; the change feed across the widen is QUIET
        (metadata-only) and spans crossing it read the wide type."""
        from iceberg_file_writer_spark.ingest.snapshots import (
            changes_between,
        )

        t, alter = self._mk(spark, tmp_path)
        v1 = current_version(t)
        alter(t, "v", "bigint")
        evolve_mapped(t, renames={"v": "val"})
        append_mapped(
            spark,
            spark.range(10, 12).select(
                F.col("id").cast("bigint"),
                (F.col("id") + 4_000_000_000).cast("bigint").alias("val"),
            ),
            t,
        )
        v4 = current_version(t)
        feed = changes_between(spark, t, v1, v4)
        assert dict(feed.dtypes)["val"] == "bigint"
        assert _canon(feed.select("change", "id", "val")) == [
            ("+", 10, 4_000_000_010), ("+", 11, 4_000_000_011),
        ]
        # widen-only span: zero change rows
        assert changes_between(spark, t, v1, v1 + 1).count() == 0

    def test_sql_statement_form(self, spark, tmp_path):
        from iceberg_file_writer_spark.sql_dml import (
            execute_dml,
            execute_query,
            execute_script,
        )

        wh = str(tmp_path / "wh")
        execute_script(
            spark,
            """
            CREATE TABLE t (id BIGINT, v INT);
            INSERT INTO t SELECT CAST(1 AS BIGINT) AS id,
              CAST(7 AS INT) AS v;
            ALTER TABLE t ALTER COLUMN v TYPE BIGINT;
            INSERT INTO t SELECT CAST(2 AS BIGINT) AS id,
              CAST(3000000000 AS BIGINT) AS v;
            """,
            catalog=wh,
        )
        got = execute_query(
            spark, "SELECT id, v FROM t ORDER BY id", catalog=wh
        )
        assert dict(got.dtypes)["v"] == "bigint"
        assert [tuple(r) for r in got.collect()] == [
            (1, 7), (2, 3_000_000_000),
        ]
        desc = execute_query(spark, "DESCRIBE t", catalog=wh).collect()
        assert [(r.col_name, r.data_type) for r in desc][:2] == [
            ("id", "bigint"), ("v", "bigint"),
        ]
        with pytest.raises(ValueError, match="only widening"):
            execute_dml(
                spark, "ALTER TABLE t ALTER COLUMN v TYPE INT", catalog=wh
            )
