"""CDC-driven aggregate-view maintenance: the view must equal a full
GROUP BY recompute after ANY sequence of DML against the base table —
deletes, CoW updates, MoR upserts, overwrites — refreshed from the
change feed alone (never a table re-scan)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.agg_view import (
    agg_view_version,
    init_agg_view,
    read_agg_view,
    refresh_agg_view,
)
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    commit_delete_where,
    commit_overwrite,
    commit_update_where,
    read_table_version,
)
from iceberg_file_writer_spark.sql_dml import execute_dml
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _base(spark):
    return (
        load_tables(spark, SF_DIR)["orders"]
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100).cast("long").alias("grp"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )


def _recompute(spark, t):
    return (
        read_table_version(spark, t)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_v"),
        )
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def setup(spark, tmp_path):
    t = str(tmp_path / "base")
    v = str(tmp_path / "view")
    commit_append(spark, _base(spark).where("o_orderkey % 3 = 0"), t, max_rows=500)
    init_agg_view(spark, t, v, ["grp"], "cents")
    return t, v


def test_view_tracks_full_dml_sequence(spark, setup):
    t, v = setup
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))

    # append
    commit_append(spark, _base(spark).where("o_orderkey % 3 = 1"), t, max_rows=500)
    refresh_agg_view(spark, t, v)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))

    # CoW delete (whole groups may vanish)
    commit_delete_where(spark, t, "grp % 5 = 0")
    refresh_agg_view(spark, t, v)
    got = _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v"))
    assert got == _canon(_recompute(spark, t))
    assert all(r[0] % 5 != 0 for r in got)  # deleted groups have NO row

    # CoW update (value moves within surviving groups)
    commit_update_where(spark, t, "grp % 5 = 1", {"cents": "cents + 100"})
    refresh_agg_view(spark, t, v)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))


def test_multi_version_catchup_in_one_refresh(spark, setup):
    """Three commits, ONE refresh: the feed spans the whole gap."""
    t, v = setup
    commit_append(spark, _base(spark).where("o_orderkey % 3 = 1"), t, max_rows=500)
    commit_delete_where(spark, t, "grp % 7 = 0")
    commit_update_where(spark, t, "grp % 7 = 1", {"cents": "cents - 50"})
    refresh_agg_view(spark, t, v)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))


def test_refresh_is_noop_when_current_and_idempotent(spark, setup):
    t, v = setup
    v0 = agg_view_version(v)
    assert refresh_agg_view(spark, t, v) == v0  # no-op
    commit_delete_where(spark, t, "grp % 2 = 0")
    v1 = refresh_agg_view(spark, t, v)
    assert v1 == v0 + 1
    snap = _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v"))
    assert refresh_agg_view(spark, t, v) == v1  # second call: no-op
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == snap


def test_mor_upsert_and_overwrite_flow_through_feed(spark, setup):
    t, v = setup
    # MoR upsert via MERGE statement (key tombstones + new rows)
    spark.createDataFrame(
        [(2, 999, 12345), (10_000_001, 3, 777)],
        "o_orderkey long, grp long, cents long",
    ).createOrReplaceTempView("mv_src")
    execute_dml(
        spark,
        "MERGE INTO base USING (SELECT * FROM mv_src) AS s "
        "ON base.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        {"base": t},
    )
    refresh_agg_view(spark, t, v)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))

    # overwrite replaces everything
    commit_overwrite(
        spark, _base(spark).where("o_orderkey % 10 = 0"), t, max_rows=500
    )
    refresh_agg_view(spark, t, v)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))


def test_crash_between_data_and_publish_is_safe(spark, setup):
    """A staged-but-unpublished data directory must be invisible to
    readers and harmless to the re-run (pointer flip is the commit)."""
    t, v = setup
    before = _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v"))
    commit_delete_where(spark, t, "grp % 3 = 0")
    # simulate the crash: stage the data dir a refresh WOULD write,
    # without publishing the state pointer
    os.makedirs(os.path.join(v, "data-v99"), exist_ok=True)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == before  # old state intact
    refresh_agg_view(spark, t, v)
    assert _canon(read_agg_view(spark, v).select("grp", "n_rows", "sum_v")) == _canon(_recompute(spark, t))
    assert not os.path.exists(os.path.join(v, "data-v99"))  # gc'd


def test_float_value_column_refused(spark, tmp_path):
    t = str(tmp_path / "base")
    commit_append(
        spark,
        load_tables(spark, SF_DIR)["orders"].selectExpr(
            "o_orderkey", "o_custkey % 10 AS grp", "o_totalprice"
        ),
        t,
        max_rows=500,
    )
    with pytest.raises(ValueError, match="exact"):
        init_agg_view(spark, t, str(tmp_path / "view"), ["grp"], "o_totalprice")


def test_wrong_table_and_stale_view_refused(spark, setup, tmp_path):
    t, v = setup
    with pytest.raises(ValueError, match="built over"):
        refresh_agg_view(spark, str(tmp_path / "other"), v)


def test_all_null_group_sum_stays_null_through_refresh(spark, tmp_path):
    """SQL sum semantics under retraction: a group whose values are all
    NULL reports sum NULL after ANY refresh, exactly like a recompute —
    the n_vals counter is what distinguishes it from 'sums to zero'."""
    t = str(tmp_path / "base")
    v = str(tmp_path / "view")
    df = spark.createDataFrame(
        [(1, 10, None), (2, 10, None), (3, 20, 5), (4, 30, 0)],
        "id long, grp long, val long",
    )
    commit_append(spark, df, t, max_rows=500)
    init_agg_view(spark, t, v, ["grp"], "val")
    base = {
        r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()
    }
    assert base[10] == (2, None)  # all-NULL group: sum NULL, not 0
    assert base[30] == (1, 0)  # genuinely-zero group: sum 0

    # a refresh touching OTHER groups must not rewrite NULL to 0
    commit_delete_where(spark, t, "grp = 20")
    refresh_agg_view(spark, t, v)
    after = {
        r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()
    }
    assert after == {10: (2, None), 30: (1, 0)}

    # retracting one NULL row keeps the group all-NULL
    commit_delete_where(spark, t, "id = 1")
    refresh_agg_view(spark, t, v)
    got = {r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()}
    assert got[10] == (1, None)


def test_decimal_value_column_refused(spark, tmp_path):
    """Truncating a decimal per delta breaks recompute equality
    (truncate(a)+truncate(b) != truncate(a+b)) — refused up front."""
    t = str(tmp_path / "base")
    commit_append(
        spark,
        load_tables(spark, SF_DIR)["orders"].selectExpr(
            "o_orderkey",
            "o_custkey % 10 AS grp",
            "CAST(o_totalprice AS DECIMAL(12,2)) AS price",
        ),
        t,
        max_rows=500,
    )
    with pytest.raises(ValueError, match="integral"):
        init_agg_view(spark, t, str(tmp_path / "view"), ["grp"], "price")


def test_mapped_base_table_full_lifecycle(spark, tmp_path):
    """Aggregate views now work on COLUMN-MAPPED bases: the feed
    resolves through the field-id projection, and the view's own
    key/value columns are pinned by FIELD ID — a rename of the group
    key between refreshes re-labels the view instead of breaking it."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        append_mapped,
        delete_where_mapped,
        evolve_mapped,
        read_mapped,
        upsert_mapped,
    )
    from iceberg_file_writer_spark.sql_dml import execute_dml

    t = str(tmp_path / "m")
    load_tables(spark, SF_DIR)
    execute_dml(
        spark,
        "CREATE TABLE m AS SELECT c_custkey, c_custkey % 10 AS grp, "
        "CAST(c_acctbal * 100 AS BIGINT) AS cents FROM customer "
        "WHERE c_custkey < 40",
        {"m": t},
    )
    v = str(tmp_path / "v")
    init_agg_view(spark, t, v, ["grp"], "cents")

    def recompute(keys, val):
        return {
            tuple(r)
            for r in read_mapped(spark, t)
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(val).cast("long").alias("sum_v"),
            )
            .collect()
        }

    def view(keys):
        return {
            tuple(r)
            for r in read_agg_view(spark, v)
            .select(*keys, "n_rows", "sum_v")
            .collect()
        }

    assert view(["grp"]) == recompute(["grp"], "cents")

    # append + CoW delete flow through the mapped feed
    append_mapped(
        spark,
        read_mapped(spark, t).selectExpr(
            "c_custkey + 1000 AS c_custkey", "grp", "cents * 2 AS cents"
        ),
        t,
        max_rows=500,
    )
    delete_where_mapped(spark, t, "grp % 3 = 0")
    refresh_agg_view(spark, t, v)
    assert view(["grp"]) == recompute(["grp"], "cents")

    # MoR upsert (equality-delete tombstones) flows through too
    upsert_mapped(
        spark,
        spark.createDataFrame(
            [(2, 99, 777), (5000, 4, 111)],
            "c_custkey long, grp long, cents long",
        ),
        t,
        ["c_custkey"],
        max_rows=500,
    )
    refresh_agg_view(spark, t, v)
    assert view(["grp"]) == recompute(["grp"], "cents")

    # RENAME the group key mid-stream: metadata-only commit; the view
    # re-labels by field id and keeps folding
    evolve_mapped(t, renames={"grp": "bucket"})
    append_mapped(
        spark,
        spark.createDataFrame(
            [(7000, 1, 555)], "c_custkey long, bucket long, cents long"
        ),
        t,
        max_rows=500,
    )
    refresh_agg_view(spark, t, v)
    assert view(["bucket"]) == recompute(["bucket"], "cents")
    assert "bucket" in read_agg_view(spark, v).columns

    # DROP the value column: refresh refuses with a clear re-init hint
    evolve_mapped(t, drops=["cents"])
    append_mapped(
        spark,
        spark.createDataFrame([(8000, 2)], "c_custkey long, bucket long"),
        t,
        max_rows=500,
    )
    with pytest.raises(ValueError, match="re-run init_agg_view"):
        refresh_agg_view(spark, t, v)


def test_view_over_convert_boundary_refused(spark, tmp_path):
    """A view built while the base was PLAIN cannot refresh across the
    CONVERT TO MAPPED commit (pre-conversion files carry no field-id
    mapping); the error says to restart the span at the conversion."""
    from iceberg_file_writer_spark.sql_dml import execute_dml

    t2 = str(tmp_path / "p")
    v2 = str(tmp_path / "v2")
    commit_append(
        spark,
        _base(spark).where("o_orderkey % 50 = 0"),
        t2,
        max_rows=500,
    )
    init_agg_view(spark, t2, v2, ["grp"], "cents")
    execute_dml(spark, "ALTER TABLE p CONVERT TO MAPPED", {"p": t2})
    with pytest.raises(ValueError, match="CONVERT"):
        refresh_agg_view(spark, t2, v2)
    # ...and re-init (the documented recompute path) works, field-id-pinned
    init_agg_view(spark, t2, v2, ["grp"], "cents")
    refresh_agg_view(spark, t2, v2)  # no-op, current


def test_null_group_key_retracts_against_itself(spark, tmp_path):
    """A NULL-valued group key must meet its own retraction: the merge
    join is null-safe (NULL <=> NULL), so deleting a row of the NULL
    group adjusts THAT group instead of passing the standing NULL row
    through untouched while the retraction lands on a phantom row."""
    t = str(tmp_path / "base")
    v = str(tmp_path / "view")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, 7, 5)],
        "id long, grp long, val long",
    )
    commit_append(spark, df, t, max_rows=500)
    init_agg_view(spark, t, v, ["grp"], "val")
    before = {
        r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()
    }
    assert before[None] == (2, 30)

    commit_delete_where(spark, t, "id = 1")
    refresh_agg_view(spark, t, v)
    got = {tuple(r) for r in read_agg_view(spark, v).select("grp", "n_rows", "sum_v").collect()}
    assert got == {tuple(r) for r in _recompute_val(spark, t).collect()}
    after = {
        r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()
    }
    assert after[None] == (1, 20)  # retraction met the NULL group
    assert len(after) == 2  # no phantom extra NULL row

    # retract the last NULL-group row: the group disappears entirely
    commit_delete_where(spark, t, "id = 2")
    refresh_agg_view(spark, t, v)
    final = {
        r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()
    }
    assert final == {7: (1, 5)}

    # and a NULL group can be BORN through the feed too
    commit_append(
        spark,
        spark.createDataFrame([(9, None, 99)], "id long, grp long, val long"),
        t,
        max_rows=500,
    )
    refresh_agg_view(spark, t, v)
    reborn = {
        r.grp: (r.n_rows, r.sum_v) for r in read_agg_view(spark, v).collect()
    }
    assert reborn == {7: (1, 5), None: (1, 99)}


def _recompute_val(spark, t):
    return (
        read_table_version(spark, t)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").cast("long").alias("sum_v"),
        )
    )


def test_interval_dtype_refused_despite_int_prefix(spark, tmp_path):
    """'interval day' starts with 'int' but is not integral — the
    exactness gate matches the dtype exactly, not by prefix."""
    t = str(tmp_path / "base")
    commit_append(
        spark,
        spark.sql(
            "SELECT id, id % 3 AS grp, "
            "make_dt_interval(0, 0, 0, id) AS iv FROM range(10)"
        ),
        t,
        max_rows=500,
    )
    with pytest.raises(ValueError, match="integral"):
        init_agg_view(spark, t, str(tmp_path / "view"), ["grp"], "iv")


def test_reinit_keeps_prior_generation_one_cycle(spark, setup):
    """Re-running init as the documented recompute path gives the
    replaced data generation the same one-cycle grace refresh gives:
    a reader holding the old state pointer still finds its files."""
    t, v = setup
    import json as _json

    with open(os.path.join(v, "_agg_view_state.json")) as f:
        old_data = _json.load(f)["data"]
    commit_delete_where(spark, t, "grp % 2 = 0")
    init_agg_view(spark, t, v, ["grp"], "cents")
    assert os.path.exists(os.path.join(v, old_data))  # grace survived
    # ...and falls out on the NEXT cycle
    commit_delete_where(spark, t, "grp % 3 = 0")
    refresh_agg_view(spark, t, v)
    assert not os.path.exists(os.path.join(v, old_data))


def test_cdf_stream_maintained_view(spark, tmp_path):
    """A CDF stream + cdf_fold_sink maintains the aggregate with NO
    table reads and NO refresh calls: the view equals a full recompute
    after appends, upserts (retraction pairs), CoW deletes, and even a
    NULL-keyed group; a replayed micro-batch does not double-fold."""
    from iceberg_file_writer_spark.ingest.agg_view import (
        cdf_fold_sink,
        init_cdf_agg_view,
    )
    from iceberg_file_writer_spark.ingest.equality_deletes import commit_upsert
    from iceberg_file_writer_spark.sources.snapshot_stream import (
        register_snapshot_source,
    )

    t = str(tmp_path / "base")
    v = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(1, None, 5), (2, 7, 10), (3, 7, 20), (4, 8, 40)],
        "id long, grp long, val long",
    )
    commit_append(spark, df, t, max_rows=10)
    commit_upsert(
        spark,
        t,
        spark.createDataFrame([(2, 7, 99), (9, None, 1)], "id long, grp long, val long"),
        ["id"],
        max_rows=10,
    )
    commit_delete_where(spark, t, "id = 4")

    init_cdf_agg_view(v, ["grp"], "val")
    register_snapshot_source(spark)
    sink = cdf_fold_sink(v, ["grp"], "val")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.grp: (r.n_rows, r.sum_v)
        for r in read_agg_view(spark, v).collect()
    }
    want = {
        r.grp: (r.n_rows, r.sum_v)
        for r in read_table_version(spark, t)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").cast("long").alias("sum_v"),
        )
        .collect()
    }
    assert got == want
    assert got[None] == (2, 6)  # NULL group folded correctly
    assert got[7] == (2, 119)  # upsert retracted the replaced row

    # replay the last folded batch id by hand: must be a no-op
    import json as _json

    with open(os.path.join(v, "_agg_view_state.json")) as f:
        last = _json.load(f)["last_batch"]
    fake = spark.createDataFrame(
        [("+", 1, 7, 1000)], "change string, _cv long, grp long, val long"
    ).withColumnRenamed("_cv", "_commit_version")
    sink(fake, last)  # same id: skipped
    assert {
        r.grp: (r.n_rows, r.sum_v)
        for r in read_agg_view(spark, v).collect()
    } == want

    # table keeps moving; a resumed stream folds only the tail
    commit_delete_where(spark, t, "grp = 8 OR id = 9")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got2 = {
        r.grp: (r.n_rows, r.sum_v)
        for r in read_agg_view(spark, v).collect()
    }
    assert got2 == {None: (1, 5), 7: (2, 119)}


def test_mapped_swap_rename_relabels_view_atomically(spark, tmp_path):
    """Regression (r12 ADVICE, low): a single-commit column SWAP
    (renames={a:b, b:a} — legal in evolve_mapped) must re-label the
    standing aggregate atomically; sequential withColumnRenamed calls
    produce duplicate/ambiguous names and corrupt the fold."""
    from iceberg_file_writer_spark.ingest.column_mapping import (
        append_mapped,
        create_mapped_table,
        evolve_mapped,
        read_mapped,
    )

    t = str(tmp_path / "m")
    v = str(tmp_path / "v")
    df = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 200), (2, 10, 300)],
        "ka long, kb long, cents long",
    )
    create_mapped_table(spark, df, t)
    init_agg_view(spark, t, v, ["ka", "kb"], "cents")

    evolve_mapped(t, renames={"ka": "kb", "kb": "ka"})
    append_mapped(
        spark,
        spark.createDataFrame([(20, 2, 400)], "ka long, kb long, cents long"),
        t,
    )
    refresh_agg_view(spark, t, v)

    got = _canon(read_agg_view(spark, v).select("ka", "kb", "n_rows", "sum_v"))
    want = _canon(
        read_mapped(spark, t)
        .groupBy("ka", "kb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_v"),
        )
    )
    assert got == want
