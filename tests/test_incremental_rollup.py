"""Incremental rollup maintenance: any batch arrival order must converge
to the full recompute, refreshing only the touched days' partitions."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.incremental import (
    _partial,
    init_daily_rollup,
    read_daily_rollup,
    refresh_daily_rollup,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        (
            str(r.day),
            r.event_type,
            r.n_events,
            round(r.sum_value, 6),
            round(r.min_value, 6),
            round(r.max_value, 6),
        )
        for r in df.collect()
    )


def test_incremental_refresh_converges_to_full_recompute(spark, tmp_path):
    ev = load_tables(spark, SF_DIR)["events"]
    cutoff = ev.agg(
        F.date_add(F.min(F.to_date("ts")), 12).alias("c")
    ).collect()[0].c

    early = ev.where(F.to_date("ts") <= F.lit(cutoff))
    late_days = ev.where(F.to_date("ts") > F.lit(cutoff))
    # stragglers: some early-day events arrive LAST (out-of-order batch)
    stragglers = early.where(F.col("event_id") % 10 == 0)
    on_time = early.where(F.col("event_id") % 10 != 0)

    rollup = str(tmp_path / "rollup")
    init_daily_rollup(spark, on_time, rollup)
    s1 = refresh_daily_rollup(spark, late_days, rollup)
    assert s1["days_refreshed"] > 0

    # before the straggler batch: snapshot the late-day partition files
    late_files = {
        p: os.stat(p).st_mtime_ns
        for p in _walk_parquet(rollup)
        if _day_of(p) > str(cutoff)
    }
    s2 = refresh_daily_rollup(spark, stragglers, rollup)
    assert s2["days_refreshed"] > 0

    # late-day partitions were not touched by the early-day straggler batch
    after = {
        p: os.stat(p).st_mtime_ns
        for p in _walk_parquet(rollup)
        if _day_of(p) > str(cutoff)
    }
    assert after == late_files

    got = _canon(read_daily_rollup(spark, rollup).drop("avg_value"))
    want = _canon(_partial(ev))
    assert got == want and len(got) > 0


def test_empty_batch_is_noop(spark, tmp_path):
    ev = load_tables(spark, SF_DIR)["events"]
    rollup = str(tmp_path / "rollup")
    init_daily_rollup(spark, ev, rollup)
    before = {p: os.stat(p).st_mtime_ns for p in _walk_parquet(rollup)}
    stats = refresh_daily_rollup(spark, ev.where(F.lit(False)), rollup)
    assert stats == {"days_refreshed": 0}
    assert {p: os.stat(p).st_mtime_ns for p in _walk_parquet(rollup)} == before


def _walk_parquet(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return out


def _day_of(path: str) -> str:
    for part in path.split(os.sep):
        if part.startswith("day="):
            return part[4:]
    return ""


def test_streaming_refresh_keeps_rollup_current(spark, tmp_path):
    """The steady-state composition: a file stream of event batches drives
    refresh_daily_rollup from foreachBatch; after run-to-completion the
    standing rollup equals the batch full recompute regardless of how the
    stream was chunked into micro-batches."""
    ev = load_tables(spark, SF_DIR)["events"]
    # stage the corpus as 3 files -> 3 micro-batches
    staging = str(tmp_path / "incoming")
    ev.withColumn("part", F.col("event_id") % 3).repartition(
        3, "part"
    ).drop("part").write.parquet(staging)

    rollup = str(tmp_path / "rollup")
    init_daily_rollup(spark, ev.where(F.lit(False)), rollup)  # empty start

    def _fold(batch_df, bid):
        # the epoch id as batch_id: a crash-replayed micro-batch becomes
        # a no-op instead of a double-fold (exactly-once composition)
        refresh_daily_rollup(spark, batch_df, rollup, batch_id=str(bid))

    raw_schema = spark.read.parquet(staging).schema
    q = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _canon(read_daily_rollup(spark, rollup).drop("avg_value"))
    want = _canon(_partial(ev))
    assert got == want and len(got) > 0


def test_recover_rollup_heals_crashed_swap(spark, tmp_path):
    """A crash mid-swap strands day=<d>.refresh-old dirs that partition
    discovery would parse as bogus partition values; recover_rollup (run
    at every refresh entry) must restore/drop them (ADVICE r5)."""
    from iceberg_file_writer_spark.ingest.incremental import recover_rollup
    import shutil

    events = load_tables(spark, SF_DIR)["events"]
    rollup = str(tmp_path / "rollup")
    init_daily_rollup(spark, events, rollup)
    want = _canon(read_daily_rollup(spark, rollup).drop("avg_value"))
    days = sorted(d for d in os.listdir(rollup) if d.startswith("day="))
    assert len(days) >= 2

    # crash state A: swap for days[0] never completed — committed data
    # stranded at .refresh-old with nothing live
    os.rename(
        os.path.join(rollup, days[0]),
        os.path.join(rollup, days[0] + ".refresh-old"),
    )
    # crash state B: swap for days[1] completed but old not cleaned
    shutil.copytree(
        os.path.join(rollup, days[1]),
        os.path.join(rollup, days[1] + ".refresh-old"),
    )
    # crash state C: stranded staging root
    os.makedirs(rollup + ".refresh-tmp/day=junk", exist_ok=True)

    recover_rollup(rollup)
    assert not [n for n in os.listdir(rollup) if n.endswith(".refresh-old")]
    assert not os.path.exists(rollup + ".refresh-tmp")
    assert _canon(read_daily_rollup(spark, rollup).drop("avg_value")) == want

    # and a refresh over the healed rollup still converges to recompute
    late = events.limit(50)
    refresh_daily_rollup(spark, late, rollup)
    full = _partial(events.unionByName(late))
    assert _canon(read_daily_rollup(spark, rollup).drop("avg_value")) == _canon(full)


@pytest.mark.slow  # injected-crash sweep, minutes: excluded from the
# default run (pytest.ini); run with -m slow before shipping changes here
def test_refresh_atomic_across_injected_crashes(spark, tmp_path):
    """Crash-inject every rename of the commit phase: recovery must roll
    the batch FORWARD into ALL touched days, and a caller retry with the
    same batch_id must be a no-op — the rollup always converges to the
    full recompute (code-review find r6: partial per-day application)."""
    import os

    from iceberg_file_writer_spark.ingest import incremental as INC

    events = load_tables(spark, SF_DIR)["events"]
    base_events = events.where("event_id % 3 != 0")
    late = events.where("event_id % 3 = 0")  # touches many days at once
    want = _canon(_partial(events))

    crash_at = 0
    while True:
        crash_at += 1
        rollup = str(tmp_path / f"rollup{crash_at}")
        init_daily_rollup(spark, base_events, rollup)
        real_rename = os.rename
        calls = {"n": 0, "crashed": False}

        def exploding(src, dst):
            if str(src).startswith(str(tmp_path)):
                calls["n"] += 1
                if calls["n"] == crash_at:
                    calls["crashed"] = True
                    raise OSError("injected crash")
            return real_rename(src, dst)

        os.rename = exploding
        try:
            INC.refresh_daily_rollup(spark, late, rollup, batch_id="b1")
        except OSError:
            pass
        finally:
            os.rename = real_rename
        INC.refresh_daily_rollup(spark, late, rollup, batch_id="b1")  # retry
        got = _canon(read_daily_rollup(spark, rollup).drop("avg_value"))
        assert got == want, f"crash_at={crash_at}"
        if not calls["crashed"]:
            break
    assert crash_at > 3


def test_int_epoch_batch_ids_and_bounded_ledger(spark, tmp_path):
    """foreachBatch hands refresh an INT epoch id — it must be accepted
    (coerced to str) and still deduplicate replays; the applied-ids
    ledger stays bounded at LEDGER_CAP entries however many batches
    commit (ADVICE r6: unbounded ledger rewrite per batch)."""
    import json

    from iceberg_file_writer_spark.ingest import ledger as L

    ev = load_tables(spark, SF_DIR)["events"]
    rollup = str(tmp_path / "rollup")
    init_daily_rollup(spark, ev.where("event_id % 2 = 0"), rollup)
    batch = ev.where("event_id % 2 = 1").limit(20)
    r1 = refresh_daily_rollup(spark, batch, rollup, batch_id=7)  # int epoch
    assert r1["days_refreshed"] > 0
    r2 = refresh_daily_rollup(spark, batch, rollup, batch_id=7)  # replay
    assert r2["days_refreshed"] == 0
    r3 = refresh_daily_rollup(spark, batch, rollup, batch_id="7")  # str alias
    assert r3["days_refreshed"] == 0

    # ledger stays bounded: drive it past the cap synthetically
    ledger = rollup + ".refresh-applied.json"
    for i in range(L.LEDGER_CAP + 40):
        L.ledger_add(ledger, f"synthetic-{i}")
    ids = json.load(open(ledger))
    assert len(ids) == L.LEDGER_CAP
    assert ids[-1] == f"synthetic-{L.LEDGER_CAP + 39}", "newest ids retained"
    assert "7" not in ids, "oldest ids fell off the capped ledger"


def test_truncated_marker_tmp_rolls_back(spark, tmp_path):
    """A crash mid-marker-write leaves only .refresh-commit.tmp (the
    atomic write protocol): recovery must treat the refresh as
    uncommitted — staging discarded, tmp marker removed, standing
    rollup untouched."""
    ev = load_tables(spark, SF_DIR)["events"]
    rollup = str(tmp_path / "rollup")
    init_daily_rollup(spark, ev, rollup)
    want = _canon(read_daily_rollup(spark, rollup).drop("avg_value"))
    os.makedirs(rollup + ".refresh-tmp/day=1990-01-01")
    with open(rollup + ".refresh-commit.tmp", "w") as f:
        f.write("half-written-batch-i")  # truncated content
    from iceberg_file_writer_spark.ingest.incremental import recover_rollup

    recover_rollup(rollup)
    assert not os.path.exists(rollup + ".refresh-commit.tmp")
    assert not os.path.exists(rollup + ".refresh-tmp")
    got = _canon(read_daily_rollup(spark, rollup).drop("avg_value"))
    assert got == want
