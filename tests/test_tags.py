"""Snapshot tags: named immutable refs, expire pinning, lifecycle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.equality_deletes import commit_upsert
from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    current_version,
    expire_snapshots,
    read_table_version,
)
from iceberg_file_writer_spark.ingest.tags import (
    create_tag,
    delete_tag,
    list_tags,
    read_tag,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    orders = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    commit_append(spark, orders, t, max_rows=500)
    return t, orders


def test_tag_read_and_list(spark, table):
    t, orders = table
    v1 = create_tag(t, "freeze-v1")
    assert v1 == 1
    commit_append(spark, orders.limit(5), t)
    assert list_tags(t)["freeze-v1"]["version"] == 1
    # the tag reads version-1 state even though CURRENT moved on
    assert _canon(read_tag(spark, t, "freeze-v1")) == _canon(orders)


def test_tag_immutable_and_validated(spark, table):
    t, _ = table
    create_tag(t, "x")
    with pytest.raises(ValueError, match="already exists"):
        create_tag(t, "x")
    with pytest.raises(ValueError, match="not committed"):
        create_tag(t, "y", version=99)
    with pytest.raises(ValueError, match="bad tag name"):
        create_tag(t, "../escape")
    with pytest.raises(ValueError, match="no tag"):
        read_tag(spark, t, "nope")
    with pytest.raises(ValueError, match="no tag"):
        delete_tag(t, "nope")


def test_tag_pins_through_expire(spark, table):
    """The operational contract: a tagged snapshot — including its
    merge-on-read delete state — survives expire_snapshots; untagged
    history around it is reclaimed; delete_tag releases the pin."""
    t, orders = table
    # v2: MoR upsert so the tagged state has an equality-delete file
    ups = orders.where("o_custkey % 7 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") * 10
    )
    commit_upsert(spark, t, ups, ["o_orderkey"])
    want_v2 = _canon(read_table_version(spark, t, 2))
    create_tag(t, "q3-freeze", version=2)
    # bury it under more history, then expire to a 1-version window
    for _ in range(3):
        commit_append(spark, orders.limit(3), t)
    expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    cur = current_version(t)
    # untagged ancestors are gone...
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, t, 1)
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, t, 3)
    # ...the tagged version reads back exactly, MoR state intact
    assert _canon(read_tag(spark, t, "q3-freeze")) == want_v2
    assert _canon(read_table_version(spark, t, 2)) == want_v2
    # release the pin: the next expire reclaims manifest and files
    delete_tag(t, "q3-freeze")
    expire_snapshots(t, keep_last=1, data_grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, t, 2)
    assert current_version(t) == cur  # CURRENT untouched throughout
    assert list_tags(t) == {}


def test_timestamp_asof_time_travel(spark, table):
    """TIMESTAMP AS OF: wall-clock resolves to the newest snapshot at or
    before it; pre-genesis times raise."""
    import time

    from iceberg_file_writer_spark.ingest.snapshots import (
        read_table_asof,
        version_asof,
    )

    t, orders = table  # v1 = full orders
    time.sleep(0.02)
    between = int(time.time() * 1000)
    time.sleep(0.02)
    commit_append(spark, orders.limit(3), t)  # v2
    now = int(time.time() * 1000)
    assert version_asof(t, between) == 1
    assert version_asof(t, now) == 2
    assert read_table_asof(spark, t, between).count() == orders.count()
    assert read_table_asof(spark, t, now).count() == orders.count() + 3
    with pytest.raises(ValueError, match="at or before"):
        version_asof(t, 1)  # 1970: predates the table
