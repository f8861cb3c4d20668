"""COPY INTO: file-idempotent bulk loading as statement text — parquet
/ CSV / jar-free Avro sources, target-shaped decode, the manifest
"copied" ledger (re-runs skip; rewritten files reload; interleaved DML
does not lose the ledger), and both table flavors.
"""

from __future__ import annotations

import os
import time

import pytest

from iceberg_file_writer_spark.ingest.snapshots import (
    current_version,
    read_manifest,
    read_table_version,
)
from iceberg_file_writer_spark.sql_dml import (
    execute_dml,
    execute_query,
    execute_script,
)


@pytest.fixture()
def src_parquet(spark, tmp_path):
    d = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k bigint, v bigint"
    ).repartition(4).write.parquet(d)
    return d


def _rows(spark, wh):
    return sorted(
        (r.k, r.v)
        for r in execute_query(spark, "SELECT k, v FROM t", catalog=wh).collect()
    )


class TestCopyInto:
    def test_copy_parquet_into_empty_mapped_table(
        self, spark, tmp_path, src_parquet
    ):
        wh = str(tmp_path / "wh")
        execute_dml(spark, "CREATE TABLE t (k BIGINT, v BIGINT)", catalog=wh)
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh
        )
        assert rep["files_loaded"] == 4 and rep["files_skipped"] == 0
        assert _rows(spark, wh) == [(i, i * 10) for i in range(100)]

    def test_rerun_is_noop(self, spark, tmp_path, src_parquet):
        wh = str(tmp_path / "wh")
        execute_dml(spark, "CREATE TABLE t (k BIGINT, v BIGINT)", catalog=wh)
        execute_dml(spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh)
        v1 = current_version(os.path.join(wh, "t"))
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh
        )
        assert rep["files_loaded"] == 0 and rep["files_skipped"] == 4
        assert rep["version"] == v1  # no empty commit
        assert len(_rows(spark, wh)) == 100  # no duplicates

    def test_new_file_loads_incrementally(self, spark, tmp_path, src_parquet):
        wh = str(tmp_path / "wh")
        execute_dml(spark, "CREATE TABLE t (k BIGINT, v BIGINT)", catalog=wh)
        execute_dml(spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh)
        spark.createDataFrame(
            [(1000, 1)], "k bigint, v bigint"
        ).coalesce(1).write.mode("append").parquet(src_parquet)
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh
        )
        assert rep["files_loaded"] == 1
        assert (1000, 1) in _rows(spark, wh)
        assert len(_rows(spark, wh)) == 101

    def test_ledger_survives_interleaved_dml(
        self, spark, tmp_path, src_parquet
    ):
        wh = str(tmp_path / "wh")
        execute_dml(spark, "CREATE TABLE t (k BIGINT, v BIGINT)", catalog=wh)
        execute_dml(spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh)
        execute_script(
            spark,
            "DELETE FROM t WHERE k % 2 = 0; UPDATE t SET v = 0 WHERE k = 1;",
            catalog=wh,
        )
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{src_parquet}'", catalog=wh
        )
        assert rep["files_loaded"] == 0  # ledger carried through DML
        assert len(_rows(spark, wh)) == 50

    def test_rewritten_file_reloads(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        f = str(tmp_path / "one")
        spark.createDataFrame([(1, 1)], "k bigint, v bigint").coalesce(
            1
        ).write.parquet(f)
        execute_dml(spark, "CREATE TABLE t (k BIGINT, v BIGINT)", catalog=wh)
        execute_dml(spark, f"COPY INTO t FROM '{f}'", catalog=wh)
        time.sleep(0.02)
        spark.createDataFrame([(2, 2)], "k bigint, v bigint").coalesce(
            1
        ).write.mode("overwrite").parquet(f)
        rep = execute_dml(spark, f"COPY INTO t FROM '{f}'", catalog=wh)
        assert rep["files_loaded"] == 1  # new (path, mtime, size) key
        assert (2, 2) in _rows(spark, wh)

    def test_copy_csv_with_table_schema(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        d = str(tmp_path / "csv")
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(20)], "k bigint, name string"
        ).coalesce(1).write.option("header", "true").csv(d)
        execute_dml(spark, "CREATE TABLE t (k BIGINT, name STRING)", catalog=wh)
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{d}' FORMAT CSV", catalog=wh
        )
        assert rep["files_loaded"] == 1
        got = execute_query(
            spark, "SELECT k, name FROM t ORDER BY k", catalog=wh
        ).collect()
        assert [(r.k, r.name) for r in got] == [
            (i, f"n{i}") for i in range(20)
        ]

    def test_copy_avro_resolves_to_table_schema(self, spark, tmp_path):
        # jar-free Avro: writer schema (k, v) resolves against the
        # table's READER schema (k, v, tag) — the missing field fills
        # its default, the spec's Schema Resolution contract
        from iceberg_file_writer_spark.ingest.avro_py import write_container

        wh = str(tmp_path / "wh")
        d = tmp_path / "avro"
        d.mkdir()
        writer_schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "v", "type": "long"},
            ],
        }
        write_container(
            str(d / "a.avro"),
            writer_schema,
            [{"k": 1, "v": 10}, {"k": 2, "v": 20}],
        )
        execute_dml(spark, "CREATE TABLE t (k BIGINT, v BIGINT)", catalog=wh)
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{d}' FORMAT AVRO", catalog=wh
        )
        assert rep["files_loaded"] == 1
        assert _rows(spark, wh) == [(1, 10), (2, 20)]

    def test_copy_into_plain_table(self, spark, tmp_path, src_parquet):
        from iceberg_file_writer_spark.ingest.snapshots import commit_append

        t = str(tmp_path / "plain")
        commit_append(
            spark,
            spark.createDataFrame([(0, 0)], "k bigint, v bigint"),
            t,
            max_rows=10,
        )
        rep = execute_dml(
            spark, f"COPY INTO t FROM '{src_parquet}'", {"t": t}
        )
        assert rep["files_loaded"] == 4
        assert read_table_version(spark, t).count() == 101
        assert read_manifest(t, rep["version"]).get("copied")

    def test_copy_respects_standing_partition_spec(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        d = str(tmp_path / "src")
        spark.createDataFrame(
            [(i, i % 7) for i in range(200)], "k bigint, b bigint"
        ).coalesce(1).write.parquet(d)
        execute_script(
            spark,
            f"""
            CREATE TABLE t (k BIGINT, b BIGINT) PARTITIONED BY (bucket(4, k));
            COPY INTO t FROM '{d}';
            """,
            catalog=wh,
        )
        got = execute_query(
            spark, "SELECT count(*) AS n, sum(b) AS s FROM t", catalog=wh
        ).first()
        assert got.n == 200  # spec-clustered, hidden col never surfaces
        assert got.s == sum(i % 7 for i in range(200))

    def test_missing_source_and_bad_format_error(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        execute_dml(spark, "CREATE TABLE t (k BIGINT)", catalog=wh)
        with pytest.raises(ValueError, match="does not exist"):
            execute_dml(
                spark, "COPY INTO t FROM '/nope/nothing'", catalog=wh
            )
        with pytest.raises(ValueError, match="FORMAT"):
            execute_dml(
                spark,
                f"COPY INTO t FROM '{tmp_path}' FORMAT ORC",
                catalog=wh,
            )


class TestShowCreateTable:
    def test_mapped_with_spec_and_rename(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        execute_script(
            spark,
            """
            CREATE TABLE t (k BIGINT, ts TIMESTAMP, v DOUBLE)
              PARTITIONED BY (day(ts), bucket(4, k));
            ALTER TABLE t RENAME COLUMN k TO key;
            """,
            catalog=wh,
        )
        ddl = execute_query(
            spark, "SHOW CREATE TABLE t", catalog=wh
        ).first().createtab_stmt
        assert ddl == (
            "CREATE TABLE t (key BIGINT, ts TIMESTAMP, v DOUBLE) "
            "PARTITIONED BY (day(ts), bucket(4, key))"
        )
        # the emitted DDL round-trips through CREATE TABLE
        wh2 = str(tmp_path / "wh2")
        execute_dml(spark, ddl, catalog=wh2)
        ddl2 = execute_query(
            spark, "SHOW CREATE TABLE t", catalog=wh2
        ).first().createtab_stmt
        assert ddl2 == ddl

    def test_plain_table(self, spark, tmp_path, src_parquet):
        from iceberg_file_writer_spark.ingest.snapshots import commit_append

        t = str(tmp_path / "p")
        commit_append(
            spark,
            spark.createDataFrame([(1, "a")], "k bigint, s string"),
            t,
            max_rows=10,
        )
        ddl = execute_query(
            spark, "SHOW CREATE TABLE t", {"t": t}
        ).first().createtab_stmt
        assert ddl == "CREATE TABLE t (k BIGINT, s STRING)"
