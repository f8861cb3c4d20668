"""Warehouse catalog: durable name->path resolution for the SQL
surface — CREATE registers, DROP unregisters, bare names work across
statements and (simulated) sessions; tables={} stays the override."""

from __future__ import annotations

import os

import pytest

from iceberg_file_writer_spark.catalog import Catalog
from iceberg_file_writer_spark.sql_dml import execute_dml, execute_query
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_full_lifecycle_by_bare_name_across_sessions(spark, tmp_path):
    wh = str(tmp_path / "wh")
    load_tables(spark, SF_DIR)

    # session 1: CREATE + INSERT by bare name (no tables= anywhere)
    execute_dml(
        spark,
        "CREATE TABLE accounts AS SELECT c_custkey, c_name, "
        "CAST(c_acctbal * 100 AS BIGINT) AS cents FROM customer "
        "WHERE c_custkey <= 5",
        catalog=wh,
    )
    execute_dml(
        spark,
        "INSERT INTO accounts SELECT c_custkey, c_name, "
        "CAST(c_acctbal * 100 AS BIGINT) AS cents FROM customer "
        "WHERE c_custkey BETWEEN 6 AND 8",
        catalog=wh,
    )

    # a SECOND Catalog instance = a new session/process
    cat2 = Catalog(wh)
    assert cat2.names() == ["accounts"]
    n = execute_query(
        spark, "SELECT count(*) AS n FROM accounts", catalog=cat2
    ).collect()[0].n
    assert n == 9  # custkeys 0..5 plus 6..8

    # MERGE + DESCRIBE + time travel, still by name
    execute_dml(
        spark,
        "MERGE INTO accounts USING (SELECT 1 AS c_custkey, "
        "'patched' AS c_name, CAST(999 AS BIGINT) AS cents) AS s "
        "ON accounts.c_custkey = s.c_custkey "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        catalog=cat2,
    )
    got = execute_query(
        spark,
        "SELECT c_name, cents FROM accounts WHERE c_custkey = 1",
        catalog=cat2,
    ).collect()
    assert [(r.c_name, r.cents) for r in got] == [("patched", 999)]
    desc = execute_query(spark, "DESCRIBE TABLE accounts", catalog=cat2)
    assert [r.col_name for r in desc.collect()] == [
        "c_custkey", "c_name", "cents",
    ]
    old = execute_query(
        spark,
        "SELECT c_name FROM accounts VERSION AS OF 1 WHERE c_custkey = 1",
        catalog=cat2,
    ).collect()
    assert old[0].c_name != "patched"

    # SHOW TABLES sees the catalog
    st = execute_query(spark, "SHOW TABLES", catalog=cat2).collect()
    assert [(r.table_name, r.exists) for r in st] == [("accounts", True)]

    # DROP removes data AND the registration
    execute_dml(spark, "DROP TABLE accounts", catalog=cat2)
    assert Catalog(wh).names() == []
    assert not os.path.exists(os.path.join(wh, "accounts"))
    # an unresolvable bare name falls through to Spark (it could still
    # be a temp view); here nothing backs it, so Spark raises
    with pytest.raises(Exception, match="cannot be found|unknown"):
        execute_query(spark, "SELECT * FROM accounts LIMIT 1", catalog=wh).collect()


def test_tables_override_shadows_catalog(spark, tmp_path):
    wh = str(tmp_path / "wh")
    load_tables(spark, SF_DIR)
    execute_dml(
        spark,
        "CREATE TABLE t AS SELECT 1 AS a",
        catalog=wh,
    )
    other = str(tmp_path / "elsewhere")
    execute_dml(
        spark,
        "CREATE TABLE t AS SELECT 2 AS a",
        tables={"t": other},
        catalog=wh,
    )
    # override wins for reads too
    a_override = execute_query(
        spark, "SELECT a FROM t", tables={"t": other}, catalog=wh
    ).collect()[0].a
    a_catalog = execute_query(spark, "SELECT a FROM t", catalog=wh).collect()[0].a
    assert (a_override, a_catalog) == (2, 1)
    # DROP with the override does NOT unregister the catalog name
    execute_dml(spark, "DROP TABLE t", tables={"t": other}, catalog=wh)
    assert Catalog(wh).names() == ["t"]


def test_register_guards_and_relocation(tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    p = cat.register("x")
    assert p == os.path.join(os.path.abspath(wh), "x")
    assert cat.register("x") == p  # idempotent same-slot
    with pytest.raises(ValueError, match="already registered"):
        cat.register("x", str(tmp_path / "other"))
    with pytest.raises(ValueError, match="invalid table name"):
        cat.register("bad-name!")
    with pytest.raises(ValueError, match="unknown table"):
        cat.resolve("nope")

    # relative storage: the warehouse relocates with a rename
    os.makedirs(p, exist_ok=True)
    wh2 = str(tmp_path / "wh_moved")
    os.rename(wh, wh2)
    assert Catalog(wh2).resolve("x") == os.path.join(
        os.path.abspath(wh2), "x"
    )


def test_create_by_bare_name_without_catalog_refuses(spark):
    with pytest.raises(ValueError, match="catalog|warehouse"):
        execute_dml(spark, "CREATE TABLE nocat AS SELECT 1 AS a")


def test_durable_views_and_script(spark, tmp_path):
    """CREATE VIEW stores SQL in catalog.json (re-planned per read,
    survives sessions); views resolve in queries, may reference tables
    AND other views; execute_script runs ;-separated statements and
    returns the last result."""
    from iceberg_file_writer_spark.sql_dml import execute_script

    wh = str(tmp_path / "wh")
    load_tables(spark, SF_DIR)
    out = execute_script(
        spark,
        """
        CREATE TABLE sales AS
          SELECT o_custkey, CAST(o_totalprice * 100 AS BIGINT) AS cents
          FROM orders WHERE o_orderkey % 50 = 0;
        CREATE VIEW big_sales AS SELECT * FROM sales WHERE cents > 1000000;
        CREATE VIEW big_count AS
          SELECT count(*) AS n, 'has; semicolon' AS note FROM big_sales;
        SELECT n FROM big_count
        """,
        catalog=wh,
    )
    n1 = out.collect()[0].n
    assert n1 > 0

    # a new Catalog instance = a new session; the view re-plans against
    # the table's CURRENT state, so DML shows through it
    cat2 = Catalog(wh)
    assert cat2.view_names() == ["big_count", "big_sales"]
    execute_dml(spark, "DELETE FROM sales WHERE cents > 1000000", catalog=cat2)
    n2 = execute_query(spark, "SELECT n FROM big_count", catalog=cat2).collect()[0].n
    assert n2 == 0

    # guards: name collisions both ways, duplicate CREATE, unknown DROP
    with pytest.raises(ValueError, match="already a TABLE"):
        execute_dml(spark, "CREATE VIEW sales AS SELECT 1 AS a", catalog=cat2)
    with pytest.raises(ValueError, match="already a VIEW"):
        execute_dml(spark, "CREATE TABLE big_sales AS SELECT 1 AS a", catalog=cat2)
    with pytest.raises(ValueError, match="view exists"):
        execute_dml(
            spark, "CREATE VIEW big_sales AS SELECT 1 AS a", catalog=cat2
        )
    execute_dml(
        spark,
        "CREATE OR REPLACE VIEW big_sales AS SELECT * FROM sales WHERE cents > 0",
        catalog=cat2,
    )
    with pytest.raises(ValueError, match="no such view"):
        execute_dml(spark, "DROP VIEW nope", catalog=cat2)
    execute_dml(spark, "DROP VIEW big_count", catalog=cat2)
    assert Catalog(wh).view_names() == ["big_sales"]

    # a broken view body fails at CREATE, not first read
    with pytest.raises(Exception):
        execute_dml(
            spark, "CREATE VIEW broken AS SELECT nope FROM sales", catalog=cat2
        )
    assert "broken" not in Catalog(wh).view_names()


def test_snapshot_table_by_name(spark, tmp_path):
    from iceberg_file_writer_spark.table_api import SnapshotTable

    wh = str(tmp_path / "wh")
    load_tables(spark, SF_DIR)
    execute_dml(
        spark,
        "CREATE TABLE named AS SELECT r_regionkey, r_name FROM region",
        catalog=wh,
    )
    t = SnapshotTable.by_name(spark, "named", wh)
    assert t.read().count() == 5
    assert t.name == "named"
    with pytest.raises(ValueError, match="unknown table"):
        SnapshotTable.by_name(spark, "ghost", wh)


def test_show_views(spark, tmp_path):
    wh = str(tmp_path / "wh")
    execute_dml(spark, "CREATE TABLE t AS SELECT 1 AS a", catalog=wh)
    execute_dml(spark, "CREATE VIEW v1 AS SELECT a FROM t", catalog=wh)
    got = execute_query(spark, "SHOW VIEWS", catalog=wh).collect()
    assert [(r.view_name, r.sql) for r in got] == [("v1", "SELECT a FROM t")]
    assert execute_query(spark, "SHOW VIEWS").count() == 0  # no catalog


def test_failed_ctas_leaves_no_dangling_binding(spark, tmp_path):
    """Regression (r12 ADVICE, low): a CTAS refused because the target
    directory already holds a committed table must NOT leave the bare
    name durably bound in catalog.json — a later statement would
    resolve the name to data the CREATE refused to create."""
    wh = str(tmp_path / "wh")
    load_tables(spark, SF_DIR)
    # a committed table sits at <warehouse>/ghost WITHOUT a binding
    # (created through an explicit override path inside the warehouse)
    execute_dml(
        spark,
        "CREATE TABLE g AS SELECT 1 AS id",
        {"g": os.path.join(wh, "ghost")},
    )
    with pytest.raises(ValueError, match="table exists"):
        execute_dml(
            spark, "CREATE TABLE ghost AS SELECT 2 AS id", catalog=wh
        )
    assert "ghost" not in Catalog(wh).names(), (
        "refused CTAS left a dangling catalog binding"
    )
    # same guard for the empty-schema CREATE flavor
    with pytest.raises(ValueError, match="table exists"):
        execute_dml(spark, "CREATE TABLE ghost (id BIGINT)", catalog=wh)
    assert "ghost" not in Catalog(wh).names()


def test_concurrent_registrations_never_lose_a_binding(tmp_path):
    """r12 (VERDICT r11 missing #4): catalog mutations serialize under
    the O_EXCL claim — N threads registering distinct names into one
    warehouse all survive (the old read-modify-write could last-writer-
    win and silently drop bindings)."""
    import threading

    wh = str(tmp_path / "wh")
    names = [f"t{i:02d}" for i in range(24)]
    errs = []

    def _reg(n):
        try:
            Catalog(wh).register(n)
        except Exception as exc:  # surface, don't swallow
            errs.append((n, exc))

    threads = [threading.Thread(target=_reg, args=(n,)) for n in names]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert Catalog(wh).names() == sorted(names)


def test_stale_catalog_lock_is_stolen(tmp_path, monkeypatch):
    import iceberg_file_writer_spark.catalog as C

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    lock = os.path.join(wh, "catalog.json.lock")
    open(lock, "w").close()
    old = os.path.getmtime(lock)
    os.utime(lock, (old - 60, old - 60))  # crashed holder, long gone
    Catalog(wh).register("t")  # acquires immediately instead of hanging
    assert Catalog(wh).names() == ["t"]
    # r14: the lock file deliberately persists (flock holds the claim;
    # a crashed holder's flock releases by itself — unlinking the file
    # would break mutual exclusion via the flock-unlink inode race)
    assert os.path.exists(lock)


def test_drop_table_refuses_when_a_view_depends_on_it(spark, tmp_path):
    """DROP TABLE warns at drop time, not at the view's next plan: a
    durable view referencing the table refuses the bare DROP; CASCADE
    drops the dependent views with it."""
    wh = str(tmp_path / "wh")
    execute_dml(spark, "CREATE TABLE base AS SELECT 1 AS id", catalog=wh)
    execute_dml(
        spark, "CREATE VIEW v1 AS SELECT id * 2 AS d FROM base", catalog=wh
    )
    with pytest.raises(ValueError, match="v1.*reference"):
        execute_dml(spark, "DROP TABLE base", catalog=wh)
    assert Catalog(wh).names() == ["base"]  # nothing half-dropped
    execute_dml(spark, "DROP TABLE base CASCADE", catalog=wh)
    assert Catalog(wh).names() == []
    assert Catalog(wh).view_names() == []


def test_concurrent_stale_lock_steal_is_single_winner(tmp_path):
    """Regression (r12 ADVICE medium; mechanism re-fixed r14): N
    waiters hitting an abandoned lock file simultaneously must all
    serialize with no lost registration. The unlink-based steal let a
    slow loser delete a fast winner's fresh lock; the r13 rename-based
    steal still had a non-atomic check-then-rename (a waiter that
    observed the stale mtime could rename away a just-re-created live
    lock — ~10% flake: two admitted mutators raced write_atomic and
    threw FileNotFoundError). Under kernel flock there is nothing to
    steal: the abandoned FILE holds no lock, every waiter just
    acquires in turn, and the only on-disk artifact is the persistent
    lock file itself."""
    import threading

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    lock = os.path.join(wh, "catalog.json.lock")
    open(lock, "w").close()
    old = os.path.getmtime(lock)
    os.utime(lock, (old - 60, old - 60))  # crashed holder, long gone
    names = [f"s{i:02d}" for i in range(16)]
    errs = []
    gate = threading.Barrier(len(names))

    def _reg(n):
        try:
            gate.wait()  # maximize simultaneous stale-mtime observers
            Catalog(wh).register(n)
        except Exception as exc:
            errs.append((n, exc))

    threads = [threading.Thread(target=_reg, args=(n,)) for n in names]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert Catalog(wh).names() == sorted(names)
    # the persistent flock file is the lone expected artifact — no
    # .stolen.* litter, no duplicate claims
    litter = [f for f in os.listdir(wh) if ".lock" in f]
    assert litter == [os.path.basename(lock)], litter


def test_ctas_failing_at_execution_unbinds_the_name(spark, tmp_path):
    """Regression (r12 ADVICE, low, part 2): a CTAS whose AS-query
    fails at EXECUTION (not just at the existence check) must also
    leave no durable binding to a directory that was never created —
    and an analysis error must fail before any binding happens."""
    wh = str(tmp_path / "wh")
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        execute_dml(
            spark, "CREATE TABLE broken AS SELECT * FROM no_such_tbl",
            catalog=wh,
        )
    assert "broken" not in Catalog(wh).names()
    with pytest.raises(Exception, match="boom"):
        execute_dml(
            spark,
            "CREATE TABLE broken AS SELECT raise_error('boom') AS x",
            catalog=wh,
        )
    assert "broken" not in Catalog(wh).names(), (
        "runtime-failed CTAS left a dangling catalog binding"
    )
    # the name is immediately reusable by a correct CTAS
    execute_dml(spark, "CREATE TABLE broken AS SELECT 1 AS x", catalog=wh)
    assert "broken" in Catalog(wh).names()
