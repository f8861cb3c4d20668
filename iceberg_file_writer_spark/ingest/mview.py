"""Materialized views on the SQL statement surface [extension — not in
reference].

``ingest/agg_view.py`` maintains a GROUP BY materialization over a
snapshot table incrementally — the table's own row-level change feed
folds into the standing aggregate, O(|changes| + |view|) per refresh,
never O(table). That engine was API-only; this module gives it the
statement surface every warehouse user expects:

    CREATE MATERIALIZED VIEW mv AS
      SELECT k1, k2, count(*) AS n, sum(v) AS s, avg(v) AS a
      FROM t GROUP BY k1, k2
    REFRESH MATERIALIZED VIEW mv
    SELECT ... FROM mv ...          -- serves the MATERIALIZED state
    SHOW MATERIALIZED VIEWS
    DROP MATERIALIZED VIEW mv

Semantics, deliberately narrow (= exactly what the incremental engine
can maintain EXACTLY under arbitrary DML, including deletes):

- the AS-query must be a single-table GROUP BY whose select list is
  the grouped columns plus ``count(*)``, ``count(col)``, ``sum(col)``
  and/or ``avg(col)`` aggregates over ONE value column — the algebraic
  aggregates that are exactly maintainable under retraction. min/max
  are not offered (a retracted minimum needs the full group); the
  value column must be exact-typed (integral) — float sums drift under
  retraction and are refused by the engine.
- reads serve the last refreshed state (that is what MATERIALIZED
  means); ``REFRESH`` folds the base table's change feed since the
  view's version. ``avg`` derives at read time as sum/count — it is
  never maintained as a float.
- the definition is durable: it rides in the warehouse's
  ``catalog.json`` under ``"mviews"`` with the same atomic publish and
  O_EXCL mutation lock as tables and views, and the materialized state
  lives under ``<warehouse>/_mviews/<name>`` with agg_view's
  crash-safe state-pointer publish (a crash mid-refresh leaves the old
  state readable; re-running is idempotent).

At 100 TB: CREATE pays one full aggregation (unavoidable — it defines
the state); every REFRESH after that is change-sized. DROP TABLE on
the base refuses while a materialized view depends on it (CASCADE
drops both), mirroring the durable-view dependency rule.

Reference scope note: the reference (/root/reference/main.go) only
ever appends; a maintained aggregate over its output is the query
layer's dual of that write contract. [extension]
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ID = r"[A-Za-z_][A-Za-z0-9_]*"
_MV_QUERY_RE = re.compile(
    rf"^SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<t>{_ID})\s+"
    rf"GROUP\s+BY\s+(?P<keys>{_ID}(?:\s*,\s*{_ID})*)$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_RE = re.compile(
    rf"^(?P<fn>COUNT|SUM|AVG)\s*\(\s*(?P<arg>\*|{_ID})\s*\)\s+"
    rf"AS\s+(?P<a>{_ID})$",
    re.IGNORECASE,
)


def parse_mv_query(sql: str) -> dict:
    """Parse a CREATE MATERIALIZED VIEW AS-query into an agg-view spec:
    ``{"table", "keys", "value_col", "items": [(kind, arg, alias)]}``
    with kind in {key, count_star, count_val, sum, avg}. Raises on any
    shape the incremental engine cannot maintain exactly."""
    m = _MV_QUERY_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "materialized views take the exact shape: SELECT <group "
            "cols>, count(*)/count(c)/sum(c)/avg(c) AS <alias>... "
            "FROM <table> GROUP BY <group cols>"
        )
    keys = [k.strip() for k in m.group("keys").split(",")]
    items: list = []
    sel_keys: list = []
    value_cols: set = set()
    for raw in m.group("items").split(","):
        item = raw.strip()
        if re.fullmatch(_ID, item):
            sel_keys.append(item)
            items.append(("key", item, item))
            continue
        am = _AGG_RE.match(item)
        if not am:
            raise ValueError(
                f"unsupported select item {item!r}: materialized views "
                "support group columns and count(*)/count(c)/sum(c)/"
                "avg(c) AS <alias> (min/max are not incrementally "
                "maintainable under deletes — use a plain view)"
            )
        fn, arg, alias = (
            am.group("fn").upper(),
            am.group("arg"),
            am.group("a"),
        )
        if fn == "COUNT" and arg == "*":
            items.append(("count_star", None, alias))
            continue
        if arg == "*":
            raise ValueError(f"{fn}(*) is not SQL")
        value_cols.add(arg)
        kind = {"COUNT": "count_val", "SUM": "sum", "AVG": "avg"}[fn]
        items.append((kind, arg, alias))
    if sorted(sel_keys) != sorted(keys):
        raise ValueError(
            f"select-list group columns {sel_keys} must equal the "
            f"GROUP BY list {keys} exactly"
        )
    if len(value_cols) > 1:
        raise ValueError(
            f"all aggregates must target ONE value column, got "
            f"{sorted(value_cols)} — create one materialized view per "
            "value column"
        )
    if not value_cols:
        raise ValueError(
            "at least one sum(c)/avg(c)/count(c) aggregate is required "
            "(the maintained state is keyed on a value column)"
        )
    return {
        "table": m.group("t"),
        "keys": keys,
        "value_col": value_cols.pop(),
        "items": [list(i) for i in items],
    }


def mview_dir(warehouse: str, name: str) -> str:
    return os.path.join(warehouse, "_mviews", name)


def create_mview(
    spark: SparkSession,
    scope,
    name: str,
    query_sql: str,
    replace: bool = False,
) -> int:
    """Parse, materialize (one full aggregation over CURRENT), then
    durably register. Registration is LAST: a refused or failed
    materialization leaves no catalog entry (the orphan state dir, if
    any, is reclaimed by a later CREATE of the same name). An existing
    name refuses up front — BEFORE the expensive aggregation — unless
    ``replace`` (CREATE OR REPLACE MATERIALIZED VIEW): a typo'd
    re-create must not silently destroy standing state."""
    from iceberg_file_writer_spark.ingest.agg_view import init_agg_view

    cat = scope.catalog
    if cat is None:
        raise ValueError(
            "CREATE MATERIALIZED VIEW needs a catalog/warehouse"
        )
    if not replace and name in cat.mview_names():
        raise ValueError(
            f"materialized view exists: {name} (use CREATE OR REPLACE "
            "MATERIALIZED VIEW)"
        )
    spec = parse_mv_query(query_sql)
    base = spec["table"]
    if base not in scope:
        raise ValueError(f"unknown base table {base!r}")
    table_path = os.path.abspath(scope[base])
    vdir = mview_dir(cat.warehouse, name)
    v = init_agg_view(
        spark, table_path, vdir, spec["keys"], spec["value_col"]
    )
    cat.register_mview(
        name,
        {
            "table": base,
            "table_path": table_path,
            "keys": spec["keys"],
            "value_col": spec["value_col"],
            "items": spec["items"],
            "dir": os.path.relpath(vdir, cat.warehouse),
        },
    )
    return v


def refresh_mview(spark: SparkSession, cat, name: str) -> int:
    """Fold the base table's change feed since the view's version into
    the standing state; returns the version the view now reflects."""
    from iceberg_file_writer_spark.ingest.agg_view import refresh_agg_view

    spec = cat.mview_spec(name)
    return refresh_agg_view(
        spark,
        spec["table_path"],
        os.path.join(cat.warehouse, spec["dir"]),
    )


def read_mview(spark: SparkSession, cat, name: str) -> DataFrame:
    """The materialized state projected to the declared select list.
    sum is NULL for all-NULL groups (exact SQL semantics, maintained
    via the n_vals counter); avg derives as sum/count — double, exactly
    one IEEE division, so it can never drift from a recompute.

    Key columns resolve POSITIONALLY through the agg-view state: a
    base-table RENAME between refreshes re-labels the standing state's
    key columns (field-id re-resolution in refresh_agg_view), so the
    CREATE-time name in the spec may no longer exist — the state's
    current name at the same position is the same logical column, and
    the view's OUTPUT names stay the CREATE-time aliases (a view's
    schema is its own contract, not the base table's)."""
    from iceberg_file_writer_spark.ingest.agg_view import (
        _read_state,
        read_agg_view,
    )

    spec = cat.mview_spec(name)
    vdir = os.path.join(cat.warehouse, spec["dir"])
    df = read_agg_view(spark, vdir)
    state_keys = _read_state(vdir)["keys"]
    key_pos = {k: i for i, k in enumerate(spec["keys"])}
    proj = []
    for kind, arg, alias in spec["items"]:
        if kind == "key":
            proj.append(F.col(state_keys[key_pos[arg]]).alias(alias))
        elif kind == "count_star":
            proj.append(F.col("n_rows").alias(alias))
        elif kind == "count_val":
            proj.append(F.col("n_vals").alias(alias))
        elif kind == "sum":
            proj.append(F.col("sum_v").alias(alias))
        else:  # avg
            proj.append(
                (F.col("sum_v").cast("double") / F.col("n_vals")).alias(
                    alias
                )
            )
    return df.select(*proj)


def drop_mview(cat, name: str) -> None:
    spec = cat.mview_spec(name)  # raises on unknown name
    cat.unregister_mview(name)
    shutil.rmtree(
        os.path.join(cat.warehouse, spec["dir"]), ignore_errors=True
    )


def mview_status(spark: SparkSession, cat) -> list:
    """Rows for SHOW MATERIALIZED VIEWS: (name, base table, definition
    summary, view version, base CURRENT version, stale?)."""
    from iceberg_file_writer_spark.ingest.agg_view import agg_view_version
    from iceberg_file_writer_spark.ingest.snapshots import current_version

    rows = []
    for name in cat.mview_names():
        spec = cat.mview_spec(name)
        vv = agg_view_version(os.path.join(cat.warehouse, spec["dir"]))
        bv = current_version(spec["table_path"])
        rows.append(
            (
                name,
                spec["table"],
                ", ".join(spec["keys"]),
                spec["value_col"],
                vv,
                bv,
                bv > vv,
            )
        )
    return rows
