"""CDC-driven incremental aggregate-view maintenance [extension — not in
reference].

The incremental family so far maintains an append-only rollup
(ingest/incremental.py — batches arrive, groups merge) and a materialized
join (ingest/join_view.py). This closes the triangle: a materialized
GROUP BY over a SNAPSHOT TABLE kept current under *arbitrary DML* —
deletes, CoW updates, MoR upserts, overwrites — by folding the table's
own row-level change feed (snapshots.changes_between) into the standing
aggregate:

1. the feed between the view's last-refreshed version and CURRENT is
   delta-sized by construction (the manifest diff reads only changed
   files / changed tombstone state — never the table),
2. signed per-key deltas aggregate from the feed ('+' rows add, '-'
   rows retract): count folds as +-1, sum as +-value — the algebraic
   aggregates that are exactly maintainable under retraction,
3. the delta full-outer-joins the standing view on the group keys:
   touched groups adjust, groups whose count reaches zero DISAPPEAR
   (exact GROUP BY semantics — an aggregate over no rows has no row),
   untouched groups pass through,
4. the new state lands in a fresh data directory and a single atomic
   state-pointer write publishes it — a crash mid-refresh leaves the
   old state pointer intact (readers never see a partial refresh), and
   re-running the refresh is idempotent (it re-derives the same feed).

Exactness contract: count/sum retraction is exact only over exactly-
representable values, so the value column must be integral or decimal
— a float/double column is refused (retraction drift would diverge
from a full recompute). avg derives as sum/count at read time. min/max
are NOT incrementally maintainable under deletes (a retracted minimum
needs the full group to re-derive) and are deliberately not offered;
the recompute path is `init_agg_view` again.

At 100 TB: refresh cost is O(|changes| + |touched groups| + |view|),
never O(table). The feed read is delta-sized (manifest diff); the
delta aggregate partial-aggregates map-side to the touched-group
relation; the full-outer join shuffles at most the view (groups-sized)
— and with AQE the broadcast side is picked when the view is small.

Reference scope note: the reference (/root/reference/main.go) is a
304-line partitioned ingest driver; this maintains a queryable
aggregate artifact over tables its write path produces. [extension]
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.ledger import write_atomic
from iceberg_file_writer_spark.ingest.snapshots import (
    current_version,
    read_table_version,
)

_STATE = "_agg_view_state.json"

# Integral only: the maintained sums live as BIGINT, and truncating a
# DECIMAL per delta would violate the recompute-equality contract
# (truncate(a) + truncate(b) != truncate(a + b)). Decimal callers cast
# to scaled integers (cents) first. Exact dtype set, not a prefix
# match: ANSI interval dtypes ("interval day" ...) also start with
# "int" and must not slip through.
_EXACT_TYPES = frozenset({"int", "bigint", "smallint", "tinyint", "long"})


def _state_path(view_path: str) -> str:
    return os.path.join(view_path, _STATE)


def _read_state(view_path: str) -> dict:
    with open(_state_path(view_path)) as f:
        return json.load(f)


def _write_data(df: DataFrame, view_path: str, version: int) -> str:
    data = f"data-v{version}"
    df.write.mode("overwrite").parquet(os.path.join(view_path, data))
    return data


def _publish(view_path: str, state: dict) -> None:
    """Atomic state-pointer flip: readers see old or new, never partial."""
    write_atomic(_state_path(view_path), json.dumps(state))


def _gc(view_path: str, keep: str, grace: "str | None" = None) -> None:
    """Remove superseded data generations. ``grace`` (the generation the
    refresh just replaced) survives one cycle so a reader that loaded
    the state pointer moments before the publish still finds its files;
    it falls out on the NEXT refresh."""
    for d in os.listdir(view_path):
        if d.startswith("data-v") and d != keep and d != grace:
            shutil.rmtree(os.path.join(view_path, d), ignore_errors=True)


def _base_columns(table_path: str, version: int) -> "list | None":
    """The base table's field-id schema [[id, name, type], ...] when it
    is column-mapped, else None (plain name-based table)."""
    from iceberg_file_writer_spark.ingest.snapshots import read_manifest

    if version == 0:
        return None  # no snapshots yet: the read raises its own
        # clear "no committed snapshots" error downstream
    m = read_manifest(table_path, version)
    return m.get("columns")


def _apply_renames(df: DataFrame, renames: dict) -> DataFrame:
    """One-pass atomic rename. Sequential ``withColumnRenamed`` calls
    corrupt a single-commit column SWAP (renames={a:b, b:a} — legal in
    evolve_mapped, which rewrites names in one pass): the first call
    creates a duplicate name the second then hits ambiguously."""
    if not renames:
        return df
    return df.select(
        [F.col(c).alias(renames.get(c, c)) for c in df.columns]
    )


def _read_base(spark: SparkSession, table_path: str, mapped: bool) -> DataFrame:
    if mapped:
        from iceberg_file_writer_spark.ingest.column_mapping import read_mapped

        return read_mapped(spark, table_path)
    return read_table_version(spark, table_path)


def _check_exact(df: DataFrame, value_col: str) -> None:
    typ = dict(df.dtypes)[value_col]
    if typ not in _EXACT_TYPES:
        raise ValueError(
            f"value column {value_col!r} has type {typ}: count/sum "
            "retraction is exact only over integral values — cast to a "
            "scaled integer (e.g. cents) first"
        )


def _aggregate(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    # n_vals (the non-NULL count) rides along so the refresh can
    # preserve SQL sum semantics: a group whose values are all NULL has
    # sum_v = NULL, and only the n_vals counter can tell that apart
    # from "values summing to zero" incrementally.
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(value_col).cast("long").alias("n_vals"),
        F.sum(value_col).cast("long").alias("sum_v"),
    )


def init_agg_view(
    spark: SparkSession,
    table_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
) -> int:
    """Materialize GROUP BY ``keys`` -> (count, sum(value_col)) over the
    table's CURRENT version; returns the version the view now reflects."""
    v = current_version(table_path)
    base_cols = _base_columns(table_path, v)
    df = _read_base(spark, table_path, base_cols is not None)
    _check_exact(df, value_col)
    os.makedirs(view_path, exist_ok=True)
    # Re-init over an existing view is the documented recompute path:
    # the generation being replaced gets the same one-cycle grace that
    # refresh gives, so a reader that just loaded the old state pointer
    # still finds its files.
    prior = None
    if os.path.exists(_state_path(view_path)):
        prior = _read_state(view_path).get("data")
    data = _write_data(_aggregate(df, keys, value_col), view_path, v)
    state = {
        "table": os.path.abspath(table_path),
        "keys": list(keys),
        "value_col": value_col,
        "version": v,
        "data": data,
    }
    if base_cols is not None:
        # mapped base: pin the view's columns by FIELD ID so a later
        # RENAME of a key/value column keeps the refresh resolvable
        # (ids are stable; names re-derive at refresh time)
        name_to_id = {name: cid for cid, name, _t in base_cols}
        missing = [c for c in [*keys, value_col] if c not in name_to_id]
        if missing:
            raise ValueError(f"no such column(s): {missing}")
        state["key_ids"] = [name_to_id[k] for k in keys]
        state["value_id"] = name_to_id[value_col]
    _publish(view_path, state)
    _gc(view_path, data, grace=prior if prior != data else None)
    return v


def _read_data(spark: SparkSession, view_path: str, data: str) -> DataFrame:
    """Read a view data generation with its schema resolved from one
    pyarrow footer read (the generation is Spark-written, so the footer
    carries the exact Spark schema JSON) instead of a ~165 ms JVM
    inference pass — the refresh loop reads the standing state every
    cycle (r14, guide §5)."""
    from iceberg_file_writer_spark.ingest.snapshots import fast_parquet_schema

    p = os.path.join(view_path, data)
    sch = fast_parquet_schema(p)
    reader = spark.read.schema(sch) if sch is not None else spark.read
    return reader.parquet(p)


def read_agg_view(spark: SparkSession, view_path: str) -> DataFrame:
    st = _read_state(view_path)
    return _read_data(spark, view_path, st["data"])


def agg_view_version(view_path: str) -> int:
    return _read_state(view_path)["version"]


def _fold_signed(
    standing: DataFrame,
    feed: DataFrame,
    sign,
    keys: list,
    value_col: str,
) -> DataFrame:
    """Fold a SIGNED change relation (``sign`` evaluates to +-1 per
    row) into a standing (keys -> n_rows/n_vals/sum_v) aggregate.

    Null-safe key join: a USING-style column-list join matches with
    plain equality, so a NULL-valued group key would never meet its
    own retraction — the standing NULL group would pass through
    untouched while the delta landed on a separate row. eqNullSafe
    per key (NULL <=> NULL is true) plus a coalesce of the two key
    sides restores exact GROUP BY semantics for NULL groups."""
    delta = feed.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias("_dn"),
        F.sum(
            F.when(F.col(value_col).isNotNull(), sign).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_dnv"),
        F.sum(sign * F.col(value_col)).cast("long").alias("_dv"),
    )
    n_rows = (
        F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))
    ).cast("long")
    n_vals = (
        F.coalesce(F.col("n_vals"), F.lit(0)) + F.coalesce(F.col("_dnv"), F.lit(0))
    ).cast("long")
    raw_sum = (
        F.coalesce(F.col("sum_v"), F.lit(0)) + F.coalesce(F.col("_dv"), F.lit(0))
    ).cast("long")
    delta_r = delta.select(
        *[F.col(k).alias(f"_d_{k}") for k in keys], "_dn", "_dnv", "_dv"
    )
    cond = None
    for k in keys:
        c = standing[k].eqNullSafe(delta_r[f"_d_{k}"])
        cond = c if cond is None else (cond & c)
    return (
        standing.join(delta_r, cond, "full_outer")
        .select(
            *[
                F.coalesce(standing[k], delta_r[f"_d_{k}"]).alias(k)
                for k in keys
            ],
            n_rows.alias("n_rows"),
            n_vals.alias("n_vals"),
            # SQL sum semantics: all-NULL groups report NULL, exactly
            # as a from-scratch recompute would
            F.when(n_vals > 0, raw_sum).alias("sum_v"),
        )
        # exact GROUP BY semantics: a group with no surviving rows has
        # no row (count can never go negative on a consistent feed)
        .where(F.col("n_rows") > 0)
    )


def refresh_agg_view(spark: SparkSession, table_path: str, view_path: str) -> int:
    """Fold the table's change feed since the last refresh into the view.

    Returns the version the view now reflects (no-op when already
    current). Safe to re-run after a crash: the state pointer only
    advances in the final atomic publish, and the feed re-derives
    identically from the immutable manifests.
    """
    st = _read_state(view_path)
    if os.path.abspath(table_path) != st["table"]:
        raise ValueError(
            f"view was built over {st['table']}, not {table_path}"
        )
    keys, value_col = st["keys"], st["value_col"]
    cur = current_version(table_path)
    base_cols = _base_columns(table_path, cur)
    renames: dict = {}
    if base_cols is not None and "key_ids" in st:
        # mapped base: re-resolve the view's columns by field id — a
        # RENAME between refreshes just re-labels the view's key/value
        # columns; a DROP of one refuses loudly (re-init is recompute)
        id_to_name = {cid: name for cid, name, _t in base_cols}
        gone = [
            i
            for i in [*st["key_ids"], st["value_id"]]
            if i not in id_to_name
        ]
        if gone:
            raise ValueError(
                f"view column(s) with field id(s) {gone} were dropped "
                "from the base table; re-run init_agg_view"
            )
        new_keys = [id_to_name[i] for i in st["key_ids"]]
        new_val = id_to_name[st["value_id"]]
        renames = {
            old: new
            for old, new in zip(
                [*st["keys"], st["value_col"]], [*new_keys, new_val]
            )
            if old != new
        }
        keys, value_col = new_keys, new_val
    if cur == st["version"]:
        return cur
    if cur < st["version"]:
        raise ValueError(
            f"table CURRENT v{cur} is behind the view's v{st['version']}"
        )
    # fold the SIGNED pre-net relation: the view's deltas are sign-
    # linear (sum of _d, sum of _d * value), so the netted feed's
    # full-width multiset groupBy + explode would be pure overhead —
    # rows that net to zero contribute zero to every fold term
    from iceberg_file_writer_spark.ingest.snapshots import changes_tagged

    feed = changes_tagged(spark, table_path, st["version"], cur)
    if feed is None:
        # commits happened but no row-level change (e.g. metadata-only):
        # publish the version bump; a rename still re-labels the view
        if renames:
            standing = _apply_renames(read_agg_view(spark, view_path), renames)
            data = _write_data(standing, view_path, cur)
            _publish(
                view_path,
                {
                    **st,
                    "keys": list(keys),
                    "value_col": value_col,
                    "version": cur,
                    "data": data,
                },
            )
            _gc(view_path, data, grace=st["data"])
        else:
            _publish(view_path, {**st, "version": cur})
        return cur
    standing = _apply_renames(read_agg_view(spark, view_path), renames)
    merged = _fold_signed(standing, feed, F.col("_d"), keys, value_col)
    data = _write_data(merged, view_path, cur)
    _publish(
        view_path,
        {
            **st,
            "keys": list(keys),
            "value_col": value_col,
            "version": cur,
            "data": data,
        },
    )
    _gc(view_path, data, grace=st["data"])
    return cur


# --- CDF-driven maintenance: fold the change STREAM directly ------------------


def init_cdf_agg_view(
    view_path: str,
    keys: list,
    value_col: str,
) -> None:
    """Empty standing aggregate for a CDF-stream-maintained view: the
    change feed carries the WHOLE history from version 0, so the fold
    starts from nothing — no base-table scan ever happens. Value-type
    exactness is gated per batch (the schema is only known once rows
    arrive), keeping the contract identical to the table-driven view."""
    os.makedirs(view_path, exist_ok=True)
    _publish(
        view_path,
        {
            "keys": list(keys),
            "value_col": value_col,
            "last_batch": -1,
            "data": None,
        },
    )


def cdf_fold_sink(view_path: str, keys: list, value_col: str):
    """foreachBatch callback maintaining a standing GROUP BY aggregate
    from a CHANGE DATA FEED stream (``format("snapshot_table").option(
    "readChangeFeed", "true")``) — the composition the CDF exists for:
    the stream already delivers signed row-level changes, so the
    consumer folds them sign-linearly (the shared ``_fold_signed``) and
    never reads the base table, never calls refresh, never recomputes a
    feed.

    Exactly-once under micro-batch REPLAYS: the state records the last
    folded batch id; a replayed batch (checkpoint recovery re-delivers
    the last uncommitted batch) is skipped, so no delta double-folds.
    The state-pointer publish is atomic (old or new, never partial).

    The view is bound to ONE checkpoint lineage: batch ids are
    monotonic only within a checkpoint, so pointing a FRESH checkpoint
    at an existing view would restart ids at 0 and the ledger would
    skip every batch (safe — never double-folds — but silently stale).
    To rebuild, re-run init_cdf_agg_view with a fresh checkpoint dir.

    At 100 TB: per-batch cost is O(batch + touched groups + view); the
    stream's planner already made each batch change-sized.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        st = _read_state(view_path)
        if batch_id <= st.get("last_batch", -1):
            return  # replay after checkpoint recovery: already folded
        ks, vc = st["keys"], st["value_col"]
        _check_exact(batch_df, vc)
        if st.get("data"):
            standing = _read_data(s, view_path, st["data"])
        else:
            standing = (
                batch_df.select(
                    *ks,
                    F.lit(0).cast("long").alias("n_rows"),
                    F.lit(0).cast("long").alias("n_vals"),
                    F.lit(0).cast("long").alias("sum_v"),
                ).where(F.lit(False))
            )
        sign = F.when(F.col("change") == "+", F.lit(1)).otherwise(F.lit(-1))
        merged = _fold_signed(standing, batch_df, sign, ks, vc)
        data = _write_data(merged, view_path, batch_id)
        _publish(
            view_path,
            {**st, "last_batch": batch_id, "data": data},
        )
        _gc(view_path, data, grace=st.get("data"))

    return _sink
