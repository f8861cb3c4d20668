"""Z-order (Morton) clustering keys [extension — not in reference].

The reference writes each partition's rows sorted by one key column
(main.go:51,79); z-ordering generalizes that layout to two columns: both
are min-max quantized to ZBITS integers and bit-interleaved into one
Morton key, so range-partitioning + sorting by the key gives every
written file a tight bounding box in BOTH columns — the statistics
file-level zone maps prune against (proven on disk in
tests/test_zorder_layout.py: ~4x tighter boxes than a naive write).

All arithmetic is int64 (integer multiply + floor division, never
floats), so keys are bitwise identical across engines and the expression
runs shuffle-free inside whole-stage codegen. The one auxiliary relation
is the 1-row min/max bounds aggregate, broadcast back over the corpus —
the same shape as a scalar-subquery threshold, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension -> 32-bit Morton key


def morton_sql(xcol: str, ycol: str) -> str:
    """The Morton interleave as ANSI SQL (for DuckDB oracles)."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def morton_col(x: Column, y: Column) -> Column:
    """The Morton interleave of two pre-quantized ZBITS-wide columns."""
    total = None
    for i in range(ZBITS):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        total = tx + ty if total is None else total + tx + ty
    return total


def _as_int64(df: DataFrame, name: str) -> Column:
    """Quantizable int64 view of a column (timestamps -> epoch micros)."""
    dtype = dict(df.dtypes).get(name, "")
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(name).cast("timestamp"))
    return F.col(name).cast("long")


def with_zorder_key(
    df: DataFrame, cols: tuple[str, str], key_name: str = "zkey"
) -> DataFrame:
    """Append the Morton clustering key over two numeric/timestamp columns.

    Quantization bounds come from one partial-agg pass over ``df``,
    broadcast back (zero-range columns clamp to 0 via ``greatest(range,
    1)``). The write path then applies ``repartitionByRange(key)`` +
    ``sortWithinPartitions(key)`` — see ``ingest.batch.ingest_batch``
    with ``cluster_by``.
    """
    a, b = cols
    av, bv = _as_int64(df, a), _as_int64(df, b)
    src = df.select(*df.columns, av.alias("__za"), bv.alias("__zb"))
    bounds = src.agg(
        F.min("__za").alias("__zamin"),
        F.max("__za").alias("__zamax"),
        F.min("__zb").alias("__zbmin"),
        F.max("__zb").alias("__zbmax"),
    )
    qmax = (1 << ZBITS) - 1
    joined = src.crossJoin(F.broadcast(bounds))
    qa = F.expr(f"((__za - __zamin) * {qmax}) div greatest(__zamax - __zamin, 1)")
    qb = F.expr(f"((__zb - __zbmin) * {qmax}) div greatest(__zbmax - __zbmin, 1)")
    return joined.select(
        *df.columns, morton_col(qa, qb).alias(key_name)
    )


def zorder_recluster(
    df: DataFrame, cols: "tuple[str, str]", target_rows: int
) -> DataFrame:
    """The OPTIMIZE ZORDER rewrite step, shared by the plain and mapped
    compaction paths: append the Morton key, range-partition one
    partition per target file, sort within, drop the key (the ORDER is
    the artifact). Partition count comes from the LIVE row count (one
    count job — compaction is already a whole-table pass), not manifest
    row totals, which include MoR-tombstoned rows and would oversplit a
    heavily-deleted table into under-filled files."""
    if len(cols) != 2:
        raise ValueError("zorder_by takes exactly two columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"no such column(s): {missing}")
    total = df.count()
    nparts = max(1, -(-total // target_rows))
    return (
        with_zorder_key(df, tuple(cols), key_name="__zcluster")
        .repartitionByRange(nparts, "__zcluster")
        .sortWithinPartitions("__zcluster")
        .drop("__zcluster")
    )
