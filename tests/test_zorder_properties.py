"""Property tests for the z-order Morton bit algebra.

The layout proofs (tests/test_zorder_layout.py) check the *effect* of the
key on disk; these check the *algebra* itself against an independent
Python bit-interleave model over hypothesis-generated inputs — the
Spark column expression, the DuckDB oracle SQL, and the model must all
agree bit for bit, because every cross-engine oracle equality involving
zkeys rests on exactly that.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_file_writer_spark.operators.zorder import ZBITS, morton_col, morton_sql


def _morton_model(x: int, y: int) -> int:
    """Independent reference: interleave x (even bits) and y (odd bits)."""
    z = 0
    for i in range(ZBITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


coord = st.integers(min_value=0, max_value=(1 << ZBITS) - 1)


@given(x=coord, y=coord)
@settings(max_examples=200, deadline=None)
def test_duckdb_morton_matches_model(x: int, y: int):
    # production oracles feed BIGINT columns; bare literals would be
    # INT32 and overflow the << 31 shift
    (got,) = duckdb.sql(
        f"SELECT {morton_sql(f'({x}::BIGINT)', f'({y}::BIGINT)')}"
    ).fetchone()
    assert got == _morton_model(x, y)


@given(
    x1=coord, y1=coord, x2=coord, y2=coord
)
@settings(max_examples=200, deadline=None)
def test_morton_order_model_properties(x1, y1, x2, y2):
    """Structural properties the layout depends on: zero maps to zero,
    the key is a bijection on the quantized grid (distinct coords ->
    distinct keys), and with one coordinate fixed the key is monotone in
    the other — the fact that lets per-partition compaction sort by the
    plain key column without degrading a clustered layout."""
    assert _morton_model(0, 0) == 0
    if (x1, y1) != (x2, y2):
        assert _morton_model(x1, y1) != _morton_model(x2, y2)
    if x1 == x2 and y1 < y2:
        assert _morton_model(x1, y1) < _morton_model(x2, y2)
    if y1 == y2 and x1 < x2:
        assert _morton_model(x1, y1) < _morton_model(x2, y2)


@pytest.mark.parametrize("n", [257])
def test_spark_morton_matches_model_bulk(spark, n):
    """The Spark column expression over a deterministic pseudo-random grid
    sample agrees with the model on every row (one job, n rows)."""
    import pyspark.sql.functions as F

    df = (
        spark.range(n)
        .select(
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
             .cast("long") % (1 << ZBITS)).alias("x"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 8), 16, 10)
             .cast("long") % (1 << ZBITS)).alias("y"),
        )
        .withColumn("z", morton_col(F.col("x"), F.col("y")))
    )
    for r in df.collect():
        assert r.z == _morton_model(r.x, r.y), (r.x, r.y)
