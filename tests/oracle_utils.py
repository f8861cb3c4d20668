"""Mini oracle-compare harness mirroring the driver's t2 correctness gate.

Canonicalization (FIXTURES.md §3): sort columns by name, round floats to
9 significant digits, timestamps → epoch micros UTC, NULLs → sentinel,
sort rows, compare. Catching a mismatch here means catching it before the
driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
from datetime import date, datetime, timezone
from decimal import Decimal

NULL_SENTINEL = "\x00NULL"


def _canon_value(v):
    if v is None:
        return NULL_SENTINEL
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        # 9 significant digits
        return f"{v:.9g}"
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return str(int(v.replace(tzinfo=timezone.utc).timestamp() * 1_000_000))
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns, rows):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_canon_value(row[i]) for i in order))
    out.sort()
    return sorted(c for c in columns), out


def spark_result(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return canonical_rows(cols, rows)


def duck_result(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    rows = rel.fetchall()
    return canonical_rows(cols, rows)


def register_views(con, sf_dir):
    from iceberg_file_writer_spark.schemas import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def assert_parity(spark_df, con, oracle, name=""):
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(con, oracle)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
