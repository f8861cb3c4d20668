"""Property: the statement-level pruned-scan substitution is invisible
— for ANY WHERE clause assembled from supported, unsupported, gated,
and hazardous fragments (OR/NOT, comments, double quotes, wrong-typed
literals, BETWEEN, functions), ``execute_query`` over the snapshot
table returns exactly the rows Spark SQL returns over the full
unpruned relation. A single lost row is the failure mode the whole
extractor contract exists to exclude.
"""

from __future__ import annotations

import datetime
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_file_writer_spark.ingest.snapshots import (
    commit_append,
    read_table_version,
)
from iceberg_file_writer_spark.sql_dml import execute_dml, execute_query

N = 400

_STATE: dict = {}


def _table(spark):
    if "t" not in _STATE:
        t = os.path.join(tempfile.mkdtemp(prefix="prune-prop-"), "t")
        rows = [
            (
                i,
                (i * 7919) % N,             # scattered: bloom territory
                float((i * 31) % 50) / 2.0,  # double
                f"s{i % 7}",                 # low-cardinality string
                datetime.datetime(2024, 1, 1 + (i % 9)),
            )
            for i in range(N)
        ]
        df = spark.createDataFrame(
            rows, "id bigint, h bigint, d double, s string, ts timestamp"
        ).coalesce(1).sortWithinPartitions("id")
        commit_append(spark, df, t, max_rows=50)
        execute_dml(spark, "CREATE INDEX ON t (h, s) USING BLOOM", {"t": t})
        _STATE["t"] = t
    return _STATE["t"]


# fragment pool: supported shapes, gated shapes, and every hazard class
# the round's review surfaced
_FRAGMENTS = [
    "h = {hv}",
    "h IN ({hv}, {hv2})",
    "id >= {idlo}",
    "id < {idhi}",
    "d = {dv}",                      # int literal on double column
    "d = {dvf}",
    "s = 's{sv}'",
    's = "s{sv}"',                   # double-quoted literal
    "ts = '2024-01-0{tsv}'",         # truncated form on timestamp
    "ts >= '2024-01-0{tsv}'",
    "id BETWEEN {idlo} AND {idhi}",
    "length(s) = 2",
    "h % 2 = 0",
    "id = h",
    "s IS NOT NULL",
    "d IS NULL",
    "id <> {idlo}",
    "s = 'x AND h = {hv}'",          # syntax-shaped data
]


@st.composite
def _where(draw):
    n = draw(st.integers(1, 3))
    frags = [draw(st.sampled_from(_FRAGMENTS)) for _ in range(n)]
    joiner = draw(st.sampled_from([" AND ", " AND ", " AND ", " OR "]))
    w = joiner.join(frags)
    if draw(st.booleans()) and n == 1:
        w = f"NOT ({w})"
    if draw(st.integers(0, 9)) == 0:
        w += " -- trailing comment AND h = 0"
    subs = {
        "hv": draw(st.integers(0, N)),
        "hv2": draw(st.integers(0, N)),
        "idlo": draw(st.integers(0, N)),
        "idhi": draw(st.integers(0, N)),
        "dv": draw(st.integers(0, 25)),
        "dvf": float(draw(st.integers(0, 50))) / 2.0,
        "sv": draw(st.integers(0, 8)),
        "tsv": draw(st.integers(1, 9)),
    }
    return w.format(**subs)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(w=_where(), agg=st.booleans())
def test_property_substitution_is_invisible(spark, w, agg):
    t = _table(spark)
    proj = (
        "count(*) AS n, coalesce(sum(id), 0) AS sid"
        if agg
        else "id, h, d, s"
    )
    sql = f"SELECT {proj} FROM __T__ WHERE {w}"
    got = execute_query(spark, sql.replace("__T__", "t"), {"t": t})
    read_table_version(spark, t).createOrReplaceTempView("prune_prop_full")
    want = spark.sql(sql.replace("__T__", "prune_prop_full"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
