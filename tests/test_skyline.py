"""Skyline operator: NOT-EXISTS semantics via a distributed prefix
scan — soundness, completeness, tie handling, plan shape."""

from __future__ import annotations

import contextlib
import io

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_file_writer_spark.operators.skyline import skyline2d


def _brute_skyline(rows, minimize_x=True, minimize_y=True):
    def better(a, b):  # a dominates b
        ax, ay = (a[0], a[1]) if minimize_x else (-a[0], a[1])
        bx, by = (b[0], b[1]) if minimize_x else (-b[0], b[1])
        if not minimize_y:
            ay, by = -ay, -by
        return ax <= bx and ay <= by and (ax < bx or ay < by)

    return sorted(r for r in rows if not any(better(o, r) for o in rows))


def test_ties_and_duplicates_all_kept(spark):
    rows = [(1, 10), (1, 10), (1, 5), (2, 5), (2, 20), (3, 5), (0, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(tuple(r) for r in skyline2d(df, "x", "y").collect())
    assert got == _brute_skyline(rows)
    # maximize-y orientation flips the front
    got2 = sorted(
        tuple(r)
        for r in skyline2d(df, "x", "y", minimize_y=False).collect()
    )
    assert got2 == _brute_skyline(rows, minimize_y=False)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_matches_brute_force(spark, rows):
    df = spark.createDataFrame(rows, "x long, y long").repartition(5)
    got = sorted(tuple(r) for r in skyline2d(df, "x", "y", partitions=4).collect())
    assert got == _brute_skyline(rows)


def test_null_dimensions_pass_through(spark):
    """NOT-EXISTS three-valued semantics (ADVICE r9): a NULL x or y can
    never be proven dominated, so those rows are KEPT — and they never
    dominate, so the non-null front is unchanged by their presence."""
    rows = [(1, 10), (2, 5), (3, 1), (None, 0), (0, None), (None, None)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(
        ((r.x, r.y) for r in skyline2d(df, "x", "y").collect()), key=str
    )
    non_null_front = _brute_skyline([r for r in rows if None not in r])
    want = sorted(
        non_null_front + [(None, 0), (0, None), (None, None)], key=str
    )
    assert got == want


def test_plan_has_no_global_window_and_no_cartesian(spark):
    from iceberg_file_writer_spark.queries.analytics_ext import (
        pareto_cheapest_large_parts,
    )

    df = pareto_cheapest_large_parts(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "rangepartitioning" in plan  # the distributed prefix scan
    # every window is partitioned (never a single-task global sort)
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(_pid" in line or (
                "_pid" in line.split("windowspecdefinition(", 1)[1][:60]
            ), line


def test_expectations_detect_violations_and_fuse(spark):
    """Violations are actually found (synthetic dirty data) and the
    non-referential rules fuse into ONE aggregate over one scan."""
    import contextlib
    import io

    from iceberg_file_writer_spark.operators.expectations import (
        check_expectations,
    )

    dirty = spark.createDataFrame(
        [(1, 5.0, "A"), (1, -2.0, "B"), (None, 7.0, "A"), (3, 900.0, "Z")],
        "k long, v double, s string",
    )
    dim = spark.createDataFrame([(1,), (3,)], "k long")
    rep = {
        (r.rule, r.column): (r.n_violations, r.passed)
        for r in check_expectations(
            dirty,
            [
                ("not_null", "k"),
                ("unique", "k"),
                ("range", "v", 0.0, 100.0),
                ("in_set", "s", ["A", "B"]),
                ("ref", "k", dim, "k"),
            ],
        ).collect()
    }
    assert rep[("not_null", "k")] == (1, False)
    assert rep[("unique", "k")] == (1, False)   # the duplicated k=1
    assert rep[("range", "v")] == (2, False)    # -2.0 and 900.0
    assert rep[("in_set", "s")] == (1, False)   # 'Z'
    assert rep[("ref", "k")] == (0, True)       # 1 and 3 both in dim
    with pytest.raises(ValueError, match="unknown expectation"):
        check_expectations(dirty, [("regex", "s", ".*")])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-20, 20), st.integers(-20, 20), st.integers(-20, 20)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_nd_matches_brute_force_3d(spark, rows):
    from iceberg_file_writer_spark.operators.skyline import skyline_nd

    def dominates(a, b):
        # minimize x, maximize y, minimize z
        ka = (a[0], -a[1], a[2])
        kb = (b[0], -b[1], b[2])
        return all(p <= q for p, q in zip(ka, kb)) and ka != kb

    want = sorted(
        r for r in rows if not any(dominates(o, r) for o in rows)
    )
    df = spark.createDataFrame(rows, "x long, y long, z long").repartition(4)
    got = sorted(
        tuple(r)
        for r in skyline_nd(
            df, [("x", "min"), ("y", "max"), ("z", "min")], partitions=3
        ).collect()
    )
    assert got == want


def test_nd_agrees_with_2d_operator(spark):
    from iceberg_file_writer_spark.operators.skyline import skyline_nd

    rows = [(i % 13, (i * 7) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    a = sorted(tuple(r) for r in skyline2d(df, "x", "y", minimize_y=False).collect())
    b = sorted(
        tuple(r)
        for r in skyline_nd(df, [("x", "min"), ("y", "max")]).collect()
    )
    assert a == b
