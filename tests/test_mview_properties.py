"""Property: a materialized view REFRESHed after ANY interleaving of
statement-level DML (CoW deletes, updates, inserts, MoR merges),
schema renames, and layout changes (OPTIMIZE) equals a from-scratch
GROUP BY recompute over the base table — exact values, exact group
set. This is the load-bearing guarantee of the incremental fold: a
drifting sum or a phantom/missing group is silent corruption.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_file_writer_spark.sql_dml import execute_dml, execute_query

_ops = st.lists(
    st.sampled_from(
        ["delete", "update", "insert", "merge", "rename", "optimize",
         "refresh"]
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops, seed=st.integers(0, 2**16))
def test_property_mview_refresh_equals_recompute(
    spark, tmp_path_factory, ops, seed
):
    rng = random.Random(seed)
    wh = str(tmp_path_factory.mktemp("mvprop"))
    rows = [
        (rng.randint(0, 12), rng.randint(-50, 50))
        for _ in range(rng.randint(8, 40))
    ]
    spark.createDataFrame(rows, "g bigint, v bigint").createOrReplaceTempView(
        "mvprop_src"
    )
    execute_dml(
        spark,
        "CREATE TABLE t AS SELECT g, v FROM mvprop_src",
        catalog=wh,
    )
    execute_dml(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT g, count(*) AS n, "
        "sum(v) AS s FROM t GROUP BY g",
        catalog=wh,
    )
    vcol = "v"
    for op in ops:
        if op == "delete":
            execute_dml(
                spark,
                f"DELETE FROM t WHERE g % {rng.randint(2, 5)} = "
                f"{rng.randint(0, 1)}",
                catalog=wh,
            )
        elif op == "update":
            execute_dml(
                spark,
                f"UPDATE t SET {vcol} = {vcol} + {rng.randint(1, 9)} "
                f"WHERE g % {rng.randint(2, 4)} = 1",
                catalog=wh,
            )
        elif op == "insert":
            vals = ", ".join(
                f"({rng.randint(0, 15)}, {rng.randint(-50, 50)})"
                for _ in range(rng.randint(1, 6))
            )
            execute_dml(
                spark,
                f"INSERT INTO t SELECT CAST(g AS BIGINT) AS g, "
                f"CAST({vcol} AS BIGINT) AS {vcol} FROM VALUES {vals} "
                f"AS s(g, {vcol})",
                catalog=wh,
            )
        elif op == "merge":
            vals = ", ".join(
                f"({rng.randint(0, 15)}, {rng.randint(-50, 50)})"
                for _ in range(rng.randint(1, 4))
            )
            execute_dml(
                spark,
                f"MERGE INTO t USING (SELECT CAST(g AS BIGINT) AS g, "
                f"CAST({vcol} AS BIGINT) AS {vcol} FROM VALUES {vals} "
                f"AS x(g, {vcol})) AS s ON t.g = s.g "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *",
                catalog=wh,
            )
        elif op == "rename":
            new = f"v{rng.randint(2, 99)}"
            execute_dml(
                spark,
                f"ALTER TABLE t RENAME COLUMN {vcol} TO {new}",
                catalog=wh,
            )
            vcol = new
        elif op == "optimize":
            execute_dml(spark, "OPTIMIZE t", catalog=wh)
        elif op == "refresh":
            execute_dml(spark, "REFRESH MATERIALIZED VIEW mv", catalog=wh)
    execute_dml(spark, "REFRESH MATERIALIZED VIEW mv", catalog=wh)
    got = {
        (r.g, r.n, r.s)
        for r in execute_query(
            spark, "SELECT g, n, s FROM mv", catalog=wh
        ).collect()
    }
    want = {
        (r.g, r.n, r.s)
        for r in execute_query(
            spark,
            f"SELECT g, count(*) AS n, sum({vcol}) AS s FROM t GROUP BY g",
            catalog=wh,
        ).collect()
    }
    assert got == want
