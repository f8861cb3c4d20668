"""Oracle output-type lint.

Round-4 lesson (VERDICT r4 §"What's wrong" #1): `token_budget_sample` and
`pack_training_sequences` were value-identical to their oracles yet driver
hash-red, because their DuckDB oracles emitted HUGEINT/UBIGINT columns
(uncast window ``sum()`` over integers, ``//`` on a hash bucket) and the
driver's hasher canonicalizes int128/uint64 differently than
``tests/oracle_utils.py`` does.  pytest stayed green while the driver was
red — exactly the gap this lint closes.

The rule: every registered oracle's *result* column types must stay inside
the set both hashers agree on.  ``DESCRIBE <query>`` gives DuckDB's
inferred output types without executing the query, so the whole registry
lints in well under a second.
"""

from __future__ import annotations

import pytest

from iceberg_file_writer_spark.queries import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_utils import register_views

# Types whose canonicalization differs between the driver's hasher and the
# repo harness (int128 / unsigned 64-bit / fixed-point decimal).  An oracle
# emitting one of these can be value-correct yet driver hash-red.
_FORBIDDEN_PREFIXES = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")


def _oracle_names():
    return sorted(q.name for q in all_queries().values() if q.oracle is not None)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_types(duck, name):
    register_views(duck, SF_SMOKE)
    oracle = all_queries()[name].oracle
    rows = duck.sql(f"DESCRIBE {oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if str(typ).upper().startswith(_FORBIDDEN_PREFIXES)
    ]
    assert not bad, (
        f"{name}: oracle emits driver-hash-unsafe column types {bad}; "
        "cast back (::BIGINT / ::DOUBLE) in the oracle SQL"
    )


def test_er_oracle_closure_converges_with_margin(duck):
    """Round-9: the ER oracles replaced the unbounded recursive
    transitive closure (O(sum comp^2) rows — ~29 min/entry at sf0.1)
    with an ER_ORACLE_UNROLL-round min-label propagation that calls
    DuckDB error() if the last two rounds differ. This pins the MARGIN:
    convergence must land >= 4 rounds before the unroll bound at the
    pytest SFs, so modest growth cannot silently reach the cliff (the
    cliff itself fails loudly, never wrong)."""
    from iceberg_file_writer_spark.queries.analytics_ext import (
        ER_ORACLE_UNROLL,
        _FUZZY_CTES,
        _er_closure_ctes,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        register_views(duck, sf)
        diffs = "\nUNION ALL\n".join(
            f"SELECT {i} AS r, (SELECT count(*) FROM ("
            f"SELECT node, lbl FROM lbl{i} EXCEPT "
            f"SELECT node, lbl FROM lbl{i - 1})) AS bad"
            for i in range(1, ER_ORACLE_UNROLL + 1)
        )
        rows = dict(
            duck.execute(
                f"WITH {_FUZZY_CTES},\n{_er_closure_ctes()}\n{diffs}"
            ).fetchall()
        )
        converged = min(r for r, bad in rows.items() if bad == 0)
        assert all(rows[r] == 0 for r in rows if r >= converged)
        assert converged <= ER_ORACLE_UNROLL - 4, (sf, converged)
