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
