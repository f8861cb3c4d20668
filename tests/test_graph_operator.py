"""Direct tests for operators/graph.py::connected_components — the
fixpoint is now shared by near-dup canonicalization and entity
resolution, so its contract is pinned here against an independent
union-find reference, on adversarial shapes the query-level oracles
don't necessarily produce (deep paths = many rounds, exercising the
per-round localCheckpoint lineage truncation)."""

from __future__ import annotations

import pytest

from iceberg_file_writer_spark.operators.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min reachable id
    return {n: find(n) for n in parent}


GRAPHS = {
    # 40-edge path: diameter 40 -> tens of fixpoint rounds, the shape
    # that OOMed the cache()-based loop via nested plan strings
    "deep_path": [(i, i + 1) for i in range(40)],
    "star": [(0, i) for i in range(1, 20)],
    "two_cliques_bridged": (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(4, 10)]
    ),
    "disjoint_pairs": [(2 * i, 2 * i + 1) for i in range(10)],
    "reversed_ids": [(i + 1, i) for i in range(10, 0, -1)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_connected_components_matches_union_find(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)
