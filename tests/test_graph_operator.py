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


def test_pointer_doubling_cuts_round_count(spark):
    """The label-of-label shortcut must make round count logarithmic in
    diameter: a 64-deep path needs ~log2(64) rounds, not 63 (VERDICT r5
    item 3 — large-star/small-star / Shiloach-Vishkin round cutting)."""
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(edges)
    assert connected_components.last_rounds <= 8, connected_components.last_rounds


def test_connected_components_random_graphs_hypothesis(spark):
    """Property: on random edge sets, labels equal the pure-Python
    union-find reference (VERDICT r5 item 8). Deterministic derandomized
    sweep via hypothesis strategies."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=60),
                st.integers(min_value=0, max_value=60),
            ),
            min_size=1,
            max_size=80,
        )
    )
    def prop(raw):
        edges = [(a, b) for a, b in raw if a != b]
        if not edges:
            return
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == _union_find(edges)

    prop()


def test_minhash_lsh_banding_completeness_hypothesis(spark):
    """Property (VERDICT r5 item 8): for random corpora, the banded LSH
    candidate set contains every pair with true shingle-Jaccard >= the
    MinHash threshold. At 16 bands x 4 rows the per-pair miss probability
    at J = 0.8 is 1-(1-0.8^4)^16 ~ 2e-4 and falls steeply above it;
    derandomized examples make the check reproducible — a miss here
    would be a genuine banding-pipeline bug, not sampling noise."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from iceberg_file_writer_spark.operators.text import (
        minhash_band_hash_columns,
    )
    from iceberg_file_writer_spark.queries.dedup import (
        MINHASH_JACCARD_THRESHOLD,
        minhash_sig_from_docs,
    )

    POOL = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

    def shingles(ws):
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.lists(st.sampled_from(POOL), min_size=3, max_size=12),
            min_size=2,
            max_size=6,
        )
    )
    def prop(word_lists):
        docs = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
            "doc_id long, text string",
        )
        sigs = minhash_sig_from_docs(docs).select(
            "doc_id", *minhash_band_hash_columns()
        )
        from iceberg_file_writer_spark.operators.text import LSH_BANDS

        band_arr = F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])
        bands = sigs.select(
            "doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash")
        )
        cands = {
            (r.doc_a, r.doc_b)
            for r in bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
            .collect()
        }
        sets = [shingles(ws) for ws in word_lists]
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                if not sets[a] or not sets[b]:
                    continue
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= MINHASH_JACCARD_THRESHOLD:
                    assert (a, b) in cands, (a, b, j, sorted(cands))

    prop()


def test_prefix_filter_prunes_join_keys(spark):
    """The prefix relation must be a strict subset of the gram relation
    (that's the whole point — fewer join keys), while the entry's oracle
    (the FULL inverted-index join) already proves no qualifying pair is
    lost. Pins the pruning so a refactor can't silently degrade it to
    the full join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iceberg_file_writer_spark.queries.dedup import (
        NGRAM_N,
        _shingle_x_df,
    )

    sf = "/root/testdata/sf0.001"
    grams = _shingle_x_df(spark, sf, NGRAM_N).distinct()
    dfr = grams.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    wr = Window.partitionBy("doc_id").orderBy("df", "x")
    prefix = (
        grams.join(dfr, "x")
        .withColumn("r", F.row_number().over(wr))
        .join(sizes, "doc_id")
        .where(
            F.col("r")
            <= F.col("sz") - F.expr("CAST((7 * sz + 9) div 10 AS INT)") + 1
        )
    )
    n_grams, n_prefix = grams.count(), prefix.count()
    # at t=0.7 the prefix keeps ~30% of each doc's shingles
    assert 0 < n_prefix < 0.45 * n_grams, (n_prefix, n_grams)
