"""Index/operator self-evaluation, round 5 [extension — not in reference]:

- **ANN recall@k**: per-query recall of the trained-IVF approximate
  index against the exact brute-force top-k — the index-quality gate a
  retrieval deployment monitors continuously (probe fewer cells → faster
  but lower recall; this operator is how that dial is read). Both sides
  are deterministic registered operators, so the evaluation itself is
  exactly oracle-checkable — the oracle literally composes the two
  entries' own oracle programs as CTEs and diffs them, meaning the
  evaluation can never drift from what the evaluated operators actually
  compute. Cost shape: both operand plans (each already individually
  scale-audited) plus a candidates-only join on (query_id, neighbor_id)
  — the evaluation adds k·|queries| rows of work on top of its operands.

Reference scope note: the reference (/root/reference/main.go) is a
304-line ingest driver with no query surface. [extension]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# importing the operand module registers it, so its oracles are readable
# from the registry below regardless of import order
from iceberg_file_writer_spark.queries import _REGISTRY, register
from iceberg_file_writer_spark.queries.similarity import (  # noqa: F401
    ivf_knn_cosine,
    knn_bruteforce_cosine,
)

KNN_K = 5  # both operand operators emit top-5 per query

_RECALL_ORACLE = f"""
WITH approx AS (
{_REGISTRY["ivf_knn_cosine"].oracle}
),
exact AS (
{_REGISTRY["knn_bruteforce_cosine"].oracle}
)
SELECT e.query_id,
       count(a.neighbor_id)                  AS n_hits,
       ((1000 * count(a.neighbor_id)) // {KNN_K})::BIGINT AS recall_permille
FROM exact e
LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "ann_recall_at_k",
    oracle=_RECALL_ORACLE,
    description=(
        f"ANN index quality: per-query recall@{KNN_K} of the trained-IVF "
        "index against the exact brute-force top-k (exact integer "
        "permille) — the oracle composes the two operand oracles and "
        "diffs them"
    ),
    eager=True,  # builds/loads a trained artifact or runs a stream at plan time
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the approximate index vs exact ground truth.

    The ground-truth side anchors the output (LEFT join), so a query the
    index misses entirely still reports recall 0 — the failure mode a
    post-filtered or under-probed index exhibits first. Both operands
    are the registered operators themselves (not re-implementations), so
    this evaluation moves when they move.
    """
    approx = ivf_knn_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    exact = knn_bruteforce_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.floor((F.lit(1000) * F.count("hit")) / KNN_K)
            .cast("long")
            .alias("recall_permille"),
        )
    )


_PQ_RECALL_ORACLE = f"""
WITH approx AS (
{_REGISTRY["knn_pq_adc_rerank"].oracle}
),
exact AS (
{_REGISTRY["knn_bruteforce_cosine"].oracle}
)
SELECT e.query_id,
       count(a.neighbor_id)                  AS n_hits,
       ((1000 * count(a.neighbor_id)) // {KNN_K})::BIGINT AS recall_permille
FROM exact e
LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "pq_recall_at_k",
    oracle=_PQ_RECALL_ORACLE,
    description=(
        f"ANN index quality: per-query recall@{KNN_K} of the "
        "product-quantization (ADC) index against the exact brute-force "
        "top-k (exact integer permille) — same composed-oracle pattern "
        "as ann_recall_at_k, so the PQ index ships with its own quality "
        "dial"
    ),
    # Promoted in the round-7 (fifth) rotation; ceded in the ninth
    # (round 10) — ann_recall_at_k keeps the recall-eval shape and
    # knn_pq_adc_rerank keeps PQ exposed.
    driver_exposed=False,
    eager=True,  # builds/loads a trained artifact or runs a stream at plan time
)
def pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the PQ/ADC index vs exact ground truth (LEFT-anchored on
    the exact side, so a fully-missed query reports 0 — see
    ann_recall_at_k)."""
    from iceberg_file_writer_spark.queries.similarity import knn_pq_adc_rerank

    approx = knn_pq_adc_rerank(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    exact = knn_bruteforce_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.floor((F.lit(1000) * F.count("hit")) / KNN_K)
            .cast("long")
            .alias("recall_permille"),
        )
    )


# Ideal DCG for a full top-KNN_K list under the linear gain 
# rel(r) = KNN_K + 1 - r: constant, computed once in Python and inlined
# as the SAME literal into both the Spark plan and the DuckDB oracle so
# the two sides can never disagree on it.
import math as _math

NDCG_IDCG = sum(
    (KNN_K + 1 - r) / _math.log2(r + 1) for r in range(1, KNN_K + 1)
)

_NDCG_ORACLE = f"""
WITH approx AS (
{_REGISTRY["ivf_knn_cosine"].oracle}
),
exact AS (
{_REGISTRY["knn_bruteforce_cosine"].oracle}
),
queries AS (SELECT DISTINCT query_id FROM exact)
SELECT q.query_id,
       round(COALESCE(sum(({KNN_K} + 1 - e.rk) / log2(a.rk + 1)), 0), 6) AS dcg,
       round(COALESCE(sum(({KNN_K} + 1 - e.rk) / log2(a.rk + 1)), 0)
             / {NDCG_IDCG!r}, 6) AS ndcg
FROM queries q
LEFT JOIN approx a ON a.query_id = q.query_id
LEFT JOIN exact e ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY q.query_id
"""


@register(
    "knn_ndcg_at_k",
    oracle=_NDCG_ORACLE,
    description=(
        f"Rank-aware ANN quality: per-query nDCG@{KNN_K} of the "
        "trained-IVF index against the exact brute-force ranking "
        "(linear gain rel = k+1-exact_rank, log2 position discount) — "
        "recall@k says WHETHER the true neighbors were found, nDCG says "
        "whether they were found IN ORDER; same composed-oracle pattern "
        "as ann_recall_at_k"
    ),
    driver_exposed=False,
    eager=True,  # operands build/load the trained IVF artifact at plan time
)
def knn_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-discounted index quality vs exact ground truth.

    Anchored on the exact side's query set (LEFT joins), so a query the
    index misses entirely still reports ndcg 0. An approx hit outside
    the exact top-k carries relevance NULL and falls out of the sum —
    exactly rel = 0. Both operands are the registered operators
    themselves, so this evaluation moves when they move; the evaluation
    adds only k·|queries| rows of join work on top of the operand plans.
    """
    approx = ivf_knn_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rk").alias("ark")
    )
    exact = knn_bruteforce_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rk").alias("erk")
    )
    queries = exact.select("query_id").distinct()
    gain = (F.lit(KNN_K + 1) - F.col("erk")) / F.log2(F.col("ark") + F.lit(1))
    dcg = F.coalesce(F.sum(gain), F.lit(0.0))
    return (
        queries.join(approx, "query_id", "left")
        .join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(dcg, 6).alias("dcg"),
            F.round(dcg / F.lit(NDCG_IDCG), 6).alias("ndcg"),
        )
    )
