"""Deterministic corpus sampling / splitting [extension — not in reference].

The sampling layer a training-data pipeline needs on top of the corpus
operators (dedup/quality/language-id): reproducible subsampling,
train/val/test assignment, and fixed-size uniform draws. All three use
**salted-hash sampling** — ``md5(seed || doc_id)`` — instead of RNG-based
``sample()``/``TABLESAMPLE``: the decision for a document is a pure
function of (seed, doc_id), so it is identical across engines (giving an
exact DuckDB oracle), stable under re-runs, repartitioning, and
cluster-size changes, and joins/unions of samples stay consistent. This
is how reproducible sampling is done on large corpora; Bernoulli
``sample()`` depends on partition-local RNG streams and cannot be
replayed by another engine.

Scale notes: the hash decision is a per-row JVM-side expression (md5 +
substring + conv — whole-stage codegen, no shuffle, no Python); the
stratified and split variants aggregate with ordinary partial-agg
groupBy. The fixed-k draw is a global top-k on the hash — Spark executes
orderBy+limit as TakeOrderedAndProject (per-partition heaps + driver
merge of k), not a full sort.

The stratified sample holds a slot in the driver's capped 50-entry
surface (it carries the sampling class's correctness row); the rest are
benched and pytest-oracle-checked via the full registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables

SAMPLE_SEED = "corpus-seed-42:"
# per-language keep rates out of 10000: downsample the dominant language,
# keep the rarest in full — the usual corpus-rebalancing shape
LANG_RATES = {"en": 4000, "de": 8000, "fr": 8000, "es": 8000, "zh": 10000}
DEFAULT_RATE = 10000
SPLIT_TRAIN, SPLIT_VAL = 9000, 9500  # /10000 → 90 / 5 / 5
KSAMPLE_K = 50


def _spark_hash_bucket(col) -> Column:
    """First 8 md5 hex digits of (seed || doc_id) as an integer, mod 10000."""
    h = F.md5(F.concat(F.lit(SAMPLE_SEED), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 10000


def _duck_hash_bucket(col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{SAMPLE_SEED}' || CAST({col} AS VARCHAR)), 1, 8)) "
        f"AS UBIGINT) % 10000"
    )


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in LANG_RATES.items()
    )
    return f"CASE {whens} ELSE {DEFAULT_RATE} END"


def _rate_case_spark() -> Column:
    expr = None
    for lang, rate in LANG_RATES.items():
        expr = (
            F.when(F.col("lang") == lang, rate)
            if expr is None
            else expr.when(F.col("lang") == lang, rate)
        )
    return expr.otherwise(F.lit(DEFAULT_RATE))


@register(
    "doc_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_duck_hash_bucket("doc_id")} < {_rate_case_sql()}
""",
    description=(
        "Deterministic language-stratified sample: salted-hash bucket per "
        "doc vs per-language keep rate (en 40%, de/fr/es 80%, zh 100%) — "
        "reproducible across engines, runs, and cluster sizes"
    ),
    # Round-7 rotation (fifth): driver-green 5-6 consecutive rounds; ceded
    # its slot to the round-6 flagship promotions + persisted-ANN probes
    # (class keeps an exposed sibling — see BASELINE.md rotation table).
    driver_exposed=False,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .where(_spark_hash_bucket(F.col("doc_id")) < _rate_case_spark())
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "doc_split_assignment",
    oracle=f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN {_duck_hash_bucket("doc_id")} < {SPLIT_TRAIN} THEN 'train'
              WHEN {_duck_hash_bucket("doc_id")} < {SPLIT_VAL}   THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split,
       count(*)        AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM assigned
GROUP BY source, split
""",
    description=(
        "Deterministic train/val/test assignment (90/5/5 by salted hash) "
        "with per-(source, split) doc and char counts"
    ),
    driver_exposed=False,
)
def doc_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bucket = _spark_hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
    )
    return (
        t["documents"]
        .select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "doc_uniform_ksample",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
ORDER BY {_duck_hash_bucket("doc_id")} * 10000000000 + doc_id
LIMIT {KSAMPLE_K}
""",
    description=(
        f"Fixed-size uniform draw: the {KSAMPLE_K} docs with the smallest "
        "salted hashes (doc_id tie-break) — a deterministic reservoir "
        "sample, executed as TakeOrderedAndProject (per-partition heaps), "
        "not a global sort"
    ),
    driver_exposed=False,
)
def doc_uniform_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "doc_id", "lang", "source", _spark_hash_bucket(F.col("doc_id")).alias("hb")
        )
        .orderBy("hb", "doc_id")
        .limit(KSAMPLE_K)
        .select("doc_id", "lang", "source")
    )


MIN_WORDS = 20
MIN_UNIQ_RATIO = 0.35


@register(
    "corpus_curation_pipeline",
    oracle=f"""
WITH dedup AS (
  SELECT doc_id, text, lang, source FROM (
    SELECT doc_id, text, lang, source,
           min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
    FROM documents
  ) WHERE doc_id = keeper
), scored AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' ')))::DOUBLE
           / len(string_split(text, ' ')) AS uniq_ratio
  FROM dedup
), kept AS (
  SELECT * FROM scored
  WHERE n_words >= {MIN_WORDS}
    AND uniq_ratio >= {MIN_UNIQ_RATIO}
    AND {_duck_hash_bucket("doc_id")} < {_rate_case_sql()}
)
SELECT source, lang,
       count(*)      AS n_docs,
       sum(n_words)::BIGINT AS total_words
FROM kept
GROUP BY source, lang
""",
    description=(
        "End-to-end corpus curation: exact-dedup survivors -> quality "
        f"filter (>= {MIN_WORDS} words, uniq ratio >= {MIN_UNIQ_RATIO}) -> "
        "language-stratified hash sample -> per-(source, lang) stats — the "
        "composed pipeline a training-data run executes, as one plan"
    ),
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup -> quality -> sample -> stats, declared as one DataFrame plan.

    Scale shape: a single shuffle on the content digest (dedup window);
    everything after is per-row column algebra (quality + hash decisions,
    codegen'd) feeding a partial-agg'd groupBy. Catalyst fuses the
    post-dedup stages into one pass — composing the operators costs no
    extra scans or shuffles over running dedup alone.
    """
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    survivors = (
        t["documents"]
        .withColumn("keeper", keeper)
        .where(F.col("doc_id") == F.col("keeper"))
    )
    ws = F.split(F.col("text"), " ")
    scored = survivors.select(
        "doc_id",
        "lang",
        "source",
        F.size(ws).cast("long").alias("n_words"),
        (F.size(F.array_distinct(ws)).cast("double") / F.size(ws)).alias("uniq_ratio"),
    )
    kept = scored.where(
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("uniq_ratio") >= MIN_UNIQ_RATIO)
        & (_spark_hash_bucket(F.col("doc_id")) < _rate_case_spark())
    )
    return kept.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
    )


PER_GROUP_K = 5


@register(
    "doc_per_source_ksample",
    oracle=f"""
SELECT source, doc_id, lang FROM (
  SELECT source, doc_id, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_duck_hash_bucket("doc_id")} * 10000000000 + doc_id
         ) AS rk
  FROM documents
) WHERE rk <= {PER_GROUP_K}
""",
    description=(
        f"Deterministic fixed-{PER_GROUP_K} sample PER SOURCE by salted "
        "hash — the per-stratum eval-example draw; WindowGroupLimit "
        "pushdown keeps only k rows per group ahead of the sort"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def doc_per_source_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k reproducible examples from every source.

    The per-group dual of doc_uniform_ksample: the same salted-hash order
    (engine/run/cluster-size independent), ranked within each source.
    Scale shape: Spark's WindowGroupLimit pushes the rank-<=-k filter
    below the window sort, so each partition retains k rows per group
    ahead of the exchange — per-group heaps, not a full per-group sort
    (gated in tests/test_plans-style assertions).
    """
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir)["documents"]
    order_key = _spark_hash_bucket(F.col("doc_id")) * 10_000_000_000 + F.col(
        "doc_id"
    )
    return (
        docs.select("source", "doc_id", "lang", order_key.alias("_ok"))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("source").orderBy("_ok"))
        )
        .where(F.col("rk") <= PER_GROUP_K)
        .select("source", "doc_id", "lang")
    )
