"""Corpus hygiene for training pipelines [extension — not in reference]:
benchmark decontamination, repetition-based quality, TF-IDF term profiling.

Three operators a large-scale training-data pipeline runs between dedup
and sampling:

- **eval/train decontamination**: flag training documents that share any
  word n-gram with the evaluation holdout — the standard n-gram-overlap
  contamination check run before training on web-scale corpora. The
  holdout here is the engine's own deterministic salted-hash split
  (queries/sampling.py), so the check composes with the split operators
  and is exactly replayable by the oracle.
- **repetition scores**: the duplicate-word / top-word / duplicate-bigram
  fractions used as quality filters (excessively repetitive documents are
  generation artifacts or boilerplate).
- **TF-IDF top terms**: per-document characteristic terms — corpus-wide
  document frequency joined back to per-document term frequency.

Scale notes (100 TB posture):
- Decontamination is gram-hash algebra (one md5 per word + Horner lead()
  windows, reusing dedup.py's shingle path — no per-row array building),
  then an equi-join of corpus grams against **broadcast** holdout grams:
  eval suites are tiny by construction, so the corpus-side gram stream
  joins without shuffling; the only corpus shuffles are the shingle
  window and the per-doc distinct. The split decision is a pure column
  function of doc_id — no join against an assignment table.
- Repetition scores are two partial-agg chains (per-(doc,word) and
  per-(doc,bigram)) merged on doc_id; every ratio is an exact integer
  ratio divided once, so cross-engine parity is bitwise.
- TF-IDF: term frequencies shuffle once on (doc_id, word); document
  frequency is a partial-agg over the vocabulary, which is broadcast back
  (vocab ≪ corpus); the corpus size is one scalar-aggregate broadcast
  (same shape as TPC-H Q15's threshold). Scores are rounded to 6 decimals
  before ranking so float noise in ln() cannot flip a top-k boundary
  (same policy as the cosine ranking in queries/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators.text import words
from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.queries.dedup import _shingle_x_df, _shingle_x_sql, _WORDX_SQL
from iceberg_file_writer_spark.queries.sampling import (
    SPLIT_TRAIN,
    _duck_hash_bucket,
    _spark_hash_bucket,
)
from iceberg_file_writer_spark.tables import load_tables
from iceberg_file_writer_spark.cache_util import ensure_cached

# 5-word grams: long enough that a shared gram means real shared text (a
# 4-gram already collides on random small-vocab text), short enough to
# catch partial inclusions. Public decontamination pipelines use 8-13
# word grams on natural text; the synthetic corpus's tiny vocabulary
# shifts the discrimination point down.
DECONTAM_N = 5


@register(
    "eval_train_decontamination",
    oracle=f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(DECONTAM_N)}),
grams AS (
  SELECT DISTINCT doc_id, x FROM shingle_x
),
bucketed AS (
  SELECT doc_id, x, {_duck_hash_bucket("doc_id")} AS b FROM grams
)
SELECT tg.doc_id AS train_doc_id,
       eg.doc_id AS eval_doc_id,
       count(*)  AS n_shared_grams
FROM bucketed tg
JOIN bucketed eg ON eg.x = tg.x
WHERE tg.b < {SPLIT_TRAIN} AND eg.b >= {SPLIT_TRAIN}
GROUP BY 1, 2
""",
    description=(
        f"Benchmark decontamination: training docs sharing >= 1 distinct "
        f"{DECONTAM_N}-word gram with the deterministic eval holdout "
        "(salted-hash split), with shared-gram counts — corpus grams "
        "equi-joined against broadcast holdout grams"
    ),
    driver_exposed=False,  # r12 rotation: ceded per tenure (class continuity kept)
)
def eval_train_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cache(): the distinct-gram relation feeds both the train and the
    # holdout side of the overlap join (same policy as the n-gram Jaccard
    # postings relation, queries/dedup.py).
    grams = (
        _shingle_x_df(spark, sf_dir, DECONTAM_N)
        .distinct()
        .withColumn("b", _spark_hash_bucket(F.col("doc_id")))
        .transform(ensure_cached)
    )
    train = grams.where(F.col("b") < SPLIT_TRAIN).select(
        F.col("doc_id").alias("train_doc_id"), "x"
    )
    holdout = grams.where(F.col("b") >= SPLIT_TRAIN).select(
        F.col("doc_id").alias("eval_doc_id"), "x"
    )
    return (
        train.join(F.broadcast(holdout), "x")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


@register(
    "doc_repetition_scores",
    oracle="""
WITH wc AS (
  SELECT doc_id, w, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
),
word_stats AS (
  SELECT doc_id,
         sum(cnt)::BIGINT  AS n_words,
         count(*)  AS n_distinct_words,
         max(cnt)  AS top_word_count
  FROM wc GROUP BY doc_id
),
bg AS (
  SELECT doc_id, g, count(*) AS cnt
  FROM (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         unnest(range(1, len(w))) AS t(i)
  )
  GROUP BY doc_id, g
),
bigram_stats AS (
  SELECT doc_id, sum(cnt) AS n_bigrams, count(*) AS n_distinct_bigrams
  FROM bg GROUP BY doc_id
)
SELECT ws.doc_id,
       ws.n_words,
       round(1.0 - ws.n_distinct_words::DOUBLE / ws.n_words, 6)  AS dup_word_frac,
       round(ws.top_word_count::DOUBLE / ws.n_words, 6)          AS top_word_frac,
       round(1.0 - bs.n_distinct_bigrams::DOUBLE / bs.n_bigrams, 6) AS dup_bigram_frac
FROM word_stats ws JOIN bigram_stats bs ON ws.doc_id = bs.doc_id
""",
    description=(
        "Repetition-based quality signals per document: duplicate-word "
        "fraction, top-word fraction, duplicate-bigram fraction (the "
        "Gopher-style repetition filters)"
    ),
    driver_exposed=False,
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    wc = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    word_stats = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("cnt").alias("top_word_count"),
    )
    # bigrams as a co-partitioned posexplode + lead — the same shape as the
    # shingle path, no per-row array building
    wx = docs.select("doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        wx.select("doc_id", "w", F.lead("w", 1).over(win).alias("w2"))
        .where(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w2").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bigram_stats = bg.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
    )
    return word_stats.join(bigram_stats, "doc_id").select(
        "doc_id",
        "n_words",
        F.round(
            F.lit(1.0) - F.col("n_distinct_words").cast("double") / F.col("n_words"), 6
        ).alias("dup_word_frac"),
        F.round(F.col("top_word_count").cast("double") / F.col("n_words"), 6).alias(
            "top_word_frac"
        ),
        F.round(
            F.lit(1.0) - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"),
            6,
        ).alias("dup_bigram_frac"),
    )


TFIDF_TOP_K = 3


@register(
    "doc_tfidf_top_terms",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, w, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
),
lens AS (SELECT doc_id, sum(cnt) AS n_words FROM tf GROUP BY doc_id),
df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.w AS term,
         round((tf.cnt::DOUBLE / lens.n_words)
               * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
  FROM tf
  JOIN lens ON lens.doc_id = tf.doc_id
  JOIN df ON df.w = tf.w
  CROSS JOIN n
)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rk
  FROM scored
) WHERE rk <= {TFIDF_TOP_K}
""",
    description=(
        f"Top-{TFIDF_TOP_K} TF-IDF terms per document: corpus-wide document "
        "frequency broadcast back onto per-document term frequency, scores "
        "rounded before ranking for cross-engine determinism"
    ),
    driver_exposed=False,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    tf = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-doc length via a window on the already-shuffled tf relation: no
    # second scan, no self-join
    wlen = Window.partitionBy("doc_id")
    tf = tf.withColumn("n_words", F.sum("cnt").over(wlen))
    df_rel = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_rel), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round(
                (F.col("cnt").cast("double") / F.col("n_words"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= TFIDF_TOP_K)
    )
