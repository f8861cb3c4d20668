"""Training-data pipeline operators, round 4 [extension — not in reference]:
token-budget sampling, sequence packing, bigram-LM quality scoring, CDC
latest-state / SCD2 history, int8 embedding quantization, z-order keys.

Each operator is the Spark-first expression of a step a 100 TB
training-data run needs between curation and the trainer:

- **token-budget sampling**: keep documents per language until a token
  budget is hit, in deterministic salted-hash order — the "sample N
  tokens per language" knob of corpus mixing. Implemented two-phase so no
  single task ever scans a whole language: per-(lang, hash-bucket) token
  totals are partial-aggregated, the tiny bucket ledger is cumsum'd and
  broadcast back, and the exact per-document running total is computed
  only *within* each bucket (parallelism = languages x buckets, each
  window bounded by corpus_size / buckets).
- **sequence packing**: concatenate documents into fixed-token training
  sequences (contiguous packing: a document belongs to the sequence where
  it starts). Sharded: documents are salted-hash-assigned to shards and
  packed within shards, so packing parallelism scales with the cluster
  and no global order exists to bottleneck on.
- **bigram-LM scoring**: per-document mean negative log-likelihood under
  an add-one-smoothed corpus bigram model — the KenLM-perplexity-filter
  shape with the model trained and applied in the same plan. Corpus
  counts shuffle once on the bigram key; the vocabulary-sized unigram
  and V relations broadcast.
- **CDC latest-state / SCD2**: the events stream treated as a changelog —
  latest row per key (the MERGE/upsert read shape) and type-2 validity
  intervals (row history with [valid_from, valid_to) ranges). Both are
  one window over the key partition; no self-joins.
- **int8 quantization**: per-dimension min-max scalar quantization of the
  embedding column — the compression step before an ANN index build. One
  partial-agg bounds pass broadcast back over the corpus; exact integer
  outputs make the oracle bitwise.
- **z-order keys**: 16-bit-per-dimension Morton interleave of
  (user_id, event time) — the multi-column clustering key a lakehouse
  write path sorts by so min/max zone maps prune on both columns. Pure
  integer bit algebra (codegen'd, shuffle-free); the zone-map entry
  aggregates per-prefix ranges to show the clustering the key induces.

Reference scope note: the reference (/root/reference/main.go) is a
partitioned ingest pipeline with no query/compaction surface; these
operators extend its write-side layout thinking (partition + sort keys,
main.go:50-51,78-79) to the training-data read side. [extension]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators.text import words
from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.queries.sampling import (
    _duck_hash_bucket,
    _spark_hash_bucket,
)
from iceberg_file_writer_spark.tables import load_tables

# --- token-budget sampling ------------------------------------------------

TOKEN_BUDGET = 6000  # tokens kept per language
BUDGET_BUCKETS = 16  # hash space [0, 10000) split into 16 ledger buckets
_BUCKET_WIDTH = 10000 // BUDGET_BUCKETS  # 625


@register(
    "token_budget_sample",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         {_duck_hash_bucket("doc_id")} AS hb
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY hb, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM d
)
SELECT doc_id, lang, n_tokens, cum_tokens
FROM c
WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
""",
    description=(
        f"Per-language token-budget sample: documents kept in deterministic "
        f"salted-hash order until {TOKEN_BUDGET} tokens — two-phase "
        "(bucket ledger + within-bucket running totals) so no task scans a "
        "whole language"
    ),
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token budget without a per-language global scan.

    The oracle states the semantics as one cumulative sum ordered by
    (hash, doc_id); the Spark plan computes the identical integers in two
    phases: (1) per-(lang, bucket) token totals — an ordinary partial
    aggregation, (2) a cumulative ledger over the ≤ BUDGET_BUCKETS rows
    per language (tiny; broadcast back), (3) the per-document running
    total only within each (lang, bucket) window, offset by the ledger.
    The bucket index is the leading digits of the same hash the ordering
    uses, so bucket order is a prefix of (hash, doc_id) order and the
    two-phase sum equals the single-window sum exactly.
    """
    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id",
        "lang",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        _spark_hash_bucket(F.col("doc_id")).alias("hb"),
    )
    d = d.withColumn("bucket", F.floor(F.col("hb") / _BUCKET_WIDTH).cast("int"))
    ledger = d.groupBy("lang", "bucket").agg(F.sum("n_tokens").alias("btok"))
    wl = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ledger = ledger.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("btok").over(wl), F.lit(0)).alias("prior_tokens"),
    )
    ww = (
        Window.partitionBy("lang", "bucket")
        .orderBy("hb", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        d.join(F.broadcast(ledger), ["lang", "bucket"])
        .withColumn(
            "cum_tokens", F.col("prior_tokens") + F.sum("n_tokens").over(ww)
        )
        .where(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET)
    )
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens")


# --- sequence packing -----------------------------------------------------

SEQ_LEN = 512  # tokens per training sequence
PACK_SHARDS = 16


@register(
    "pack_training_sequences",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         {_duck_hash_bucket("doc_id")} AS hb
  FROM documents
),
placed AS (
  SELECT doc_id, n_tokens, hb % {PACK_SHARDS} AS shard,
         sum(n_tokens) OVER (PARTITION BY hb % {PACK_SHARDS}
                             ORDER BY hb, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM d
)
SELECT shard,
       (cum - n_tokens) // {SEQ_LEN} AS seq_id,
       count(*)                      AS n_docs,
       sum(n_tokens)                 AS seq_tokens,
       min(doc_id)                   AS first_doc_id
FROM placed
GROUP BY shard, seq_id
""",
    description=(
        f"Sequence packing: documents concatenated into {SEQ_LEN}-token "
        f"training sequences within {PACK_SHARDS} hash shards (a document "
        "belongs to the sequence where it starts) — per-sequence doc and "
        "token counts"
    ),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing, sharded for scale.

    Each shard is an independent token stream: documents are ordered by
    (hash, doc_id) within their hash shard, the running token offset
    places each document, and the sequence id is its start offset div
    SEQ_LEN. Shard count scales with the cluster (wider = more parallel
    packing streams); within a shard the cumulative sum is the same
    one-pass window an ingest sorter already runs. No global ordering
    exists anywhere — that is what makes the op feasible at 100 TB, and
    it is also the training-correct semantics (any fixed deterministic
    document order is as good as any other).
    """
    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        _spark_hash_bucket(F.col("doc_id")).alias("hb"),
    )
    d = d.withColumn("shard", (F.col("hb") % PACK_SHARDS).cast("long"))
    ws = (
        Window.partitionBy("shard")
        .orderBy("hb", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.withColumn("cum", F.sum("n_tokens").over(ws))
    return (
        placed.withColumn(
            "seq_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / SEQ_LEN).cast("long"),
        )
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


# --- bigram LM quality scoring --------------------------------------------


@register(
    "doc_bigram_logprob",
    oracle="""
WITH wx AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(range(1, len(ws) + 1)) AS t(i)
),
bg AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM wx a JOIN wx b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
cu AS (SELECT w AS w1, count(*) AS cu FROM wx GROUP BY w),
v AS (SELECT count(DISTINCT w) AS v FROM wx)
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       round(-avg(ln((cb.cb + 1.0) / (cu.cu + v.v))), 6) AS mean_nll
FROM bg
JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
JOIN cu ON cu.w1 = bg.w1
CROSS JOIN v
GROUP BY bg.doc_id
""",
    description=(
        "Bigram-LM quality score: per-document mean negative log-likelihood "
        "under an add-one-smoothed corpus bigram model (train + apply in one "
        "plan) — the perplexity-filter shape of web-corpus curation"
    ),
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram model trained and applied in a single plan.

    Scale shape: the bigram token stream shuffles once on (w1, w2) for
    the count join (partial-agg'd map-side first); the unigram counts and
    vocabulary size are vocabulary-sized, so both broadcast. The doc-side
    bigram stream is derived by the same posexplode + lead() window the
    repetition/shingle operators use — no per-row array building. Scores
    are rounded to 6 decimals before emission (same cross-engine float
    policy as TF-IDF/cosine ranking).
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    # cache(): the exploded token relation feeds the bigram window and the
    # unigram counts; the bigram relation feeds both the per-doc stream and
    # the corpus counts (same multi-consumer policy as the gram relations
    # in queries/dedup.py — Spark replans the full explode per branch
    # otherwise).
    wx = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w")
    ).cache()
    wd = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        wx.select("doc_id", F.col("w").alias("w1"), F.lead("w", 1).over(wd).alias("w2"))
        .where(F.col("w2").isNotNull())
        .cache()
    )
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = wx.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("cu"))
    # |V| = the unigram relation's row count — no second distinct pass
    v = cu.agg(F.count(F.lit(1)).alias("v"))
    return (
        bg.join(cb, ["w1", "w2"])
        .join(F.broadcast(cu), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("v")))),
                6,
            ).alias("mean_nll"),
        )
    )


# --- CDC latest-state and SCD2 history ------------------------------------


@register(
    "cdc_user_latest_state",
    oracle="""
SELECT user_id,
       event_id AS last_event_id,
       ts       AS last_ts,
       event_type AS last_event_type,
       value    AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    description=(
        "CDC latest-state read: the events stream treated as a changelog, "
        "reduced to the newest row per user (the MERGE/upsert materialized "
        "view) — one window over the key partition, no self-join"
    ),
)
def cdc_user_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "scd2_user_value_history",
    oracle="""
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events
WHERE event_type = 'purchase'
""",
    description=(
        "SCD type-2 history: purchase events per user as versioned rows "
        "with [valid_from, valid_to) validity intervals and an is_current "
        "flag — the slowly-changing-dimension build as one window pass"
    ),
    driver_exposed=False,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = t["events"].where(F.col("event_type") == "purchase")
    return p.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts", 1).over(w).alias("valid_to"),
        "value",
        F.lead("ts", 1).over(w).isNull().alias("is_current"),
    )


# --- int8 embedding quantization ------------------------------------------

EMB_DIMS = 64
QUANT_LEVELS = 255


def _quant_oracle() -> str:
    mins = ", ".join(
        f"min(embedding[{i + 1}]::DOUBLE) AS mn{i}" for i in range(EMB_DIMS)
    )
    maxs = ", ".join(
        f"max(embedding[{i + 1}]::DOUBLE) AS mx{i}" for i in range(EMB_DIMS)
    )
    q = ", ".join(
        f"CAST(floor((embedding[{i + 1}]::DOUBLE - b.mn{i}) * {QUANT_LEVELS}.0"
        f" / (b.mx{i} - b.mn{i})) AS INT)"
        for i in range(EMB_DIMS)
    )
    return f"""
WITH b AS (SELECT {mins}, {maxs} FROM embeddings)
SELECT e.vec_id, e.label,
       list_aggregate([{q}], 'string_agg', ',') AS qvec
FROM embeddings e CROSS JOIN b
"""


@register(
    "embedding_quantize",
    oracle=_quant_oracle(),
    description=(
        "Int8 scalar quantization of the embedding column: per-dimension "
        "min-max bounds (one partial-agg pass, broadcast back) -> "
        f"floor((x - min) * {QUANT_LEVELS} / range) per dimension — the "
        "compression step before an ANN index build, exact integer outputs"
    ),
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bounds pass + one codegen'd projection; no shuffle of vectors.

    The 128 min/max aggregates partial-aggregate map-side into a single
    row that broadcasts back over the corpus (same shape as the TPC-H
    scalar-subquery thresholds). Quantized values are exact integers, so
    the DuckDB oracle matches bitwise; floor() avoids engine-specific
    round-half behavior.
    """
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    dims = [
        F.element_at(F.col("embedding"), i + 1).cast("double").alias(f"e{i}")
        for i in range(EMB_DIMS)
    ]
    flat = emb.select("vec_id", "label", *dims)
    bounds = flat.agg(
        *[F.min(f"e{i}").alias(f"mn{i}") for i in range(EMB_DIMS)],
        *[F.max(f"e{i}").alias(f"mx{i}") for i in range(EMB_DIMS)],
    )
    qcols = [
        F.floor(
            (F.col(f"e{i}") - F.col(f"mn{i}"))
            * F.lit(float(QUANT_LEVELS))
            / (F.col(f"mx{i}") - F.col(f"mn{i}"))
        ).cast("int")
        for i in range(EMB_DIMS)
    ]
    return flat.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        "label",
        F.concat_ws(",", *[c.cast("string") for c in qcols]).alias("qvec"),
    )


# --- z-order clustering keys ----------------------------------------------

ZBITS = 16  # bits per dimension -> 32-bit Morton key


def _morton_sql(xcol: str, ycol: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _morton_spark(x, y):
    total = None
    for i in range(ZBITS):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        total = tx + ty if total is None else total + tx + ty
    return total


@register(
    "events_zorder_keys",
    oracle=f"""
WITH b AS (
  SELECT min(user_id) AS umin, max(user_id) AS umax,
         min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
  FROM events
),
q AS (
  SELECT event_id,
         ((user_id - b.umin) * 65535) // (b.umax - b.umin)      AS qu,
         ((epoch_us(ts) - b.tmin) * 65535) // (b.tmax - b.tmin) AS qt
  FROM events CROSS JOIN b
)
SELECT event_id, {_morton_sql("qu", "qt")} AS zkey
FROM q
""",
    description=(
        "Z-order clustering keys: 16-bit min-max quantization of (user_id, "
        "event time) interleaved into a 32-bit Morton key — the multi-column "
        "sort key that makes file-level zone maps prune on both columns; "
        "pure integer bit algebra, one bounds pass broadcast back"
    ),
    driver_exposed=False,
)
def events_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-path clustering key as a query (so it is oracle-checked).

    All arithmetic is int64 (quantization uses integer multiply + floor
    division, never floats), so the key is bitwise identical across
    engines. At write time the engine would `repartitionByRange(zkey)`
    then `sortWithinPartitions(zkey)` — range-partitioned Morton order is
    what gives every file a tight (user_id, ts) bounding box. The key
    expression itself is shuffle-free whole-stage codegen.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("tus")
    )
    b = ev.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("tus").alias("tmin"),
        F.max("tus").alias("tmax"),
    )
    q = ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        F.expr("((user_id - umin) * 65535) div (umax - umin)").alias("qu"),
        F.expr("((tus - tmin) * 65535) div (tmax - tmin)").alias("qt"),
    )
    return q.select(
        "event_id", _morton_spark(F.col("qu"), F.col("qt")).alias("zkey")
    )


@register(
    "events_zorder_zone_map",
    oracle=f"""
WITH b AS (
  SELECT min(user_id) AS umin, max(user_id) AS umax,
         min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
  FROM events
),
q AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         ((user_id - b.umin) * 65535) // (b.umax - b.umin)      AS qu,
         ((epoch_us(ts) - b.tmin) * 65535) // (b.tmax - b.tmin) AS qt
  FROM events CROSS JOIN b
),
z AS (
  SELECT event_id, user_id, tus, ({_morton_sql("qu", "qt")}) >> 22 AS zfile
  FROM q
)
SELECT zfile,
       count(*)     AS n_rows,
       min(user_id) AS user_min, max(user_id) AS user_max,
       min(tus)     AS ts_min,   max(tus)     AS ts_max
FROM z
GROUP BY zfile
""",
    description=(
        "Zone map induced by z-order clustering: rows grouped by the top "
        "10 bits of the Morton key (one group ~ one file after a range "
        "write) with per-group (user_id, ts) min/max — the statistics a "
        "scan prunes against on either column"
    ),
    driver_exposed=False,
)
def events_zorder_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("tus")
    )
    b = ev.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("tus").alias("tmin"),
        F.max("tus").alias("tmax"),
    )
    q = ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        "user_id",
        "tus",
        F.expr("((user_id - umin) * 65535) div (umax - umin)").alias("qu"),
        F.expr("((tus - tmin) * 65535) div (tmax - tmin)").alias("qt"),
    )
    z = q.select(
        "user_id",
        "tus",
        F.shiftright(_morton_spark(F.col("qu"), F.col("qt")), 22).alias("zfile"),
    )
    return z.groupBy("zfile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_id").alias("user_min"),
        F.max("user_id").alias("user_max"),
        F.min("tus").alias("ts_min"),
        F.max("tus").alias("ts_max"),
    )
