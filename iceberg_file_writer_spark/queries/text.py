"""Text-analysis queries over ``documents`` [extension — not in reference].

Language-ID, quality scoring, token counting, and document fingerprinting
(SURVEY.md §2.4). All computed with JVM-side column expressions (no UDFs);
each paired with DuckDB oracle SQL that reproduces the identical
arithmetic, including the shared md5-based hashing (operators/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators.text import (
    LANG_LEXICONS,
    TOKEN_PATTERN,
    predicted_lang,
    words,
)
from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables
from iceberg_file_writer_spark.cache_util import ensure_cached

# SQL fragment shared by the language-ID oracle: per-lang token-occurrence
# scores over the word list `w` (alphabetical lang order = tie-break order).
def _lang_scores_sql() -> str:
    parts = []
    for lang in sorted(LANG_LEXICONS):
        lex = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
        parts.append(f"len(list_filter(w, t -> t IN ({lex}))) AS s_{lang}")
    return ",\n         ".join(parts)


def _argmax_lang_sql() -> str:
    langs = sorted(LANG_LEXICONS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    whens = " ".join(f"WHEN s_{l} = {best} THEN '{l}'" for l in langs)
    return f"CASE {whens} END"


@register(
    "doc_language_id",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), scored AS (
  SELECT doc_id, lang,
         {_lang_scores_sql()}
  FROM toks
)
SELECT doc_id,
       lang AS labeled_lang,
       {_argmax_lang_sql()} AS predicted_lang
FROM scored
""",
    description="Language-ID: stopword-lexicon vote, argmax with alphabetical tie-break",
    # Round-7 rotation (fifth): driver-green 5-6 consecutive rounds; ceded
    # its slot to the round-6 flagship promotions + persisted-ANN probes
    # (class keeps an exposed sibling — see BASELINE.md rotation table).
    driver_exposed=False,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ws = words(F.col("text"))
    return t["documents"].select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted_lang(ws).alias("predicted_lang"),
    )


@register(
    "doc_quality_scores",
    oracle="""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
)
SELECT doc_id,
       length(text)                                   AS n_chars,
       len(w)                                         AS n_words,
       len(list_distinct(w))                          AS n_uniq_words,
       len(list_distinct(w))::DOUBLE / len(w)         AS uniq_ratio,
       length(replace(text, ' ', ''))::DOUBLE / len(w) AS avg_word_len,
       len(list_filter(w, t -> t IN ('the','and','is','of','to','a','in')))::DOUBLE
         / len(w)                                     AS stopword_ratio
FROM toks
""",
    description="Quality scoring: length, lexical diversity, stopword ratio",
    # Round-6 rotation: slot ceded to the round-6 promotions
    # (driver-green in earlier rounds; still benched + pytest-
    # oracle-checked every session).
    driver_exposed=False,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ws = words(F.col("text"))
    en = LANG_LEXICONS["en"]
    df = t["documents"].select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_uniq_words"),
        ws.alias("w"),
    )
    return df.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_uniq_words",
        (F.col("n_uniq_words").cast("double") / F.col("n_words")).alias("uniq_ratio"),
        (
            F.length(F.array_join(F.col("w"), "")).cast("double") / F.col("n_words")
        ).alias("avg_word_len"),
        (
            F.size(F.filter(F.col("w"), lambda x: x.isin(*en))).cast("double")
            / F.col("n_words")
        ).alias("stopword_ratio"),
    )


@register(
    "doc_token_counts",
    oracle=f"""
SELECT doc_id,
       len(string_split(text, ' '))                        AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))    AS bpe_tokens,
       length(text)                                        AS n_bytes
FROM documents
""",
    description="Token counting: whitespace + BPE-ish regex tokenization",
    # Round-8 rotation (sixth): driver-green 7 consecutive rounds;
    # ceded its slot to the restored/promoted classes (class keeps an
    # exposed sibling — see BASELINE.md sixth-rotation table).
    driver_exposed=False,
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_bytes"),
    )


@register(
    "doc_fingerprints",
    oracle="""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
)
SELECT doc_id,
       md5(text)                                               AS content_md5,
       sha256(text)                                            AS content_sha256,
       md5(array_to_string(list_sort(list_distinct(w)), ' '))  AS bow_fingerprint
FROM toks
""",
    description="Document fingerprinting: content hash + order-insensitive bag-of-words hash",
    # Round-9 rotation (eighth): ceded after driver-green r2-r8 (scalar
    # functions stay evidenced via part_scalar_expressions and
    # multimodal_header_parse; fingerprint shapes via chunk/bow hashing
    # inside the exposed dedup entries).
    driver_exposed=False,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ws = words(F.col("text"))
    return t["documents"].select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("content_sha256"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(ws)), " ")).alias("bow_fingerprint"),
    )


@register(
    "top_tokens_by_docfreq",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT token, count(*) AS doc_freq
FROM tok
GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT 50
""",
    description="Inverted-index building block: top-50 tokens by document frequency (explode -> distinct -> partial-agg count -> top-k)",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def top_tokens_by_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The doc-frequency table every stopword/IDF computation needs: explode
    # is the only row-multiplying step, the distinct + count are partial-
    # aggregated map-side, and the top-k is TakeOrderedAndProject.
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "token")
        .limit(50)
    )


@register(
    "doc_ngrams_udtf",
    oracle="""
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(range(len(w) - 2),
                               i -> array_to_string(w[i+1:i+3], ' '))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT doc_id,
       count(*)             AS n_grams,
       count(DISTINCT gram) AS n_distinct_grams
FROM g
GROUP BY doc_id
""",
    description="Python UDTF surface: LATERAL table function emitting sliding word 3-grams, aggregated per doc (API demonstration — the hot-path shingling stays in codegen, see dedup.py)",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def doc_ngrams_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # Defined inline so the class cloudpickles by value — no package import
    # needed in the Python worker regardless of how the session launched.
    @udtf(returnType="pos int, gram string")
    class SlidingNGrams:
        def eval(self, text: str, n: int):
            ws = text.split(" ")
            for i in range(len(ws) - n + 1):
                yield i, " ".join(ws[i : i + n])

    spark.udtf.register("sliding_ngrams", SlidingNGrams)
    load_tables(spark, sf_dir)  # registers the documents temp view
    return spark.sql(
        """
        SELECT doc_id,
               count(*)             AS n_grams,
               count(DISTINCT gram) AS n_distinct_grams
        FROM documents, LATERAL sliding_ngrams(text, 3)
        GROUP BY doc_id
        """
    )


@register(
    "corpus_stats_by_source",
    oracle="""
SELECT source,
       lang,
       count(*)                       AS n_docs,
       sum(n_chars)::BIGINT           AS total_chars,
       avg(length(text))              AS avg_len,
       count(DISTINCT md5(text))      AS n_distinct_texts
FROM documents
GROUP BY source, lang
""",
    description="Corpus profiling: per-source/lang doc counts and size stats",
    # Round-6 rotation: slot ceded to the round-6 promotions
    # (driver-green in earlier rounds; still benched + pytest-
    # oracle-checked every session).
    driver_exposed=False,
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.avg(F.length("text")).alias("avg_len"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        )
    )


CHUNK_SIZE = 32
CHUNK_STEP = 24  # = CHUNK_SIZE - 8 token overlap between consecutive chunks


@register(
    "doc_token_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), starts AS (
  SELECT doc_id, tk, unnest(range(0, greatest(len(tk), 1), {CHUNK_STEP})) AS s
  FROM toks
)
SELECT doc_id,
       (s / {CHUNK_STEP})::BIGINT AS chunk_idx,
       array_to_string(list_slice(tk, s + 1, s + {CHUNK_SIZE}), ' ') AS chunk_text,
       least({CHUNK_SIZE}, len(tk) - s)::BIGINT AS n_tokens
FROM starts
""",
    description=(
        f"Document chunking: overlapping {CHUNK_SIZE}-token windows every "
        f"{CHUNK_STEP} tokens (8-token overlap) — the training-data "
        "pre-tokenization split, as JVM-side array expressions"
    ),
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into fixed-size overlapping token windows.

    Scale shape: one scan, zero shuffles, zero Python — split/sequence/
    posexplode/slice/array_join are all codegen'd column expressions, and
    output rows stay co-partitioned with their input split, so a
    downstream per-chunk tokenizer or embedder starts from a clean
    narrow dependency.
    """
    t = load_tables(spark, sf_dir)
    tk = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(tk) - 1, F.lit(0)), F.lit(CHUNK_STEP))
    return (
        t["documents"]
        .select("doc_id", tk.alias("tk"), F.posexplode(starts).alias("pos", "s"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_idx"),
            F.array_join(F.slice("tk", F.col("s") + 1, CHUNK_SIZE), " ").alias("chunk_text"),
            F.least(F.lit(CHUNK_SIZE), F.size("tk") - F.col("s")).cast("long").alias("n_tokens"),
        )
    )


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP_K = 20


def _cms_bucket_sql(expr: str, depth: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{depth}:' || {expr}), 1, 8)) AS UBIGINT) "
        f"% {CMS_WIDTH}"
    )


def _cms_bucket_spark(col, depth: int):
    h = F.md5(F.concat(F.lit(f"{depth}:"), col))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_WIDTH


@register(
    "token_heavy_hitters_cms",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (SELECT w, count(*) AS true_count FROM toks GROUP BY w),
cells AS (
  SELECT d, bucket, sum(cnt) AS cms_count FROM (
    SELECT tf.w, tf.true_count AS cnt, t.d,
           CASE {" ".join(f"WHEN t.d = {d} THEN {_cms_bucket_sql('tf.w', d)}" for d in range(CMS_DEPTH))} END AS bucket
    FROM tf CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) t
  ) GROUP BY d, bucket
),
top AS (
  SELECT w, true_count,
         row_number() OVER (ORDER BY true_count DESC, w) AS rk
  FROM tf
),
est AS (
  SELECT top.w, top.true_count, top.rk, min(c.cms_count)::BIGINT AS cms_estimate
  FROM top
  CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) t
  JOIN cells c ON c.d = t.d
   AND c.bucket = CASE {" ".join(f"WHEN t.d = {d} THEN {_cms_bucket_sql('top.w', d)}" for d in range(CMS_DEPTH))} END
  WHERE top.rk <= {CMS_TOP_K}
  GROUP BY top.w, top.true_count, top.rk
)
SELECT w AS token, true_count, cms_estimate, rk FROM est
""",
    description=(
        f"Heavy hitters via count-min sketch ({CMS_DEPTH}x{CMS_WIDTH}, "
        "md5-derived rows): fixed-memory frequency sketch built with "
        "partial aggregation; top tokens reported with true count AND "
        "sketch estimate — the sketch arithmetic itself is replayed "
        "exactly by the oracle (estimate >= truth by construction)"
    ),
    driver_exposed=False,
)
def token_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus tokens.

    The scale story: the sketch is CMS_DEPTH x CMS_WIDTH integer cells —
    fixed memory regardless of vocabulary size — built with one explode +
    map-side partial aggregation per depth row (the explode multiplies
    rows by CMS_DEPTH, but partial agg collapses them to <= DEPTH*WIDTH
    per task before the shuffle). Estimates touch only the top-k tokens
    and join the tiny broadcast sketch. All hashing is the engine's
    md5-based portable scheme, so the DuckDB oracle reproduces every
    cell and every estimate bit-for-bit.
    """
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(F.explode(words(F.col("text"))).alias("w"))
    tf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("true_count")).transform(ensure_cached)
    # sketch cells: per token, one (depth, bucket) pair per hash row
    cells = (
        tf.select(
            "true_count",
            F.posexplode(
                F.array(*[_cms_bucket_spark(F.col("w"), d) for d in range(CMS_DEPTH)])
            ).alias("d", "bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("true_count").alias("cms_count"))
    )
    wtop = Window.orderBy(F.desc("true_count"), F.asc("w"))
    top = (
        tf.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= CMS_TOP_K)
    )
    probes = top.select(
        "w",
        "true_count",
        "rk",
        F.posexplode(
            F.array(*[_cms_bucket_spark(F.col("w"), d) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("w", "true_count", "rk")
        .agg(F.min("cms_count").alias("cms_estimate"))
        .select(
            F.col("w").alias("token"), "true_count", "cms_estimate", "rk"
        )
    )


# ---------------------------------------------------------------------------
# PII redaction (round 5).
# ---------------------------------------------------------------------------

# RE2-compatible patterns (DuckDB) that Java's regex engine interprets
# identically: character classes, bounded repetition, no backrefs/lookarounds.
PII_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.]+\.[a-z]+"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


@register(
    "doc_pii_redaction",
    oracle=f"""
WITH seeded AS (
  -- the synthetic corpus carries no PII, so the entry seeds a
  -- deterministic email/phone per doc: the operator's effect is then
  -- observable and exactly checkable (redaction order: SSN before phone,
  -- since every SSN's first 8 chars also match the phone prefix shape)
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{PII_SSN_RE}', '<SSN>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g'),
         '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(
           regexp_replace(text, '{PII_SSN_RE}', '<SSN>', 'g'),
           '{PII_PHONE_RE}')) AS BIGINT) AS n_phones
FROM seeded
""",
    description=(
        "PII redaction: email/phone/SSN patterns replaced with typed "
        "sentinels (SSN before phone — overlapping shapes), with per-doc "
        "match counts; deterministic seeded PII makes the effect checkable"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-training scrub pass: structured identifiers out, text in.

    Scale shape: pure per-row JVM regex expressions over one corpus scan —
    no shuffle, no Python; whole-stage codegen end to end. Pattern subset
    chosen for engine-identical semantics (RE2 ∩ java.util.regex:
    character classes + bounded repetition, no backrefs/lookarounds).
    Redaction order matters and is pinned: SSN first, since an SSN's
    prefix also matches the phone shape.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    no_ssn = F.regexp_replace(F.col("text"), PII_SSN_RE, "<SSN>")
    return seeded.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(no_ssn, PII_PHONE_RE, "<PHONE>"),
            PII_EMAIL_RE,
            "<EMAIL>",
        ).alias("redacted"),
        F.size(F.expr(f"regexp_extract_all(text, '{PII_EMAIL_RE}', 0)"))
        .cast("long")
        .alias("n_emails"),
        F.size(
            F.expr(
                f"regexp_extract_all(regexp_replace(text, '{PII_SSN_RE}', '<SSN>'),"
                f" '{PII_PHONE_RE}', 0)"
            )
        )
        .cast("long")
        .alias("n_phones"),
    )


# --- sliding-window chunking (RAG/pretraining context windows) --------------

SLIDE_CHUNK_WORDS = 64
SLIDE_CHUNK_STRIDE = 32


@register(
    "sliding_window_chunks",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (
  SELECT doc_id, ws,
         unnest(range(0, greatest(length(ws), 1), {SLIDE_CHUNK_STRIDE})) AS start
  FROM w
)
SELECT doc_id,
       (start // {SLIDE_CHUNK_STRIDE})::BIGINT AS chunk_idx,
       start::BIGINT AS start_word,
       length(ws[start + 1 : least(start + {SLIDE_CHUNK_WORDS}, length(ws))])::BIGINT
         AS n_words,
       md5(array_to_string(
         ws[start + 1 : least(start + {SLIDE_CHUNK_WORDS}, length(ws))], ' '))
         AS chunk_hash
FROM s
""",
    description=(
        f"Sliding-window chunking: {SLIDE_CHUNK_WORDS}-word chunks every "
        f"{SLIDE_CHUNK_STRIDE} words (50% overlap) — the RAG/pretraining "
        "context-window cutter; chunks travel as md5 digests, not text"
    ),
    # Promoted in the round-7 (fifth) rotation: round-6 flagship
    # classes get driver-green evidence (VERDICT r6 item 2; BASELINE.md).
)
def sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunks per document.

    Scale shape: one projection — split once, generate the stride starts
    with `sequence`, explode, and slice per start; no join, no shuffle
    (the whole plan is scan→generate→project). Emitting the md5 digest
    instead of chunk text keeps the output (and any downstream exact-dedup
    join over it) digest-sized — the same discipline as chunk_exact_dedup.
    A short document still yields its single (possibly sub-width) chunk,
    and the tail chunk is truncated, never padded, so every source word
    lands in >= 1 and <= 2 chunks at 50% overlap.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(
            "doc_id", words(F.col("text")).alias("ws")
        )
        .select(
            "doc_id",
            "ws",
            F.explode(
                F.expr(
                    f"sequence(0, greatest(size(ws) - 1, 0), {SLIDE_CHUNK_STRIDE})"
                )
            ).alias("start"),
        )
        .selectExpr(
            "doc_id",
            f"CAST(start div {SLIDE_CHUNK_STRIDE} AS BIGINT) AS chunk_idx",
            "CAST(start AS BIGINT) AS start_word",
            f"CAST(size(slice(ws, start + 1, least({SLIDE_CHUNK_WORDS},"
            " size(ws) - start))) AS BIGINT) AS n_words",
            f"md5(concat_ws(' ', slice(ws, start + 1, least({SLIDE_CHUNK_WORDS},"
            " size(ws) - start)))) AS chunk_hash",
        )
    )


# --- deterministic pseudonymization (GDPR-grade key tokenization) -----------

PSEUDO_SALT = "pii-salt-v1"  # rotate the salt to rotate the token space


@register(
    "user_pseudonymization",
    oracle=f"""
WITH tok AS (
  SELECT user_id,
         substr(md5('{PSEUDO_SALT}:' || user_id::VARCHAR), 1, 16) AS user_token
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT t.user_token,
       CAST(count(*) AS BIGINT)        AS n_events,
       CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
       round(sum(e.value), 6)          AS total_value
FROM events e JOIN tok t USING (user_id)
GROUP BY t.user_token
""",
    description=(
        "Deterministic pseudonymization: user ids replaced by salted-md5 "
        "tokens (stable within a salt epoch, so joins/aggregations still "
        "line up; rotating the salt rotates the token space) with the "
        "per-token activity rollup proving referential integrity survives"
    ),
    driver_exposed=False,
    # Round-6 addition (post-escalation; sf0.1-parity-checked individually
    # — see BASELINE.md round-6 addendum).
)
def user_pseudonymization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy-pipeline primitive between raw ids and analysts:
    tokenize the entity key deterministically so every downstream
    join/groupBy works unchanged while the raw id never leaves the
    trust boundary. Token = salted md5 prefix — one projection, no
    shuffle beyond the rollup's own aggregate; the salt is the rotation
    lever (re-tokenize by changing one constant, the reversible-pseudonym
    escrow variant is a keyed lookup table instead). The rollup output
    exercises the property that matters: grouping by token equals
    grouping by raw id.
    """
    ev = load_tables(spark, sf_dir)["events"]
    tok = F.substring(
        F.md5(F.concat(F.lit(f"{PSEUDO_SALT}:"), F.col("user_id").cast("string"))),
        1,
        16,
    )
    return (
        ev.withColumn("user_token", tok)
        .groupBy("user_token")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf fit (round-10 session 3): how power-law the corpus vocabulary is.
# ---------------------------------------------------------------------------

ZIPF_HEAD = 1000  # fit over the frequency head — the power-law regime


@register(
    "token_zipf_fit",
    oracle=f"""
WITH freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, token) AS rnk FROM freq
)
SELECT CAST(count(*) AS BIGINT) AS n_tokens,
       round(regr_slope(ln(f), ln(rnk)), 6)     AS zipf_slope,
       round(regr_intercept(ln(f), ln(rnk)), 6) AS zipf_intercept,
       round(regr_r2(ln(f), ln(rnk)), 6)        AS fit_r2
FROM ranked WHERE rnk <= {ZIPF_HEAD}
""",
    description=(
        f"Zipf's-law fit of the corpus vocabulary: OLS slope/intercept/R² "
        f"of ln(frequency) on ln(rank) over the top-{ZIPF_HEAD} head — the "
        "one-number corpus-health check (natural text sits near slope -1; "
        "boilerplate or spam floods bend it)"
    ),
    driver_exposed=False,
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law diagnostic over the token frequency table.

    Scale shape: the explode→count is the only corpus-sized stage
    (map-side combined, output bounded by the vocabulary); the head is
    TakeOrderedAndProject (distributed top-k, never a global sort), and
    the rank window + regression run on the 1000-row head. The oracle
    ranks the FULL vocabulary, but both sides share the same total order
    (f DESC, token) so the head sets are identical.
    """
    t = load_tables(spark, sf_dir)
    freq = (
        t["documents"]
        .select(F.explode(words(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    head = freq.orderBy(F.desc("f"), "token").limit(ZIPF_HEAD)
    ranked = head.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("f"), F.asc("token")))
    )
    lf, lr = F.log(F.col("f")), F.log(F.col("rnk"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("fit_r2"),
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit (round-10 session 3): the re-identification
# risk readout a privacy review runs before a table leaves the pipeline —
# sibling of user_pseudonymization (which REDUCES the risk this MEASURES).
# ---------------------------------------------------------------------------

K_ANON_THRESHOLD = 5  # classes smaller than this are re-identifiable
L_DIV_THRESHOLD = 2  # classes with fewer distinct sensitive values leak


@register(
    "events_k_anonymity_audit",
    oracle=f"""
WITH classes AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(least(floor(value / 50.0), 9) AS BIGINT) AS vbin,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT user_id) AS BIGINT) AS l
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(count(*) AS BIGINT)  AS n_classes,
       CAST(sum(k) AS BIGINT)    AS n_rows,
       CAST(min(k) AS BIGINT)    AS min_k,
       CAST(sum(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
                                 AS rows_below_k,
       round(sum(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END)::DOUBLE
             / sum(k), 6)        AS k_risk_rate,
       CAST(sum(CASE WHEN l < {L_DIV_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
                                 AS classes_below_l
FROM classes GROUP BY event_type
""",
    description=(
        "k-anonymity / l-diversity audit over the (event_type, day, "
        "value-bucket) quasi-identifier: per-type equivalence-class "
        f"stats, rows in classes smaller than k={K_ANON_THRESHOLD} "
        f"(re-identifiable), and classes with fewer than "
        f"l={L_DIV_THRESHOLD} distinct users (attribute disclosure) — "
        "the privacy gate before a table leaves the pipeline"
    ),
    driver_exposed=False,
)
def events_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk as two nested aggregates.

    Scale shape: the scan collapses to the QI-class aggregate (map-side
    combined; class count bounded by the QI DOMAIN — types x days x 10
    bins — not the row count); the rollup runs on that tiny relation.
    The distinct-user count per class is the only expensive aggregate
    and it partial-aggregates too. All outputs are exact integers plus
    one guarded ratio.
    """
    ev = load_tables(spark, sf_dir)["events"]
    classes = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.least(F.floor(F.col("value") / 50.0), F.lit(9))
        .cast("long")
        .alias("vbin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("user_id").cast("long").alias("l"),
    )
    below_k = F.when(F.col("k") < K_ANON_THRESHOLD, F.col("k")).otherwise(
        F.lit(0)
    )
    return classes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("min_k"),
        F.sum(below_k).cast("long").alias("rows_below_k"),
        F.round(F.sum(below_k).cast("double") / F.sum("k"), 6).alias(
            "k_risk_rate"
        ),
        F.sum(
            (F.col("l") < L_DIV_THRESHOLD).cast("long")
        ).cast("long").alias("classes_below_l"),
    )


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (round-10 session 3): stopword-delimited
# phrases scored by the member words' degree/frequency ratio — the
# classic unsupervised keyword extractor, here as pure column algebra.
# ---------------------------------------------------------------------------

RAKE_STOPWORDS = ("the", "a")
RAKE_TOP_K = 20


@register(
    "doc_rake_keyphrases",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, t.pos, t.token,
         (t.token IN {RAKE_STOPWORDS!r}) AS is_stop
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
       LATERAL (SELECT UNNEST(generate_series(1, len(d.w))) AS pos,
                       UNNEST(d.w) AS token) t
),
marked AS (
  SELECT doc_id, pos, token, is_stop,
         count(*) FILTER (is_stop) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
  FROM tok
),
phrases AS (
  SELECT doc_id, phrase_id,
         string_agg(token, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS n_words
  FROM marked WHERE NOT is_stop
  GROUP BY doc_id, phrase_id
),
words AS (
  SELECT doc_id, phrase_id, UNNEST(string_split(phrase, ' ')) AS w,
         n_words
  FROM phrases
),
scores AS (
  SELECT w, sum(n_words)::DOUBLE / count(*) AS score FROM words GROUP BY w
),
phrase_scores AS (
  SELECT p.phrase, p.n_words, sum(s.score) AS raw
  FROM words wd
  JOIN scores s ON s.w = wd.w
  JOIN phrases p ON p.doc_id = wd.doc_id AND p.phrase_id = wd.phrase_id
  GROUP BY p.doc_id, p.phrase_id, p.phrase, p.n_words
)
SELECT phrase, n_words,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       round(avg(raw), 6) AS rake_score
FROM phrase_scores
GROUP BY phrase, n_words
ORDER BY rake_score DESC, phrase
LIMIT {RAKE_TOP_K}
""",
    description=(
        f"RAKE keyphrase extraction: stopword-delimited phrases scored "
        "by summed member-word degree/frequency with the corpus top-"
        f"{RAKE_TOP_K} reported — the unsupervised keyword extractor, "
        "as explode/window/aggregate column algebra (no Python)"
    ),
    driver_exposed=False,
)
def doc_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyphrases without a model.

    Scale shape: ONE explode of the corpus into (doc, pos, token); the
    phrase segmentation is a per-doc running count window (co-
    partitioned with the explode's shuffle); word statistics are two
    partial-agg'd aggregates over the phrase-member relation (bounded
    by the vocabulary for scores); the report is TakeOrderedAndProject.
    Degree uses each occurrence's own phrase length (classic RAKE), so
    every quantity is a count — the only floats are the final ratios.
    """
    t = load_tables(spark, sf_dir)
    tok = (
        t["documents"]
        .select("doc_id", F.posexplode(words(F.col("text"))).alias("pos", "token"))
        .withColumn("is_stop", F.col("token").isin(*RAKE_STOPWORDS))
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = tok.withColumn("phrase_id", F.sum(F.col("is_stop").cast("long")).over(w_run))
    members = marked.where(~F.col("is_stop"))
    phrases = ensure_cached(
        members.groupBy("doc_id", "phrase_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
    wrds = phrases.select(
        "doc_id",
        "phrase_id",
        "n_words",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    scores = wrds.groupBy("w").agg(
        (F.sum("n_words").cast("double") / F.count(F.lit(1))).alias("score")
    )
    phrase_scores = (
        wrds.join(F.broadcast(scores), "w")
        .groupBy("doc_id", "phrase_id", "n_words")
        .agg(F.sum("score").alias("raw"))
        .join(phrases, ["doc_id", "phrase_id", "n_words"])
    )
    return (
        phrase_scores.groupBy("phrase", "n_words")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.round(F.avg("raw"), 6).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(RAKE_TOP_K)
    )
