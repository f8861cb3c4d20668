"""Deduplication queries over ``documents`` [extension — not in reference].

Exact dedup, MinHash signatures + LSH-banded near-dup pairs, inverted-index
n-gram Jaccard pairs, and SimHash fingerprints + banded near-dup pairs
(SURVEY.md §2.4). Hashing follows operators/text.py — one md5 per word,
Horner-combined shingle hashes, 64 affine integer "permutations" — so the
DuckDB oracle reproduces every value bit-for-bit, *including the LSH
candidate sets*: the oracle runs the same banding, not an O(n²) stand-in.

Scale notes (100 TB posture):
- Exact dedup is a hash-groupBy on md5(text) — one shuffle on the digest,
  uniform by construction (no skew).
- The shingling hot path is: explode words → codegen'd md5 + int
  arithmetic → lead() window (one shuffle on doc_id) → 64 partial-agg
  min()/sum()s. The shuffle carries (doc_id, 64 ints) per doc regardless
  of document size. No per-row array construction anywhere.
- Candidate generation explodes 16 bands (resp. 4) per doc and equi-joins
  on (band_idx, band_hash); verification touches only candidate pairs.
- Inverted-index Jaccard joins docs on shared shingle hashes. Hot
  shingles are the skew risk at scale, so a stop-shingle cutoff drops any
  shingle appearing in > NGRAM_STOP_DF_FRAC of documents before the join
  (applied identically in the oracle SQL, so the check stays exact). The
  stop set is tiny by construction and broadcast for the anti-join; AQE
  skew-join splitting handles residual moderate skew.
- SimHash fingerprints are packed into two int64 words; hamming distance
  is two XOR+popcounts, banding is 4×16-bit substrings (pigeonhole: any
  pair with hamming ≤ 3 shares a band; hamming 4-8 pairs are best-effort
  — see operators/text.py for why wider recall loses at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators.text import (
    HORNER_C,
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_P,
    NUM_HASHES,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    hamming64,
    hash32,
    jaccard,
    minhash_agg_columns,
    minhash_band_hash_columns,
    minhash_coeffs,
    ngram_hash,
    ngram_hash_sql,
    simhash_pack_words,
    simhash_vote_columns,
    word_hash,
    words,
)
from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables
from iceberg_file_writer_spark.cache_util import ensure_cached

MINHASH_JACCARD_THRESHOLD = 0.8
NGRAM_JACCARD_THRESHOLD = 0.7
NGRAM_N = 4
# A shingle present in more than this fraction of all documents is a "stop
# shingle": it carries no dedup signal and is the quadratic-blowup key in
# the inverted-index join at 100 TB. Dropped before the join, identically
# in Spark and the oracle.
NGRAM_STOP_DF_FRAC = 0.5
SIMHASH_MAX_HAMMING = 8
_SIMHASH_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS

# --- shared DuckDB SQL fragment builders ------------------------------------

# (doc_id, pos, xw): one md5 per word, parallel-unnest zip for positions.
_WORDX_SQL = f"""
  SELECT doc_id,
         unnest(range(len(w))) AS pos,
         ('0x' || substr(md5(unnest(w)), 1, 8))::BIGINT % {MERSENNE_P} AS xw
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


def _shingle_x_sql(n: int) -> str:
    """(doc_id, x): Horner-combined n-gram hashes via lead() windows."""
    leads = ", ".join(
        f"lead(xw, {k}) OVER (PARTITION BY doc_id ORDER BY pos) AS x{k}"
        for k in range(1, n)
    )
    combined = ngram_hash_sql(["xw"] + [f"x{k}" for k in range(1, n)])
    return f"""
  SELECT doc_id, {combined} AS x
  FROM (SELECT doc_id, pos, xw, {leads} FROM wordx)
  WHERE x{n - 1} IS NOT NULL
"""


def _minhash_sql() -> str:
    """h0..h63 MIN aggregates over the shingle hashes."""
    mins = ",\n         ".join(
        f"min(({a} * x + {b}) % {MERSENNE_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(NUM_HASHES))
    )
    return f"""
  SELECT doc_id,
         {mins}
  FROM shingle_x
  GROUP BY doc_id
"""


_SIG_COLS = ", ".join(f"h{i}" for i in range(NUM_HASHES))


def _band_hash_sql(b: int) -> str:
    cols = ", ".join(f"h{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
    return f"md5(concat_ws(',', {cols}))"


_JACCARD_SQL = """
  len(list_filter(sa.s, v -> list_contains(sb.s, v)))::DOUBLE
    / (len(sa.s) + len(sb.s) - len(list_filter(sa.s, v -> list_contains(sb.s, v))))
"""

# SimHash vote columns s0..s63 via exploded ±1 sums over per-word chunks.
def _simhash_votes_sql() -> str:
    sums = ",\n         ".join(
        f"sum(((c{1 if i < 32 else 2} >> {i % 32}) & 1) * 2 - 1) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    return f"""
  SELECT doc_id,
         {sums}
  FROM (SELECT doc_id,
               ('0x' || substr(md5(w), 1, 8))::BIGINT AS c1,
               ('0x' || substr(md5(w), 9, 8))::BIGINT AS c2
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents))
  GROUP BY doc_id
"""


def _simhash_packed_sql() -> str:
    bit = lambda i: f"(CASE WHEN s{i} > 0 THEN 1 ELSE 0 END)"  # noqa: E731
    w1 = " + ".join(f"{bit(i)}::BIGINT * {1 << i}" for i in range(32))
    w2 = " + ".join(f"{bit(32 + i)}::BIGINT * {1 << i}" for i in range(32))
    fp = " || ".join(f"{bit(i)}::VARCHAR" for i in range(SIMHASH_BITS))
    return f"""
  SELECT doc_id, {w1} AS w1, {w2} AS w2, {fp} AS fingerprint
  FROM votes
"""


# --- Spark-side shared builders ----------------------------------------------


def shingle_x_from_docs(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, x): hashed word n-grams — explode + one md5/word + lead().
    Takes any (doc_id, text) relation, so a streaming micro-batch can
    shingle exactly like the batch table."""
    wx = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w")
    ).select("doc_id", "pos", word_hash(F.col("w")).alias("xw"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("xw", k).over(win).alias(f"x{k}") for k in range(1, n)]
    comb = wx.select("doc_id", "xw", *leads)
    combined = ngram_hash([F.col("xw")] + [F.col(f"x{k}") for k in range(1, n)])
    return comb.where(F.col(f"x{n - 1}").isNotNull()).select(
        "doc_id", combined.alias("x")
    )


def _shingle_x_df(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    return shingle_x_from_docs(load_tables(spark, sf_dir)["documents"], n)


def minhash_sig_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h63) via 64 partial-agg mins over shingle hashes."""
    return shingle_x_from_docs(docs, 3).groupBy("doc_id").agg(
        *minhash_agg_columns("x")
    )


def _minhash_sig_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_sig_from_docs(load_tables(spark, sf_dir)["documents"])


@register(
    "minhash_signatures",
    oracle=f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(3)}),
sigs AS ({_minhash_sql()})
SELECT doc_id, concat_ws(',', {_SIG_COLS}) AS signature
FROM sigs
""",
    description=f"MinHash: {NUM_HASHES}-permutation affine signature per document",
    # Signature values are re-verified inside minhash_lsh_near_duplicates'
    # oracle (same CTEs); kept off the capped driver surface.
    driver_exposed=False,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    mh = _minhash_sig_df(spark, sf_dir)
    return mh.select(
        "doc_id", F.concat_ws(",", *[f"h{i}" for i in range(NUM_HASHES)]).alias("signature")
    )


@register(
    "exact_dedup_documents",
    oracle="""
SELECT md5(text)    AS content_hash,
       min(doc_id)  AS keeper_doc_id,
       count(*)     AS n_copies
FROM documents
GROUP BY md5(text)
""",
    description="Exact dedup: hash-groupBy on content digest, keep min doc_id",
    # Round-9 rotation (eighth): ceded after driver-green r1-r8 (the
    # longest-tenured row; exact-dedup stays evidenced via the exposed
    # chunk_exact_dedup) to make room for the storage-lifecycle entries.
    driver_exposed=False,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# The full CTE chain producing the verified near-dup pair relation
# `pairs(doc_a, doc_b, jaccard_sim)` — shared by the pair query and the
# connected-components canonicalization oracle.
_MINHASH_PAIRS_CTES = f"""wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(3)}),
sigs AS ({_minhash_sql()}),
bands AS (
  SELECT doc_id, unnest(range({LSH_BANDS})) AS band_idx,
         unnest([{", ".join(_band_hash_sql(b) for b in range(LSH_BANDS))}]) AS band_hash
  FROM sigs
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list(DISTINCT x) AS s FROM shingle_x GROUP BY doc_id),
pairs AS (
  SELECT c.doc_a, c.doc_b, {_JACCARD_SQL} AS jaccard_sim
  FROM candidates c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b
  WHERE {_JACCARD_SQL} >= {MINHASH_JACCARD_THRESHOLD}
)"""


def _minhash_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (doc_a < doc_b, exact Jaccard >= threshold)
    via banded-LSH candidates — the Spark dual of _MINHASH_PAIRS_CTES."""
    # Materialization boundary: the signature and shingle-set tables are
    # each read by BOTH sides of the candidate self-join, and Spark plans
    # the full shingling pipeline once per branch (no exchange reuse across
    # self-join aliases — measured 4 scans). cache() pins one computation;
    # the cached artifact is per-doc (64 ints / the distinct-shingle set),
    # orders smaller than the corpus. At 100 TB this is the stage you
    # persist to a signatures table instead (measured 1.6x on this query).
    mh = _minhash_sig_df(spark, sf_dir).transform(ensure_cached)
    band_arr = F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])
    bands = mh.select("doc_id", *minhash_band_hash_columns()).select(
        "doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = (
        _shingle_x_df(spark, sf_dir, 3)
        .groupBy("doc_id")
        .agg(F.collect_set("x").alias("s"))
        .transform(ensure_cached)
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jaccard(F.col("sa"), F.col("sb")).alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= MINHASH_JACCARD_THRESHOLD)
    )


@register(
    "minhash_lsh_near_duplicates",
    oracle=f"""
WITH {_MINHASH_PAIRS_CTES}
SELECT doc_a, doc_b, jaccard_sim FROM pairs
""",
    description=f"MinHash+LSH near-dup: {LSH_BANDS}x{LSH_ROWS} banding, exact-Jaccard verify ≥ {MINHASH_JACCARD_THRESHOLD}",
    # Round-7 rotation (fifth): driver-green 5-6 consecutive rounds; ceded
    # its slot to the round-6 flagship promotions + persisted-ANN probes
    # (class keeps an exposed sibling — see BASELINE.md rotation table).
    driver_exposed=False,
)
def minhash_lsh_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs_df(spark, sf_dir)


@register(
    "neardup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_MINHASH_PAIRS_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src AS doc, src AS r FROM edges
  UNION
  SELECT src AS doc, dst AS r FROM edges
  UNION
  SELECT re.doc, e.dst AS r
  FROM reach re JOIN edges e ON e.src = re.r
),
canon AS (
  SELECT doc AS doc_id, min(r) AS canonical_doc_id
  FROM reach GROUP BY doc
)
SELECT doc_id, canonical_doc_id,
       count(*) OVER (PARTITION BY canonical_doc_id) AS cluster_size
FROM canon
""",
    description=(
        "Dedup endgame: connected components over the verified near-dup "
        "pair graph — every clustered document mapped to its cluster's "
        "canonical (minimum) doc_id, with cluster sizes. Iterative "
        "min-label propagation to fixpoint; the oracle replays the "
        "closure with a recursive CTE"
    ),
    eager=True,  # builds/loads a trained artifact or runs a stream at plan time
)
def neardup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over near-duplicate pairs.

    Pairwise near-dup output is not yet a dedup decision: duplicates
    chain (A~B, B~C but not A~C), so keep/remove choices per pair can
    contradict. The fix is the transitive closure — one canonical doc per
    component.

    Algorithm: Pregel-style min-label propagation, the standard
    distributed CC (GraphX/GraphFrames use the same skeleton). Each
    round sends every node's current label along edges and takes the min
    of (own label, incoming labels) — one shuffle join + one partial-agg
    per round, state is (node, label) only. Rounds needed = component
    diameter, which for near-dup clusters is small (duplicate families
    chain shallowly); the loop still runs to a *checked fixpoint* (an
    aggregate per round, same driver-side cost class as count()), so the
    result is the exact closure regardless of diameter, deterministic
    under any partitioning — which is what lets the DuckDB recursive CTE
    replay it exactly. At 100 TB the edge relation (near-dup pairs) is
    orders smaller than the corpus, so the per-round joins are cheap
    relative to pair generation; for adversarially deep graphs the
    large-star/small-star variant halves round count — seam documented
    here, the emitted mapping is identical.
    """
    # The fixpoint itself lives in operators/graph.py::connected_components
    # (extracted round 5 so fuzzy-match entity clustering reuses the same
    # audited iteration); it caches the pair relation — the symmetrized
    # edge union reads it twice, and without the pin each branch replays
    # the LSH candidate join + Jaccard verify.
    from iceberg_file_writer_spark.operators.graph import connected_components

    pairs = _minhash_pairs_df(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs, "doc_a", "doc_b")
    wsz = Window.partitionBy("canonical_doc_id")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_doc_id")
    ).withColumn("cluster_size", F.count(F.lit(1)).over(wsz))


def _stop_filtered_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, gram) postings with the stop-shingle cutoff
    applied — the shared operand of the Jaccard and containment pair
    entries.

    cache() at the distinct-gram table: the stop-shingle docfreq pass
    added a 4th consumer (stop agg + sizes + both self-join sides), and
    without the cache Spark plans the full shingling pipeline once per
    branch (12 parquet scans, no exchange reuse — measured round 3).
    Round-1's "caching is 2.4x slower" predates the docfreq pass; the
    round-3 same-session A/B reads cached 2.20s vs uncached 2.43s at
    sf0.1. (A Window.partitionBy(x) docfreq measured faster still, 1.64s,
    but is NOT 100 TB-safe: it shuffles every posting of a hot stop
    shingle to one task before the filter — the groupBy here partial-
    aggregates map-side, so the hot key never ships its postings.)

    Stop-shingle cutoff: the stop set (shingles in > NGRAM_STOP_DF_FRAC of
    docs) is at most 1/frac entries per distinct text pattern — tiny — so
    the anti-join is a broadcast, not a shuffle.
    """
    all_grams = _shingle_x_df(spark, sf_dir, NGRAM_N).distinct().transform(ensure_cached)
    n_docs = load_tables(spark, sf_dir)["documents"].agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    stop = (
        all_grams.groupBy("x")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") > F.col("n_docs") * NGRAM_STOP_DF_FRAC)
        .select("x")
    )
    return all_grams.join(F.broadcast(stop), "x", "left_anti")


@register(
    "ngram_jaccard_near_duplicates",
    oracle=f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(NGRAM_N)}),
all_grams AS (SELECT DISTINCT doc_id, x FROM shingle_x),
stop AS (
  SELECT x FROM all_grams GROUP BY x
  HAVING count(*) > (SELECT count(*) FROM documents) * {NGRAM_STOP_DF_FRAC}
),
grams AS (SELECT g.doc_id, g.x FROM all_grams g ANTI JOIN stop s ON g.x = s.x),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM grams a JOIN grams b ON a.x = b.x AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       i.n_shared::DOUBLE / (za.sz + zb.sz - i.n_shared) AS jaccard_sim
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE i.n_shared::DOUBLE / (za.sz + zb.sz - i.n_shared) >= {NGRAM_JACCARD_THRESHOLD}
""",
    description=f"n-gram Jaccard near-dup via inverted-index join, ≥ {NGRAM_JACCARD_THRESHOLD}",
    # Round-5 rotation: slot ceded to incremental_neardup_new_vs_corpus
    # (driver-green r1-r4 here; still benched + pytest-oracle-checked
    # every session).
    driver_exposed=False,
)
def ngram_jaccard_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _stop_filtered_grams(spark, sf_dir)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.x") == F.col("b.x")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_shared"))
            ).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= NGRAM_JACCARD_THRESHOLD)
    )


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, fingerprint) via explode → 64 partial-agg ±1 sums."""
    t = load_tables(spark, sf_dir)
    ex = (
        t["documents"]
        .select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .select(
            "doc_id",
            hash32(F.col("w")).alias("c1"),
            hash32(F.col("w"), offset=8).alias("c2"),
        )
    )
    votes = ex.groupBy("doc_id").agg(*simhash_vote_columns())
    return votes.select("doc_id", *simhash_pack_words())


@register(
    "simhash_fingerprints",
    oracle=f"""
WITH votes AS ({_simhash_votes_sql()}),
packed AS ({_simhash_packed_sql()})
SELECT doc_id, fingerprint FROM packed
""",
    description=f"SimHash: {SIMHASH_BITS}-bit md5-vote fingerprint per document",
    # Fingerprint values are re-verified inside simhash_near_duplicates'
    # oracle (same CTEs); kept off the capped driver surface.
    driver_exposed=False,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_df(spark, sf_dir).select("doc_id", "fingerprint")


@register(
    "simhash_near_duplicates",
    oracle=f"""
WITH votes AS ({_simhash_votes_sql()}),
packed AS ({_simhash_packed_sql()}),
bands AS (
  SELECT doc_id, w1, w2,
         unnest(range({SIMHASH_BANDS})) AS band_idx,
         unnest([{", ".join(f"substr(fingerprint, {b * _SIMHASH_BAND_WIDTH + 1}, {_SIMHASH_BAND_WIDTH})" for b in range(SIMHASH_BANDS))}]) AS band_key
  FROM packed
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       (bit_count(xor(pa.w1, pb.w1)) + bit_count(xor(pa.w2, pb.w2)))::INT AS hamming
FROM candidates c
JOIN packed pa ON pa.doc_id = c.doc_a
JOIN packed pb ON pb.doc_id = c.doc_b
WHERE bit_count(xor(pa.w1, pb.w1)) + bit_count(xor(pa.w2, pb.w2)) <= {SIMHASH_MAX_HAMMING}
""",
    description=f"SimHash near-dup: {SIMHASH_BANDS}-band candidates, hamming ≤ {SIMHASH_MAX_HAMMING} (recall guaranteed ≤ 3, best-effort above)",
    # Round-5 rotation: driver-green r1-r4; ceded its slot to the round-5
    # search/filter/centrality entries. The LSH near-dup class stays
    # driver-exposed via minhash_lsh_near_duplicates; this entry remains
    # benched and pytest-oracle-checked.
    driver_exposed=False,
)
def simhash_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cache(): the packed fingerprints feed the band explode and both
    # verify-join sides — three consumers of one vote pipeline (see
    # minhash_lsh note).
    sim = _simhash_df(spark, sf_dir).transform(ensure_cached)
    band_arr = F.array(
        *[
            F.substring("fingerprint", b * _SIMHASH_BAND_WIDTH + 1, _SIMHASH_BAND_WIDTH)
            for b in range(SIMHASH_BANDS)
        ]
    )
    bands = sim.select(
        "doc_id", "w1", "w2", F.posexplode(band_arr).alias("band_idx", "band_key")
    )
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pa = sim.select(F.col("doc_id").alias("doc_a"), F.col("w1").alias("w1a"), F.col("w2").alias("w2a"))
    pb = sim.select(F.col("doc_id").alias("doc_b"), F.col("w1").alias("w1b"), F.col("w2").alias("w2b"))
    return (
        cands.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming64(F.col("w1a"), F.col("w2a"), F.col("w1b"), F.col("w2b")).alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


# --- incremental near-dup: new batch vs existing corpus --------------------

NEW_BATCH_SPLIT = 400  # doc_id >= 400 plays the freshly-ingested shard

# Shared with the streaming ingest-gate entry (queries/streaming_ops.py),
# whose run-to-completion result equals this batch probe exactly.
INCREMENTAL_NEARDUP_ORACLE = f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(3)}),
sigs AS ({_minhash_sql()}),
bands AS (
  SELECT doc_id, unnest(range({LSH_BANDS})) AS band_idx,
         unnest([{", ".join(_band_hash_sql(b) for b in range(LSH_BANDS))}]) AS band_hash
  FROM sigs
),
candidates AS (
  SELECT DISTINCT n.doc_id AS new_doc_id, o.doc_id AS corpus_doc_id
  FROM bands n JOIN bands o
    ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
  WHERE n.doc_id >= {NEW_BATCH_SPLIT} AND o.doc_id < {NEW_BATCH_SPLIT}
),
sets AS (SELECT doc_id, list(DISTINCT x) AS s FROM shingle_x GROUP BY doc_id),
pairs AS (
  SELECT c.new_doc_id, c.corpus_doc_id, {_JACCARD_SQL} AS jaccard_sim
  FROM candidates c
  JOIN sets sa ON sa.doc_id = c.new_doc_id
  JOIN sets sb ON sb.doc_id = c.corpus_doc_id
  WHERE {_JACCARD_SQL} >= {MINHASH_JACCARD_THRESHOLD}
)
SELECT new_doc_id, corpus_doc_id, jaccard_sim FROM pairs
"""


@register(
    "incremental_neardup_new_vs_corpus",
    oracle=INCREMENTAL_NEARDUP_ORACLE,
    description=(
        f"Incremental near-dup: the freshly-ingested shard (doc_id >= "
        f"{NEW_BATCH_SPLIT}) LSH-matched against the existing corpus only "
        "(no new-new or corpus-corpus pairs) — the per-ingest dedup gate "
        "of a continuously-growing corpus; new-side bands broadcast"
    ),
    # Round-5 rotation: promoted to the driver surface;
    # ngram_jaccard_near_duplicates (driver-green r1-r4; the near-dup class
    # keeps minhash_lsh + simhash driver slots) ceded its slot.
)
def incremental_neardup_new_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming shard against the corpus without an all-pairs pass.

    The steady-state curation loop never re-runs full-corpus dedup: each
    ingest batch is checked against the standing index. Shape: the new
    shard's band hashes are a batch-sized relation — *broadcast* against
    the corpus band postings (plan-gated), so the corpus side is one scan
    with no shuffle for the candidate join; exact-Jaccard verification
    then touches only candidate pairs, asymmetric (new side small) by
    construction. At 100 TB the corpus bands live as a bucketed postings
    table (the signatures-table seam documented on _minhash_pairs_df) and
    this query is the incremental probe against it.
    """
    mh = _minhash_sig_df(spark, sf_dir).transform(ensure_cached)
    band_arr = F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])
    bands = mh.select("doc_id", *minhash_band_hash_columns()).select(
        "doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
    new_bands = bands.where(F.col("doc_id") >= NEW_BATCH_SPLIT).select(
        F.col("doc_id").alias("new_doc_id"), "band_idx", "band_hash"
    )
    corpus_bands = bands.where(F.col("doc_id") < NEW_BATCH_SPLIT).select(
        F.col("doc_id").alias("corpus_doc_id"), "band_idx", "band_hash"
    )
    cands = (
        corpus_bands.join(F.broadcast(new_bands), ["band_idx", "band_hash"])
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    sets = (
        _shingle_x_df(spark, sf_dir, 3)
        .groupBy("doc_id")
        .agg(F.collect_set("x").alias("s"))
        .transform(ensure_cached)
    )
    sa = sets.select(F.col("doc_id").alias("new_doc_id"), F.col("s").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("corpus_doc_id"), F.col("s").alias("sb"))
    return (
        cands.join(sa, "new_doc_id")
        .join(sb, "corpus_doc_id")
        .select(
            "new_doc_id",
            "corpus_doc_id",
            jaccard(F.col("sa"), F.col("sb")).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= MINHASH_JACCARD_THRESHOLD)
    )


@register(
    "minhash_estimator_error",
    oracle=f"""
WITH {_MINHASH_PAIRS_CTES}
SELECT p.doc_a, p.doc_b,
       round(p.jaccard_sim, 6) AS jaccard_sim,
       ({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES))})::BIGINT
         AS matching_components,
       ((1000 * ({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES))}))
        // {NUM_HASHES})::BIGINT AS estimate_permille,
       abs(((1000 * ({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES))}))
            // {NUM_HASHES}) - CAST(floor(1000 * p.jaccard_sim) AS BIGINT))::BIGINT
         AS abs_error_permille
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
""",
    description=(
        f"MinHash estimator quality: per verified near-dup pair, the "
        f"{NUM_HASHES}-component signature-agreement estimate vs the exact "
        "Jaccard, with the absolute error in exact integer permille"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the sketch deliver its promised accuracy.

    The evaluation-family readout for MinHash itself: E[agreement
    fraction] = true Jaccard, with std ≈ sqrt(J(1-J)/k) ≈ 0.06 at k=64 —
    this operator measures the realized per-pair error so a signature-
    width decision (k vs error vs storage) is made from data, not the
    formula alone. The pair relation and both signature reads come from
    the same cached artifacts the dedup pipeline already materializes;
    the comparison is a 64-term codegen'd CASE sum on pair-sized rows.
    """
    pairs = _minhash_pairs_df(spark, sf_dir)
    sig = _minhash_sig_df(spark, sf_dir)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    est = F.floor((F.lit(1000) * F.col("matching_components")) / NUM_HASHES).cast(
        "long"
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("matching_components", matches.cast("long"))
        .select(
            "doc_a",
            "doc_b",
            F.round("jaccard_sim", 6).alias("jaccard_sim"),
            "matching_components",
            est.alias("estimate_permille"),
            F.abs(
                est - F.floor(F.lit(1000) * F.col("jaccard_sim")).cast("long")
            )
            .cast("long")
            .alias("abs_error_permille"),
        )
    )


_PI = "3.141592653589793"  # shared literal so both engines run identical arithmetic


@register(
    "simhash_estimator_error",
    oracle=f"""
WITH votes AS ({_simhash_votes_sql()}),
packed AS ({_simhash_packed_sql()}),
bands AS (
  SELECT doc_id, w1, w2,
         unnest(range({SIMHASH_BANDS})) AS band_idx,
         unnest([{", ".join(f"substr(fingerprint, {b * _SIMHASH_BAND_WIDTH + 1}, {_SIMHASH_BAND_WIDTH})" for b in range(SIMHASH_BANDS))}]) AS band_key
  FROM packed
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
spairs AS (
  SELECT c.doc_a, c.doc_b,
         (bit_count(xor(pa.w1, pb.w1)) + bit_count(xor(pa.w2, pb.w2)))::BIGINT AS hamming
  FROM candidates c
  JOIN packed pa ON pa.doc_id = c.doc_a
  JOIN packed pb ON pb.doc_id = c.doc_b
  WHERE bit_count(xor(pa.w1, pb.w1)) + bit_count(xor(pa.w2, pb.w2)) <= {SIMHASH_MAX_HAMMING}
),
wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(3)}),
sets AS (SELECT doc_id, count(DISTINCT x) AS sz FROM shingle_x GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, p.hamming, count(*) AS n_shared
  FROM spairs p
  JOIN (SELECT DISTINCT doc_id, x FROM shingle_x) ga ON ga.doc_id = p.doc_a
  JOIN (SELECT DISTINCT doc_id, x FROM shingle_x) gb
    ON gb.doc_id = p.doc_b AND gb.x = ga.x
  GROUP BY p.doc_a, p.doc_b, p.hamming
)
SELECT i.doc_a, i.doc_b, i.hamming,
       round(cos({_PI} * i.hamming / {SIMHASH_BITS}), 6) AS est_cosine,
       round(i.n_shared / sqrt(sa.sz * sb.sz), 6)        AS exact_cosine,
       round(abs(round(cos({_PI} * i.hamming / {SIMHASH_BITS}), 6)
                 - round(i.n_shared / sqrt(sa.sz * sb.sz), 6)), 6) AS abs_error
FROM inter i
JOIN sets sa ON sa.doc_id = i.doc_a
JOIN sets sb ON sb.doc_id = i.doc_b
""",
    description=(
        f"SimHash selection-bias audit: hamming-implied similarity "
        f"cos(pi*h/{SIMHASH_BITS}) of banded CANDIDATES vs their exact "
        "binary shingle cosine — quantifies why exact verification after "
        "candidate generation is mandatory"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def simhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why candidate verification is mandatory, quantified.

    SimHash's contract is P(bit differs) = theta/pi, so hamming h
    implies angular similarity cos(pi*h/BITS); this operator measures
    that implied similarity against the exact binary cosine of the same
    shingle sets — ON THE BANDED CANDIDATES. The measured mean error is
    large (~0.55 at test SFs): conditioning on a small hamming selects
    exactly the pairs whose 64-bit sketch got lucky across n² trials,
    so the implied similarity of *candidates* is systematically
    optimistic (LSH selection bias), even though the estimator is
    unbiased over random pairs. That gap is the empirical justification
    for the exact-verify stage every near-dup pipeline in this engine
    runs after candidate generation — here made a monitored number.
    Pair relation and shingle sets come from the already-cached dedup
    artifacts; the exact cosine is one candidate-only inverted join.
    """
    sim = _simhash_df(spark, sf_dir).transform(ensure_cached)
    band_arr = F.array(
        *[
            F.substring(
                "fingerprint", b * _SIMHASH_BAND_WIDTH + 1, _SIMHASH_BAND_WIDTH
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    bands = sim.select(
        "doc_id", "w1", "w2", F.posexplode(band_arr).alias("band_idx", "band_key")
    )
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    pa = sim.selectExpr("doc_id AS doc_a", "w1 AS a1", "w2 AS a2")
    pb = sim.selectExpr("doc_id AS doc_b", "w1 AS b1", "w2 AS b2")
    spairs = (
        cands.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming64(
                F.col("a1"), F.col("a2"), F.col("b1"), F.col("b2")
            )
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
    grams = _shingle_x_df(spark, sf_dir, 3).distinct().transform(ensure_cached)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = grams.selectExpr("doc_id AS doc_a", "x")
    gb = grams.selectExpr("doc_id AS doc_b", "x")
    inter = (
        spairs.join(ga, "doc_a")
        .join(gb, ["doc_b", "x"])
        .groupBy("doc_a", "doc_b", "hamming")
        .agg(F.count("*").alias("n_shared"))
    )
    est = F.round(
        F.cos(F.lit(float(_PI)) * F.col("hamming") / SIMHASH_BITS), 6
    )
    exact = F.round(
        F.col("n_shared") / F.sqrt(F.col("sz_a") * F.col("sz_b")), 6
    )
    return (
        inter.join(sizes.selectExpr("doc_id AS doc_a", "sz AS sz_a"), "doc_a")
        .join(sizes.selectExpr("doc_id AS doc_b", "sz AS sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            est.alias("est_cosine"),
            exact.alias("exact_cosine"),
            F.round(F.abs(est - exact), 6).alias("abs_error"),
        )
    )


# --- prefix-filtering set-similarity join (AllPairs/PPJoin family) ----------

PREFIX_JACCARD_T = 0.7  # as a ratio; prefix length uses the exact integer form


@register(
    "prefix_filter_jaccard_pairs",
    oracle=f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(NGRAM_N)}),
grams AS (SELECT DISTINCT doc_id, x FROM shingle_x),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM grams a JOIN grams b ON a.x = b.x AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       i.n_shared::DOUBLE / (za.sz + zb.sz - i.n_shared) AS jaccard_sim
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE i.n_shared::DOUBLE / (za.sz + zb.sz - i.n_shared) >= {PREFIX_JACCARD_T}
""",
    description=(
        f"Prefix-filtering set-similarity join (AllPairs/PPJoin family): "
        f"each doc exposes only its |d| - ceil(t*|d|) + 1 globally-rarest "
        f"{NGRAM_N}-shingles as join keys; pairs sharing a prefix shingle "
        f"are exact-Jaccard verified at t >= {PREFIX_JACCARD_T}. The "
        "oracle is the FULL inverted-index join — equality proves the "
        "pruning loses no qualifying pair (prefix completeness), the "
        "guarantee banding-based LSH can only approximate"
    ),
    # Promoted in the round-7 (fifth) rotation: round-6 flagship
    # classes get driver-green evidence (VERDICT r6 item 2; BASELINE.md).
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact threshold-Jaccard pairs via prefix filtering.

    The second exact candidate-pruning technique in the dedup family
    (beside the stop-shingle cutoff) and the standard one for set-
    similarity joins: order every doc's shingles by global rarity
    (ascending df, then x) and join ONLY on each doc's first
    |d| - ceil(t·|d|) + 1 shingles — by pigeonhole, two sets with
    Jaccard >= t must share one of these prefix tokens, so pruning is
    lossless while the join posting lists shrink to the rare tail of
    the vocabulary (the hot shingles that explode the full join are
    exactly the ones prefix filtering never joins on). Prefix length
    uses the exact integer form (7·sz + 9) div 10 = ceil(0.7·sz), no
    float boundary. Verification joins only candidate pairs' gram sets
    (candidate-sized work), computing the same rounded-division Jaccard
    as the brute-force oracle.

    Scale shape: one corpus shingling pass (cached: df aggregate, rank
    window, and verify sides share it), a doc-partitioned rank window,
    and equi-joins on rare shingles — no all-pairs anywhere.
    """
    grams = _shingle_x_df(spark, sf_dir, NGRAM_N).distinct().transform(ensure_cached)
    dfr = grams.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    wr = Window.partitionBy("doc_id").orderBy("df", "x")
    # Pin the prefix relation: BOTH sides of the candidate self-join read
    # it, and broadcast self-joins share no exchange — un-pinned, the
    # docfreq aggregate, rank window and size join all ran TWICE (r14;
    # the r13 disposition's "reuses exchange" claim was wrong, the plan
    # showed two Window+join subtrees). The pin is prefix-sized (~30% of
    # the posting relation — the same signatures-table boundary the
    # minhash pipeline persists at 100 TB).
    prefix = ensure_cached(
        grams.join(dfr, "x")
        .withColumn("r", F.row_number().over(wr))
        .join(sizes, "doc_id")
        .where(F.col("r") <= F.col("sz") - F.expr("CAST((7 * sz + 9) div 10 AS INT)") + 1)
        .select("doc_id", "x")
    )
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.x") == F.col("b.x")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("x").alias("xa"))
    gb = grams.select(F.col("doc_id").alias("gb_doc"), F.col("x").alias("xb"))
    inter = (
        cands.join(ga, "doc_a")
        .join(gb, (F.col("doc_b") == F.col("gb_doc")) & (F.col("xa") == F.col("xb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_shared"))
            ).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= PREFIX_JACCARD_T)
    )


NGRAM_CONTAINMENT_THRESHOLD = 0.9


@register(
    "ngram_containment_pairs",
    oracle=f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(NGRAM_N)}),
all_grams AS (SELECT DISTINCT doc_id, x FROM shingle_x),
stop AS (
  SELECT x FROM all_grams GROUP BY x
  HAVING count(*) > (SELECT count(*) FROM documents) * {NGRAM_STOP_DF_FRAC}
),
grams AS (SELECT g.doc_id, g.x FROM all_grams g ANTI JOIN stop s ON g.x = s.x),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM grams a JOIN grams b ON a.x = b.x AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
directed AS (
  SELECT i.doc_a AS contained_doc, i.doc_b AS container_doc,
         i.n_shared, round(i.n_shared::DOUBLE / za.sz, 6) AS containment
  FROM inter i JOIN sizes za ON za.doc_id = i.doc_a
  UNION ALL
  SELECT i.doc_b, i.doc_a,
         i.n_shared, round(i.n_shared::DOUBLE / zb.sz, 6)
  FROM inter i JOIN sizes zb ON zb.doc_id = i.doc_b
)
SELECT contained_doc, container_doc, CAST(n_shared AS BIGINT) AS n_shared,
       containment
FROM directed WHERE containment >= {NGRAM_CONTAINMENT_THRESHOLD}
""",
    description=(
        "n-gram CONTAINMENT pairs (asymmetric near-dup): directional "
        f"|A∩B|/|A| ≥ {NGRAM_CONTAINMENT_THRESHOLD} over stop-filtered "
        f"{NGRAM_N}-gram sets — catches a short document swallowed by a "
        "long one (quotes, excerpts, page-in-page), which symmetric "
        "Jaccard misses because the union is dominated by the longer side"
    ),
    driver_exposed=False,
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The subset-detection half of near-dup curation.

    A 200-word quote inside a 5,000-word page has Jaccard ~0.04 and
    containment ~1.0: threshold-Jaccard dedup never sees it. Containment
    is the right signal for excerpt/quote/boilerplate-page relations,
    and the index shape is identical to the Jaccard entry — the shared
    stop-filtered posting relation (cached), one inverted-index
    self-join producing each unordered pair ONCE, then both directions
    derived from the same (n_shared, size) row via a union of two
    size-relation joins (pair-sized, not posting-sized). Same skew
    armor: stop-shingle cutoff + AQE."""
    grams = _stop_filtered_grams(spark, sf_dir)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.x") == F.col("b.x"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    both = inter.join(za, "doc_a").join(zb, "doc_b")
    directed = both.select(
        F.col("doc_a").alias("contained_doc"),
        F.col("doc_b").alias("container_doc"),
        "n_shared",
        F.round(F.col("n_shared").cast("double") / F.col("sz_a"), 6).alias(
            "containment"
        ),
    ).unionByName(
        both.select(
            F.col("doc_b").alias("contained_doc"),
            F.col("doc_a").alias("container_doc"),
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.col("sz_b"), 6
            ).alias("containment"),
        )
    )
    return directed.where(
        F.col("containment") >= NGRAM_CONTAINMENT_THRESHOLD
    ).select(
        "contained_doc",
        "container_doc",
        F.col("n_shared").cast("long").alias("n_shared"),
        "containment",
    )
