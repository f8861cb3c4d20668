"""Text-analysis primitives: shingling, MinHash, SimHash, tokenization.

Design constraints:

1. *Oracle-reproducible*: every primitive must be computable outside Spark
   so the DuckDB oracle verifies it value-for-value. The base hash both
   engines share bit-for-bit is ``md5``; 32-bit integers are extracted
   from the hex digest identically in both (Spark ``conv(substr(h,1,8),
   16,10)`` ≡ DuckDB ``('0x'||substr(h,1,8))::BIGINT``).

2. *One md5 per token, everything else integer arithmetic*: nested
   higher-order functions fall out of whole-stage codegen, so per-
   permutation hashing (64 md5s per shingle) is ~60× slower than it looks.
   Instead each shingle is hashed once and the 64 MinHash "permutations"
   are affine transforms ``h_i(x) = (a_i·x + b_i) mod P`` over the Mersenne
   prime P=2^31-1 (the same construction as Spark ML's MinHashLSH, public
   API). a_i < 2^31 and x < 2^31 keep the product inside int64 — portable
   to any engine with 64-bit integer arithmetic.

3. *Exploded aggregation, not per-row array loops*: the hot path is
   ``explode(shingles) → 64 min() aggregates`` — codegen'd map-side
   partial aggregation; the shuffle carries only (doc_id, 64×int64)
   regardless of document size. That is the formulation that survives
   100 TB.

SimHash analogously: one md5 per word → two 32-bit chunks = 64 unbiased
coin bits; fingerprint bit i = sign of the per-doc sum of (2·bit_i − 1);
the 64-bit fingerprint is packed into two int64 words so hamming distance
is ``bit_count(xor(w1)) + bit_count(xor(w2))``.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash configuration (shared with the oracle SQL builders in queries/).
NUM_HASHES = 64
LSH_BANDS = 16
LSH_ROWS = NUM_HASHES // LSH_BANDS  # 4 rows per band
MERSENNE_P = 2147483647  # 2^31 - 1
_MINHASH_SEED = 1_234_567


def minhash_coeffs(n: int = NUM_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) affine coefficients, a_i ∈ [1,P), b_i ∈ [0,P)."""
    rng = random.Random(_MINHASH_SEED)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(n)]


def hash32(s: Column, offset: int = 0) -> Column:
    """First (or second, offset=8) 32 bits of md5(s) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(s), 1 + offset, 8), 16, 10).cast("bigint")


def minhash_x(s: Column) -> Column:
    """Shingle base hash reduced mod P — the affine-transform input."""
    return hash32(s) % MERSENNE_P


# Word n-grams are hashed compositionally: each word is md5-hashed ONCE,
# consecutive word hashes are combined by a Horner chain mod P. This keeps
# the whole shingling pipeline in codegen (explode words → lead() window →
# integer arithmetic) instead of building per-row shingle-string arrays
# (~20× slower). Shingle identity = the combined hash; collision odds are
# ~|shingles|²/2³¹ per doc pair — negligible for set-similarity use.
HORNER_C = 1_000_003


def word_hash(w: Column) -> Column:
    """Per-word base hash (one md5 per word), reduced mod P."""
    return hash32(w) % MERSENNE_P


def ngram_hash(word_hashes: list[Column]) -> Column:
    """Horner-combined n-gram hash over consecutive word hashes.

    Every intermediate stays < 2^51 (x < 2^31, C ≈ 2^20), so the identical
    int64 arithmetic runs in any engine.
    """
    h = word_hashes[0]
    for nxt in word_hashes[1:]:
        h = (h * HORNER_C + nxt) % MERSENNE_P
    return h


def ngram_hash_sql(exprs: list[str]) -> str:
    """The DuckDB-side mirror of :func:`ngram_hash`."""
    h = exprs[0]
    for nxt in exprs[1:]:
        h = f"(({h}) * {HORNER_C} + {nxt}) % {MERSENNE_P}"
    return h


# SimHash configuration.
SIMHASH_BITS = 64
# 4 bands of 16 bits. Pigeonhole guarantees a shared band only for pairs
# with hamming <= 3; pairs at hamming 4..SIMHASH_MAX_HAMMING are
# best-effort (the oracle runs the identical banding, so the check stays
# exact). The alternative — 8 bands of 8 bits — guarantees recall to
# hamming 7 but collapses bucket selectivity (256 key values per band):
# measured 3.3x slower at sf0.1 and quadratic-bucket behavior at scale,
# which is the wrong trade for a 100 TB candidate generator.
SIMHASH_BANDS = 4


def words(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(text, " ")


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; empty array when fewer than n words."""
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    gram = lambda i: F.concat_ws(" ", *[F.get(ws, i + off) for off in range(n)])  # noqa: E731
    return F.when(
        F.size(ws) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def minhash_agg_columns(x: str, n: int = NUM_HASHES) -> list[Column]:
    """The 64 MIN aggregates over affine transforms of the base hash ``x``
    (a column name).

    Used as ``exploded.groupBy(doc_id).agg(*minhash_agg_columns('x'))``
    — Catalyst plans map-side partial mins, so the shuffle is (doc_id,
    64×int64) per doc. Each aggregate is one JVM-parsed expression: the
    Column-API form cost ~5 py4j round trips per hash (round-5 profiling:
    driver-side plan construction dominated the wide dedup queries).
    """
    return [
        F.expr(f"min(({a} * {x} + {b}) % {MERSENNE_P}) AS h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n))
    ]


def minhash_band_hash_columns(bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> list[Column]:
    """Per-band md5 over the comma-joined signature slice (columns h0..h63).

    Two docs are LSH candidates iff they agree on at least one band —
    the banding trick: P(candidate) = 1 - (1 - j^rows)^bands.
    """
    return [
        F.expr(
            "md5(concat_ws(',', "
            + ", ".join(f"h{b * rows + r}" for r in range(rows))
            + f")) AS band{b}"
        )
        for b in range(bands)
    ]


def simhash_vote_columns(bits: int = SIMHASH_BITS) -> list[Column]:
    """Per-bit SUM(±1) aggregates over exploded words.

    Expects columns ``c1``/``c2`` (the two 32-bit md5 chunks of each word);
    vote_i sums (2·bit_i − 1) over the doc's token multiset.
    """
    cols = []
    for i in range(bits):
        chunk = "c1" if i < 32 else "c2"
        cols.append(
            F.expr(f"sum((shiftright({chunk}, {i % 32}) & 1) * 2 - 1) AS s{i}")
        )
    return cols


def simhash_pack_words(bits: int = SIMHASH_BITS) -> tuple[Column, Column, Column]:
    """(w1, w2, fingerprint) from the vote columns s0..s63.

    w1 packs bits 0..31, w2 bits 32..63 (bit i ↔ 2^(i mod 32), always
    non-negative, int64-safe); fingerprint is the 64-char '0'/'1' string.
    """
    def bit(i: int) -> str:
        return f"CASE WHEN s{i} > 0 THEN 1 ELSE 0 END"

    w1 = " + ".join(
        [f"CAST({bit(0)} AS BIGINT)"]
        + [f"CAST({bit(i)} AS BIGINT) * {1 << i}" for i in range(1, 32)]
    )
    w2 = " + ".join(
        [f"CAST({bit(32)} AS BIGINT)"]
        + [f"CAST({bit(32 + i)} AS BIGINT) * {1 << i}" for i in range(1, 32)]
    )
    fingerprint = "concat(" + ", ".join(
        f"CAST({bit(i)} AS STRING)" for i in range(bits)
    ) + ")"
    return (
        F.expr(f"{w1} AS w1"),
        F.expr(f"{w2} AS w2"),
        F.expr(f"{fingerprint} AS fingerprint"),
    )


def hamming64(w1a: Column, w2a: Column, w1b: Column, w2b: Column) -> Column:
    """Hamming distance between two packed 64-bit fingerprints."""
    return (F.bit_count(w1a.bitwiseXOR(w1b)) + F.bit_count(w2a.bitwiseXOR(w2b))).cast("int")


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / F.nullif(union, F.lit(0)).cast("double")


# --- Language identification (stopword-vote heuristic) ----------------------
# Tiny fixed lexicons; score = token occurrences in the lexicon. The
# prediction is the argmax with alphabetical tie-break — both sides of the
# oracle evaluate langs in the same (alphabetical) order.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
    "en": ("the", "and", "is", "of", "to", "a", "in"),
    "es": ("el", "la", "y", "los", "de", "que", "un"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "zh": ("的", "是", "了", "在", "我", "有", "他"),
}


def lang_score(ws: Column, lang: str) -> Column:
    """Number of tokens belonging to ``lang``'s lexicon (with multiplicity)."""
    lex = LANG_LEXICONS[lang]
    return F.size(F.filter(ws, lambda w: w.isin(*lex)))


def predicted_lang(ws: Column) -> Column:
    """Argmax language over the lexicon scores, alphabetical tie-break."""
    scores = {lang: lang_score(ws, lang) for lang in sorted(LANG_LEXICONS)}
    best = F.greatest(*scores.values())
    expr = None
    for lang in sorted(LANG_LEXICONS):  # alphabetical: first max wins
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


# BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
# Kept RE2/Java-regex compatible so Spark and DuckDB agree.
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
