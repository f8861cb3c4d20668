"""Corpus/product analytics operators, round 5 [extension — not in reference]:
cohort retention, per-source token-distribution drift, and a table
column-profile audit.

These are the monitoring/diagnostics queries a 100 TB training-data
pipeline runs continuously around the curation operators:

- **cohort retention**: users bucketed by first-seen day, activity counted
  by day offset — the activation/retention matrix over the events stream.
  Both aggregations and the first-seen join shuffle on user_id (one
  co-located exchange footprint under AQE); the final rollup keys on
  (cohort_day, offset), whose cardinality is days², independent of corpus
  size.
- **source token drift**: KL divergence of each source's unigram
  distribution from the corpus distribution — the mixture-monitoring
  signal that catches a crawler or dump gone off-distribution before it
  poisons a training mix. The only corpus-sized pass is the token
  explode→(source, word) count (map-side combined); everything after runs
  on the sources×vocabulary relation, with the two totals relations
  broadcast.
- **column profile**: per-column row/null/distinct counts — the
  data-quality audit gate before a table enters a training mix. The
  registered (oracle-checked) form uses exact multi-column COUNT
  DISTINCT, which Catalyst plans via Expand (one replicated stream per
  audited column) — fine at audit time but the wrong default at 100 TB;
  the production path (``exact=False``) swaps in approx_count_distinct
  so the whole profile is one map-side-combined pass with no Expand.

Reference scope note: the reference (/root/reference/main.go) is a
partitioned ingest driver with no analytics surface; these extend its
events-by-entity-by-time data model (main.go:38-39,50) to the read side.
[extension]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators.text import words
from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables
from iceberg_file_writer_spark.cache_util import ensure_cached


@register(
    "cohort_retention",
    oracle="""
WITH firstseen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN firstseen f USING (user_id)
)
SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM activity GROUP BY cohort_day, day_offset
""",
    driver_exposed=False,  # twelfth rotation (r13): ceded after 12 green
    # rounds (r1 tenure, the longest on the surface) — joins class keeps
    # bloom_prefilter_join + streaming_join_view_maintenance, window class
    # keeps orders_above_customer_avg; still benched + pytest-oracle-checked
    description=(
        "Cohort retention: users bucketed by first-seen day, distinct "
        "active users per (cohort, day-offset) cell"
    ),
    # Mid-round-5 promotion: q15_top_supplier (driver-green r3-r4; its
    # view+agg+join shape stays covered by q5 and top_purchasers) ceded
    # its slot.
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix over the events stream.

    Scale shape: first-seen is a user-keyed partial-aggregated groupBy;
    the join back is user_id-to-user_id (same partitioning as the
    distinct's partial aggregate, so AQE coalesces the exchanges); the
    final groupBy keys on (cohort_day, day_offset) — days² rows however
    large the corpus. No window functions, no driver-side state.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "source_unigram_drift",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), src AS (
  SELECT source, w, count(*) AS c FROM tok GROUP BY source, w
), srctot AS (
  SELECT source, sum(c) AS n FROM src GROUP BY source
), corpus AS (
  SELECT w, sum(c) AS cc FROM src GROUP BY w
), corptot AS (
  SELECT sum(cc) AS nn FROM corpus
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_terms,
       round(sum((s.c::DOUBLE / t.n::DOUBLE)
                 * ln((s.c::DOUBLE / t.n::DOUBLE)
                      / (corpus.cc::DOUBLE / corptot.nn::DOUBLE))), 6)
         AS kl_divergence
FROM src s
JOIN srctot t USING (source)
JOIN corpus USING (w)
CROSS JOIN corptot
GROUP BY s.source
""",
    description=(
        "Source drift: KL divergence of each source's unigram "
        "distribution from the corpus unigram distribution"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def source_unigram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL(source ‖ corpus) over unigram distributions.

    Scale shape: one corpus-sized explode→count on (source, word) with
    map-side combine; src is sources×vocabulary rows, so the three
    derived relations (per-source totals, corpus counts, grand total) are
    tiny — srctot/corpus broadcast into the join and the 1-row grand
    total broadcasts via crossJoin. KL needs no smoothing: every source
    term is by construction present in the corpus distribution
    (q(w) >= p(w)·n/N > 0).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    # src is sources×vocabulary rows; cached so the corpus-sized
    # explode→count runs ONCE and the four downstream uses (join left
    # side, both totals, grand total) read the tiny aggregate.
    src = (
        docs.select("source", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(ensure_cached)
    )
    srctot = src.groupBy("source").agg(F.sum("c").alias("n"))
    corpus = src.groupBy("w").agg(F.sum("c").alias("cc"))
    corptot = corpus.agg(F.sum("cc").alias("nn"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    q = F.col("cc").cast("double") / F.col("nn").cast("double")
    return (
        src.join(F.broadcast(srctot), "source")
        .join(F.broadcast(corpus), "w")
        .crossJoin(F.broadcast(corptot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"),
        )
    )


PROFILE_COLUMNS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def column_profile(df: DataFrame, cols: tuple[str, ...], exact: bool = True) -> DataFrame:
    """Per-column (n_rows, n_nulls, n_distinct) audit in one aggregate.

    ``exact=True`` (the oracle-checked mode) uses COUNT(DISTINCT col) per
    column — Catalyst plans the multi-distinct via Expand, replicating
    the scan stream once per audited column. ``exact=False`` is the
    production default at scale: approx_count_distinct sketches all
    columns in a single map-side-combined pass (no Expand, one exchange
    of one sketch row per partition).
    """
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c).cast("long"))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(nd(c).alias(f"nd_{c}"))
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("p")).select("p.*")


@register(
    "orders_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
        for c in PROFILE_COLUMNS
    ),
    description=(
        "Column-profile audit: per-column row/null/distinct counts over "
        "orders (exact mode; production uses approx_count_distinct)"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return column_profile(
        load_tables(spark, sf_dir)["orders"], PROFILE_COLUMNS, exact=True
    )


# Shared with customer_entity_clusters' recursive-closure oracle.
_FUZZY_CTES = """c AS (SELECT c_custkey, c_name FROM customer),
v AS (
  SELECT c_custkey, c_name,
         substr(c_name, 1, i - 1) || '?' || substr(c_name, i + 1) AS blk
  FROM c, unnest(range(1, length(c_name) + 1)) AS t(i)
),
fpairs AS (
  SELECT DISTINCT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
         a.c_name AS name_a, b.c_name AS name_b
  FROM v a JOIN v b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) = 1
)"""

# Unrolled min-label closure for the ER oracles. The previous RECURSIVE
# `reach` CTE materialized the FULL transitive closure — O(Σ comp²)
# rows, and the edit-distance-1 graph over TPC-H customer names is one
# giant Hamming component (every pair of names differing in a single
# digit is an edge), so sf0.1 hit ~225M reach rows ≈ 29 min PER ENTRY
# in the escalation (BASELINE.md round-8 note). Min-label propagation
# is O(rounds × |E|) instead; rounds need only exceed the distance from
# each component's min-key node to its farthest member (~12 observed at
# sf0.1). The oracle SELF-CHECKS convergence at any sf: the final
# select cross-joins an `EXCEPT` between the last two rounds and calls
# DuckDB error() if they differ, so an under-unrolled closure fails
# loudly rather than hashing wrong.
ER_ORACLE_UNROLL = 24


def _er_closure_ctes() -> str:
    rounds, prev = "", "lbl0"
    for i in range(1, ER_ORACLE_UNROLL + 1):
        rounds += f"""
lbl{i} AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(min(nb.lbl), n.lbl)) AS lbl
  FROM {prev} n
  LEFT JOIN edges e ON e.src = n.node
  LEFT JOIN {prev} nb ON nb.node = e.dst
  GROUP BY n.node, n.lbl
),"""
        prev = f"lbl{i}"
    return f"""edges AS MATERIALIZED (
  SELECT cust_a AS src, cust_b AS dst FROM fpairs
  UNION
  SELECT cust_b, cust_a FROM fpairs
),
lbl0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),{rounds}
conv AS (
  SELECT count(*) AS bad FROM (
    SELECT node, lbl FROM lbl{ER_ORACLE_UNROLL}
    EXCEPT
    SELECT node, lbl FROM lbl{ER_ORACLE_UNROLL - 1}
  )
),
canon AS (
  SELECT node AS c_custkey, lbl AS entity_id
  FROM lbl{ER_ORACLE_UNROLL}, conv
  WHERE CASE WHEN conv.bad = 0 THEN true
             ELSE error('ER oracle closure did not converge in '
                        || {ER_ORACLE_UNROLL} || ' rounds') END
)"""


@register(
    "fuzzy_name_matches",
    oracle=f"""
WITH {_FUZZY_CTES}
SELECT cust_a, cust_b, name_a, name_b FROM fpairs
""",
    description=(
        "Entity resolution: edit-distance-1 name pairs via wildcard-"
        "position blocking (SymSpell neighborhoods) + Levenshtein verify"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate string join — the record-linkage/dedup primitive for
    entity columns.

    Scale shape: never all-pairs. Each name explodes into L wildcard
    variants ('?' at each position); two same-length names are
    Levenshtein-1 iff they are a single substitution apart iff they
    share the variant wildcarded at the differing position — so the
    candidate generator is an equi-join on the variant string (O(n·L)
    rows, hash-partitioned, group sizes bounded by the alphabet), with
    exact recall at this threshold, and the Levenshtein verify runs only
    on candidates. Larger thresholds generalize via C(L,d) deletion
    neighborhoods (SymSpell) — same join shape, documented seam. The
    blocked form is the whole point at 100 TB: brute force is an O(n²)
    CartesianProduct (gate below pins its absence).
    """
    c = load_tables(spark, sf_dir)["customer"].select("c_custkey", "c_name")
    v = c.selectExpr(
        "c_custkey",
        "c_name",
        "explode(transform(sequence(1, length(c_name)),"
        " i -> concat(substring(c_name, 1, i - 1), '?',"
        " substring(c_name, i + 1)))) AS blk",
    ).transform(ensure_cached)
    a = v.selectExpr("c_custkey AS cust_a", "c_name AS name_a", "blk")
    b = v.selectExpr("c_custkey AS cust_b", "c_name AS name_b", "blk")
    return (
        a.join(b, "blk")
        .where(F.col("cust_a") < F.col("cust_b"))
        .where(F.levenshtein("name_a", "name_b") == 1)
        .select("cust_a", "cust_b", "name_a", "name_b")
        # match-sized output shared by three consumers (this entry,
        # customer_entity_clusters, entity_survivorship): cache the
        # verified pairs once per session instead of re-running the
        # variant join + levenshtein verify per entry
        .transform(ensure_cached)
    )


@register(
    "event_value_trends",
    # the day offset `t` divides by a DOUBLE literal (e-notation) in a
    # projected subquery: a plain `86400000000.0` literal parses as
    # DECIMAL in both engines, and on the Spark side that forced a
    # per-row BigDecimal division inside EVERY regr_*/corr aggregate —
    # ~10x the whole entry's cost (found by the round-9 sf1 scaling
    # study); projecting once and dividing in IEEE double keeps the
    # two engines bit-identical AND codegen-fast
    oracle="""
SELECT event_type,
       CAST(regr_count(value, t) AS BIGINT)     AS n,
       round(regr_slope(value, t), 6)           AS slope_per_day,
       round(regr_intercept(value, t), 6)       AS intercept,
       round(regr_r2(value, t), 6)              AS r2,
       round(corr(value, t), 6)                 AS corr_vt,
       round(stddev_samp(value), 6)             AS value_stddev
FROM (SELECT event_type, value,
             epoch_us(ts) / 86400000000e0 AS t FROM events)
GROUP BY event_type
""",
    description=(
        "Trend detection: per-event-type OLS regression of value on "
        "event time (slope/day, intercept, R², correlation, stddev) via "
        "the built-in statistical aggregate family"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def event_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of event values over time.

    Scale shape: regr_*/corr/stddev are algebraic aggregates — Catalyst
    plans them as map-side partial moment sums (n, Σx, Σy, Σxy, Σx²,
    Σy²) with one exchange on the group key, identical to a hand-rolled
    moments pass but JVM-side and whole-stage-codegen'd. One scan, one
    shuffle of 6 doubles per (partition, type).
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
SELECT event_type,
       CAST(regr_count(value, t) AS BIGINT)     AS n,
       round(regr_slope(value, t), 6)           AS slope_per_day,
       round(regr_intercept(value, t), 6)       AS intercept,
       round(regr_r2(value, t), 6)              AS r2,
       round(corr(value, t), 6)                 AS corr_vt,
       round(stddev_samp(value), 6)             AS value_stddev
FROM (SELECT event_type, value,
             unix_micros(ts) / 86400000000e0 AS t FROM events)
GROUP BY event_type
"""
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling + cross-source contamination (round 5).
# ---------------------------------------------------------------------------

PRIORITY_K = 50
PRIORITY_SEED = "prio:"
_U32 = 4_294_967_296  # 2^32: the hash range the priority normalizes by


# Shared with the streaming form (streaming_ops.streaming_priority_sample):
# top-k by an exact integer priority is associative/commutative state, so
# the batch and streaming operators answer to the SAME oracle.
PRIORITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), h AS (
  SELECT doc_id, n_tokens,
         CAST(('0x' || substr(md5('{PRIORITY_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) AS hv
  FROM w
)
SELECT doc_id, n_tokens,
       CAST((n_tokens * {_U32}) // (hv + 1) AS BIGINT) AS priority
FROM h
ORDER BY priority DESC, doc_id
LIMIT {PRIORITY_K}
"""


@register(
    "doc_priority_sample",
    oracle=PRIORITY_ORACLE,
    description=(
        f"Weighted sample without replacement (priority sampling, "
        f"Duffield-Lund-Thorup shape): top-{PRIORITY_K} docs by the exact "
        f"integer priority w*2^32 div (h+1) over a salted md5 hash"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted k-sample: long documents proportionally likelier.

    The RNG-free form of priority sampling: u = salted-hash/2^32 stands in
    for the uniform draw, priority = w/u computed as the exact integer
    w*2^32 div (h+1) — reproducible across engines, runs, and cluster
    sizes like every sampling decision in this engine (sampling.py).

    Scale shape: one corpus scan, per-row JVM expressions, and a
    TakeOrderedAndProject top-k — per-partition heaps then a k-row driver
    merge; no global sort, no shuffle of non-winners.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return priority_relation(docs).orderBy(
        F.desc("priority"), "doc_id"
    ).limit(PRIORITY_K)


def priority_relation(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, priority) with the exact integer priority
    w*2^32 div (h+1). Shared by the batch top-k and the streaming
    mergeable-state sampler — both must compute identical integers."""
    h = docs.select(
        "doc_id",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(PRIORITY_SEED), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    )
    return h.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(n_tokens * {_U32}) div (hv + 1)").alias("priority"),
    )


# Shingles shared by >= 2 and <= RARE_MAX sources: discriminative overlap
# evidence. Frequent shingles carry no cross-source signal and would make
# the pair explosion quadratic in |sources| — the same hot-key reasoning
# as the near-dup stop-shingle cutoff (dedup.py), applied at source
# granularity.
OVERLAP_RARE_MAX = 5


def _overlap_oracle() -> str:
    from iceberg_file_writer_spark.queries.dedup import _WORDX_SQL, _shingle_x_sql

    return f"""
WITH wordx AS ({_WORDX_SQL}),
shingle_x AS ({_shingle_x_sql(3)}),
sx AS (
  SELECT DISTINCT d.source, s.x
  FROM shingle_x s JOIN documents d USING (doc_id)
),
counts AS (SELECT x, count(*) AS n_src FROM sx GROUP BY x),
rare AS (
  SELECT sx.source, sx.x FROM sx JOIN counts USING (x)
  WHERE n_src BETWEEN 2 AND {OVERLAP_RARE_MAX}
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rare FROM rare GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM rare a JOIN rare b ON a.x = b.x AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.n_shared,
       round(p.n_shared::DOUBLE / least(sa.n_rare, sb.n_rare), 6) AS containment
FROM pairs p
JOIN sizes sa ON sa.source = p.source_a
JOIN sizes sb ON sb.source = p.source_b
"""


@register(
    "source_shingle_overlap",
    oracle=_overlap_oracle(),
    description=(
        f"Cross-source contamination matrix: discriminative 3-gram "
        f"shingles (shared by 2..{OVERLAP_RARE_MAX} sources) joined "
        f"within shingle groups, scored as containment of the smaller "
        f"source's rare-shingle set"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which corpus sources copy from each other.

    The dataset-level dual of near-dup detection: duplicated content
    across *sources* (mirror sites, re-crawls, dataset repacks) shows up
    as shared rare shingles long before whole documents match. Pairing
    only shingles held by <= OVERLAP_RARE_MAX sources bounds the
    per-shingle pair fan-out to a constant (the stop-shingle argument at
    source granularity: frequent shingles carry no signal AND explode
    quadratically), so the join volume is O(|rare postings| * RARE_MAX)
    however large the corpus. Shingles travel as int64 hashes — document
    text never shuffles.
    """
    from iceberg_file_writer_spark.queries.dedup import shingle_x_from_docs

    docs = load_tables(spark, sf_dir)["documents"]
    sx = (
        shingle_x_from_docs(docs, 3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "x")
        .distinct()
        .transform(ensure_cached)
    )
    counts = sx.groupBy("x").agg(F.count(F.lit(1)).alias("n_src"))
    rare = sx.join(
        counts.where(
            (F.col("n_src") >= 2) & (F.col("n_src") <= OVERLAP_RARE_MAX)
        ).select("x"),
        "x",
    )
    sizes = rare.groupBy("source").agg(F.count(F.lit(1)).alias("n_rare"))
    pairs = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.x") == F.col("b.x")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_rare").alias("ra"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_rare").alias("rb"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.least("ra", "rb"), 6
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Train/eval split leakage audit (round 5).
# ---------------------------------------------------------------------------


def _leakage_oracle() -> str:
    from iceberg_file_writer_spark.queries.dedup import _MINHASH_PAIRS_CTES
    from iceberg_file_writer_spark.queries.sampling import (
        SPLIT_TRAIN,
        SPLIT_VAL,
        _duck_hash_bucket,
    )

    return f"""
WITH {_MINHASH_PAIRS_CTES},
splits AS (
  SELECT doc_id,
         CASE WHEN {_duck_hash_bucket("doc_id")} < {SPLIT_TRAIN} THEN 'train'
              WHEN {_duck_hash_bucket("doc_id")} < {SPLIT_VAL}   THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT least(sa.split, sb.split)    AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       CAST(count(*) AS BIGINT)     AS n_pairs,
       (least(sa.split, sb.split) <> greatest(sa.split, sb.split)) AS is_leak
FROM pairs p
JOIN splits sa ON sa.doc_id = p.doc_a
JOIN splits sb ON sb.doc_id = p.doc_b
GROUP BY 1, 2
"""


@register(
    "split_leakage_audit",
    oracle=_leakage_oracle(),
    description=(
        "Train/eval leakage audit: verified near-dup pairs bucketed by "
        "their endpoints' deterministic train/val/test splits — cross-split "
        "pairs are evaluation leaks the random split cannot see"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the random split leak near-duplicate content into eval?

    Hash-based splits are document-independent, so near-duplicate pairs
    straddle split boundaries in proportion to the split sizes — exactly
    the leakage the decontamination literature warns about (a test doc's
    near-twin in train). This audit joins the verified MinHash pair
    relation with both endpoints' split assignments and reports pair
    counts per (split, split) cell; the off-diagonal cells are the leaks
    the dedup-then-split pipeline ordering exists to prevent.

    Scale shape: the pair relation is the already-bounded LSH output
    (banded candidates, exact verify); the split column is a per-row hash
    expression, so the two joins are pair-sized, never corpus-sized —
    the tiny pair side broadcasts against the doc_id-keyed split relation.
    """
    from iceberg_file_writer_spark.queries.dedup import _minhash_pairs_df
    from iceberg_file_writer_spark.queries.sampling import (
        SPLIT_TRAIN,
        SPLIT_VAL,
        _spark_hash_bucket,
    )

    bucket = _spark_hash_bucket(F.col("doc_id"))
    splits = load_tables(spark, sf_dir)["documents"].select(
        "doc_id",
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    pairs = _minhash_pairs_df(spark, sf_dir)
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


# ---------------------------------------------------------------------------
# Event-type co-occurrence PMI (round 5).
# ---------------------------------------------------------------------------


@register(
    "event_type_cooccurrence_pmi",
    oracle="""
WITH docs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events
),
n AS (SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_docs
      FROM docs),
tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
       FROM docs GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM docs a JOIN docs b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       round(ln((p.n_both::DOUBLE * n.n_docs)
                / (ta.n_t::DOUBLE * tb.n_t)), 6) AS pmi
FROM pairs p
JOIN tc ta ON ta.event_type = p.type_a
JOIN tc tb ON tb.event_type = p.type_b
CROSS JOIN n
""",
    description=(
        "Pointwise mutual information between event types co-occurring in "
        "the same (user, day) — which behaviors travel together; the "
        "feature-engineering co-occurrence statistic"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def event_type_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types show up together more than chance predicts.

    Scale shape: the corpus-sized pass is one distinct over
    (user, day, type) — map-side combined, |types| rows per (user, day).
    The self-join fans out at most |types|² per (user, day) cell (a
    constant), the per-type totals and the 1-row doc count broadcast, and
    the output is |types|² rows however large the corpus.
    """
    ev = load_tables(spark, sf_dir)["events"]
    docs = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    n = (
        docs.select("user_id", "day")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tc = docs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = docs.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = docs.select("user_id", "day", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tc.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    tb = tc.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.log(
                    (F.col("n_both").cast("double") * F.col("n_docs"))
                    / (F.col("na").cast("double") * F.col("nb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Robust (MAD) outlier detection (round 5).
# ---------------------------------------------------------------------------

MAD_THRESHOLD = 3.5  # the conventional modified-z-score cutoff


@register(
    "event_value_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_disc(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_outliers,
       CAST(min(d.event_id) AS BIGINT) AS first_outlier_id,
       round(max(abs(d.value - d.med) / (1.4826 * m.mad)), 6) AS max_robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0
  AND abs(d.value - d.med) / (1.4826 * m.mad) > {MAD_THRESHOLD}
GROUP BY d.event_type
""",
    description=(
        "Robust outlier detection: per-type median absolute deviation "
        f"(MAD) modified z-scores, flagging |z| > {MAD_THRESHOLD} — "
        "median/MAD resist the very outliers a stddev-based z-score "
        "absorbs"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outliers a mean/stddev z-score would hide.

    Extreme values inflate the stddev that is supposed to expose them;
    median and MAD are 50%-breakdown robust. Two GK-percentile passes
    (median per type, then median absolute deviation per type), each a
    map-side partial-aggregated sketch with the |types|-row result
    broadcast back — no global sorts. Exact-accuracy sketches make the
    oracle's quantile_disc equality exact at check SF; the production
    accuracy is the bounded default (relational_ext.approx_percentiles).
    """
    from iceberg_file_writer_spark.queries.relational_ext import (
        _PCT_EXACT_ORACLE_ACCURACY,
    )

    ev = load_tables(spark, sf_dir)["events"]
    med = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, _PCT_EXACT_ORACLE_ACCURACY).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile_approx("adev", 0.5, _PCT_EXACT_ORACLE_ACCURACY).alias("mad")
    )
    z = F.abs(F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (z > MAD_THRESHOLD))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min("event_id").alias("first_outlier_id"),
            F.round(F.max(z), 6).alias("max_robust_z"),
        )
    )


@register(
    "customer_entity_clusters",
    oracle=f"""
WITH {_FUZZY_CTES},
{_er_closure_ctes()}
SELECT canon.entity_id, canon.c_custkey, c.c_name,
       (count(*) OVER (PARTITION BY canon.entity_id))::BIGINT AS entity_size
FROM canon JOIN c ON c.c_custkey = canon.c_custkey
""",
    description=(
        "Entity resolution endgame: fuzzy name matches closed into "
        "entity clusters via the shared connected-components operator — "
        "each matched customer labeled with its entity's canonical key"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
    eager=True,  # builds/loads a trained artifact or runs a stream at plan time
)
def customer_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match pairs are not entities — the closure is.

    Same argument as near-dup canonicalization (A~B, B~C chains), same
    machinery: the pair graph feeds operators/graph.py::
    connected_components — the audited min-label fixpoint now shared by
    both the dedup and entity-resolution pipelines, which is the point
    of extracting it. The pair relation is match-sized (orders smaller
    than the customer table); the name join back is key-equi.
    """
    from pyspark.sql import Window

    from iceberg_file_writer_spark.operators.graph import connected_components

    pairs = fuzzy_name_matches(spark, sf_dir).select("cust_a", "cust_b")
    cc = connected_components(pairs, "cust_a", "cust_b")
    names = load_tables(spark, sf_dir)["customer"].select("c_custkey", "c_name")
    wsz = Window.partitionBy("entity_id")
    return (
        cc.select(
            F.col("component").alias("entity_id"),
            F.col("node").alias("c_custkey"),
        )
        .join(names, "c_custkey")
        .select(
            "entity_id",
            "c_custkey",
            "c_name",
            F.count(F.lit(1)).over(wsz).cast("long").alias("entity_size"),
        )
    )


@register(
    "entity_survivorship",
    oracle=f"""
WITH {_FUZZY_CTES},
{_er_closure_ctes()},
members AS (
  SELECT canon.entity_id, cu.c_custkey, cu.c_name, cu.c_acctbal
  FROM canon JOIN customer cu USING (c_custkey)
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY entity_id
                            ORDER BY c_acctbal DESC, c_custkey) AS rn,
         count(*) OVER (PARTITION BY entity_id) AS n_records
  FROM members
)
SELECT entity_id, n_records::BIGINT AS n_records,
       c_custkey AS surviving_custkey,
       c_name    AS surviving_name,
       round(c_acctbal, 2) AS surviving_acctbal
FROM ranked WHERE rn = 1
""",
    description=(
        "Entity survivorship: per fuzzy-match entity cluster, the "
        "surviving record by the highest-account-balance rule "
        "(tie-break custkey) — the MDM golden-record selection"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
    eager=True,  # builds/loads a trained artifact or runs a stream at plan time
)
def entity_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record selection over resolved entities.

    The cluster labels come from the shared connected-components
    operator (via customer_entity_clusters' machinery); the
    survivorship rule is a deterministic per-entity argmax — a rank-1
    window filter Spark pushes down as WindowGroupLimit when it is the
    lone window (n_records rides along from a pre-aggregated count
    joined back, preserving the pushdown like canonical-by-quality).
    """
    from pyspark.sql import Window

    from iceberg_file_writer_spark.operators.graph import connected_components

    pairs = fuzzy_name_matches(spark, sf_dir).select("cust_a", "cust_b")
    cc = connected_components(pairs, "cust_a", "cust_b").select(
        F.col("component").alias("entity_id"),
        F.col("node").alias("c_custkey"),
    )
    sizes = cc.groupBy("entity_id").agg(F.count("*").alias("n_records"))
    cust = load_tables(spark, sf_dir)["customer"].select(
        "c_custkey", "c_name", "c_acctbal"
    )
    members = cc.join(cust, "c_custkey")
    w = Window.partitionBy("entity_id").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        members.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(F.broadcast(sizes), "entity_id")
        .select(
            "entity_id",
            "n_records",
            F.col("c_custkey").alias("surviving_custkey"),
            F.col("c_name").alias("surviving_name"),
            F.round("c_acctbal", 2).alias("surviving_acctbal"),
        )
    )


@register(
    "weekly_churn_rates",
    oracle="""
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week_start
  FROM events
),
paired AS (
  SELECT a.week_start AS prev_week, a.user_id,
         CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS retained
  FROM wk a
  LEFT JOIN wk b
    ON b.user_id = a.user_id
   AND b.week_start = a.week_start + INTERVAL 7 DAY
  WHERE a.week_start + INTERVAL 7 DAY
        <= (SELECT max(week_start) FROM wk)
)
SELECT prev_week,
       count(*)                              AS n_active,
       sum(retained)::BIGINT                 AS n_retained,
       (count(*) - sum(retained))::BIGINT    AS n_churned,
       ((1000 * (count(*) - sum(retained))) // count(*))::BIGINT
         AS churn_permille
FROM paired GROUP BY prev_week
""",
    description=(
        "Weekly churn: per week, users active that week who are absent "
        "the next — retained/churned counts and exact churn permille "
        "(complete trailing weeks only)"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def weekly_churn_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention complement of the cohort matrix.

    Scale shape: the distinct (user, week) relation is the only
    corpus-derived input (user-keyed partial agg); the week-over-week
    pairing is a self equi-join on (user_id, shifted week) — both sides
    user-keyed, co-partitioned — and the report aggregates onto the
    |weeks| relation. The final observed week is excluded (its
    next-week absence is censoring, not churn). Exact integer permille.
    """
    ev = load_tables(spark, sf_dir)["events"]
    wk = ev.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start")
    ).distinct()
    last = wk.agg(F.max("week_start").alias("mx"))
    # alias both sides of the self-join: joining on columns of a derived
    # DataFrame (nxt.user_id == wk.user_id) resolves only via dataset-id
    # lineage and emits the "trivially true equals predicate" WARN
    cur = wk.alias("cur")
    nxt = wk.selectExpr("user_id AS nxt_user_id", "week_start AS next_week").alias(
        "nxt"
    )
    paired = (
        cur.withColumn("next_expected", F.date_add("week_start", 7))
        .crossJoin(F.broadcast(last))
        .where(F.col("next_expected") <= F.col("mx"))
        .join(
            nxt,
            (F.col("nxt.next_week") == F.col("next_expected"))
            & (F.col("nxt.nxt_user_id") == F.col("cur.user_id")),
            "left",
        )
        .select(
            F.col("cur.week_start").alias("prev_week"),
            F.when(F.col("nxt.next_week").isNull(), 0).otherwise(1).alias("retained"),
        )
    )
    return paired.groupBy("prev_week").agg(
        F.count("*").alias("n_active"),
        F.sum("retained").cast("long").alias("n_retained"),
        (F.count("*") - F.sum("retained")).cast("long").alias("n_churned"),
        F.floor(
            (F.lit(1000) * (F.count("*") - F.sum("retained"))) / F.count("*")
        )
        .cast("long")
        .alias("churn_permille"),
    )


# --- HyperLogLog distinct sketch (mergeable-sketch family) ------------------

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 52                 # rank bits read after the bucket byte
_HLL_RMAX = HLL_WBITS + 1      # rho when the rank field is all zeros
_HLL_POW = float(1 << _HLL_RMAX)  # 2^53, exactly representable
# Flajolet et al. alpha_m for m >= 128, spelled identically in both
# engines so the double arithmetic is bit-identical
_HLL_ALPHA_SQL = f"(0.7213 / (1.0 + 1.079 / {HLL_M}.0))"


def _hll_est_sql(s: str, zeros: str) -> str:
    """Estimator with linear-counting small-range correction; ``s`` is the
    EXACT INTEGER sum of 2^(RMAX - rho) over all m registers (empty
    registers contribute 2^RMAX), so the only float ops are the final
    division and the log — written with one association order for both
    engines."""
    raw = (
        f"({_HLL_ALPHA_SQL} * {HLL_M}.0 * {HLL_M}.0 * {_HLL_POW!r}"
        f" / CAST({s} AS DOUBLE))"
    )
    lc = f"({HLL_M}.0 * ln({HLL_M}.0 / CAST({zeros} AS DOUBLE)))"
    return (
        f"CAST(floor(CASE WHEN {raw} <= {2.5 * HLL_M!r} AND {zeros} > 0 "
        f"THEN {lc} ELSE {raw} END) AS BIGINT)"
    )


@register(
    "hll_distinct_users_by_type",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::UBIGINT::BIGINT AS bucket,
         ('0x' || substr(md5(user_id::VARCHAR), 3, 13))::UBIGINT::BIGINT AS w
  FROM events
),
regs AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin(w)) END)::BIGINT AS rho
  FROM h GROUP BY 1, 2
),
merged AS (
  SELECT event_type, bucket, rho FROM regs
  UNION ALL
  SELECT 'ALL' AS event_type, bucket, max(rho) AS rho
  FROM regs GROUP BY bucket
),
sums AS (
  SELECT event_type,
         (sum(1::BIGINT << ({_HLL_RMAX} - rho))
          + ({HLL_M} - count(*)) * (1::BIGINT << {_HLL_RMAX}))::BIGINT AS s,
         ({HLL_M} - count(*))::BIGINT AS zeros
  FROM merged GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY 1
  UNION ALL
  SELECT 'ALL', count(DISTINCT user_id)::BIGINT FROM events
)
SELECT s.event_type,
       {_hll_est_sql('s.s', 's.zeros')} AS est_distinct,
       e.exact_distinct,
       CAST(floor(1000.0 * abs({_hll_est_sql('s.s', 's.zeros')} - e.exact_distinct)
                  / e.exact_distinct) AS BIGINT) AS err_permille
FROM sums s JOIN exact e ON e.event_type = s.event_type
""",
    description=(
        f"HyperLogLog distinct-user sketch: {HLL_M} registers from "
        "md5-derived bucket/rank bits, per-type sketches PLUS their "
        "register-wise max-merge as the 'ALL' row (the mergeability that "
        "makes HLL the 100 TB cardinality primitive), linear-counting "
        "small-range correction, and the measured error vs the exact "
        "count — the estimator-error audit pattern. Exact-integer "
        "register sums make the estimate bit-reproducible; the oracle "
        "replays the whole sketch"
    ),
    # Promoted in the round-7 (fifth) rotation: round-6 flagship
    # classes get driver-green evidence (VERDICT r6 item 2; BASELINE.md).
)
def hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality with a mergeability proof in the output.

    Scale shape: one corpus pass builds the (type, bucket) -> max-rho
    register relation (map-side partial max over at most
    |types| x 256 keys); every later step runs on register-sized
    relations. The 'ALL' row is computed FROM THE SKETCHES (register-wise
    max), never from the data — merging m-integer summaries is how HLL
    unions across partitions, days, or tables without re-reading any of
    them. The estimator sums 2^(RMAX-rho) as exact BIGINTs (empty
    registers contribute 2^RMAX), so both engines floor identical
    doubles. Compare spark.sql approx_count_distinct: same family, but
    its registers aren't exposed — this form keeps the sketch itself
    queryable and mergeable as data.
    """
    ev = load_tables(spark, sf_dir)["events"]
    h = ev.selectExpr(
        "event_type",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10) AS BIGINT)"
        " AS bucket",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 3, 13), 16, 10) AS BIGINT)"
        " AS w",
    )
    regs = h.groupBy("event_type", "bucket").agg(
        F.expr(
            f"max(CASE WHEN w = 0 THEN {_HLL_RMAX}"
            f" ELSE {_HLL_RMAX} - length(bin(w)) END)"
        ).cast("long").alias("rho")
    ).transform(ensure_cached)
    merged = regs.unionByName(
        regs.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("ALL").alias("event_type"), "bucket", "rho")
    )
    sums = merged.groupBy("event_type").agg(
        F.expr(
            f"CAST(sum(shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - rho))"
            f" + ({HLL_M} - count(*)) * shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX})"
            " AS BIGINT)"
        ).alias("s"),
        F.expr(f"CAST({HLL_M} - count(*) AS BIGINT)").alias("zeros"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    ).unionByName(
        ev.agg(
            F.lit("ALL").alias("event_type"),
            F.countDistinct("user_id").cast("long").alias("exact_distinct"),
        )
    )
    est = _hll_est_sql("s", "zeros")
    return (
        sums.join(F.broadcast(exact), "event_type")
        .selectExpr(
            "event_type",
            f"{est} AS est_distinct",
            "exact_distinct",
            f"CAST(floor(1000.0 * abs({est} - exact_distinct)"
            " / exact_distinct) AS BIGINT) AS err_permille",
        )
    )


@register(
    "rolling_wau_hll_estimate",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
maxd AS (SELECT max(d) AS mx FROM ud),
regs_daily AS (
  SELECT d, ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::UBIGINT::BIGINT AS bucket,
         max(CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 3, 13))::UBIGINT::BIGINT = 0
                  THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin(
                    ('0x' || substr(md5(user_id::VARCHAR), 3, 13))::UBIGINT::BIGINT))
             END)::BIGINT AS rho
  FROM ud GROUP BY 1, 2
),
contrib AS (
  SELECT d + (o::INT) AS target_day, bucket, rho
  FROM regs_daily CROSS JOIN (SELECT unnest(range(7)) AS o)
),
merged AS (
  SELECT c.target_day, c.bucket, max(c.rho) AS rho
  FROM contrib c CROSS JOIN maxd
  WHERE c.target_day <= maxd.mx
  GROUP BY 1, 2
),
sums AS (
  SELECT target_day,
         (sum(1::BIGINT << ({_HLL_RMAX} - rho))
          + ({HLL_M} - count(*)) * (1::BIGINT << {_HLL_RMAX}))::BIGINT AS s,
         ({HLL_M} - count(*))::BIGINT AS zeros
  FROM merged GROUP BY 1
),
exact AS (
  SELECT target_day, count(DISTINCT user_id)::BIGINT AS exact_wau
  FROM (
    SELECT user_id, d + (o::INT) AS target_day
    FROM ud CROSS JOIN (SELECT unnest(range(7)) AS o)
  ) x CROSS JOIN maxd
  WHERE x.target_day <= maxd.mx
  GROUP BY 1
)
SELECT s.target_day AS day,
       {_hll_est_sql('s.s', 's.zeros')} AS est_wau,
       e.exact_wau,
       CAST(floor(1000.0 * abs({_hll_est_sql('s.s', 's.zeros')} - e.exact_wau)
                  / e.exact_wau) AS BIGINT) AS err_permille
FROM sums s JOIN exact e ON e.target_day = s.target_day
""",
    description=(
        "Rolling 7-day active users from MERGED daily HLL sketches "
        "(register-wise max across the window's days) with measured "
        "error vs the exact rolling distinct — the long-window path the "
        "exact rolling-WAU entry documents: day-granular register "
        "relations replace the x7 fan-out of user rows"
    ),
    driver_exposed=False,
    # Round-6 addition, registered after the rotation froze the surface;
    # pytest-oracle-checked (test_oracle_parity).
)
def rolling_wau_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct counting at sketch cost.

    The exact form (rolling_weekly_active_users) fans the distinct
    (user, day) relation x7; this form fans the DAILY REGISTER relation
    x7 instead — |days| x 256 rows however many users exist, the reason
    HLL rollups own long windows and high-cardinality keys at 100 TB.
    Merging is register-wise max (associative, order-free), the estimate
    and its measured error vs the exact count ride in the output, and
    everything downstream of the one (user, day)-distinct corpus pass
    runs on register- or day-sized relations.
    """
    ev = load_tables(spark, sf_dir)["events"]
    ud = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct().transform(ensure_cached)
    maxd = ud.agg(F.max("d").alias("mx"))
    regs_daily = ud.selectExpr(
        "d",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10) AS BIGINT)"
        " AS bucket",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 3, 13), 16, 10) AS BIGINT)"
        " AS w",
    ).groupBy("d", "bucket").agg(
        F.expr(
            f"max(CASE WHEN w = 0 THEN {_HLL_RMAX}"
            f" ELSE {_HLL_RMAX} - length(bin(w)) END)"
        ).cast("long").alias("rho")
    )
    merged = (
        regs_daily.select(
            F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("target_day"),
            "bucket",
            "rho",
        )
        .crossJoin(F.broadcast(maxd))
        .where(F.col("target_day") <= F.col("mx"))
        .groupBy("target_day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    sums = merged.groupBy("target_day").agg(
        F.expr(
            f"CAST(sum(shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - rho))"
            f" + ({HLL_M} - count(*)) * shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX})"
            " AS BIGINT)"
        ).alias("s"),
        F.expr(f"CAST({HLL_M} - count(*) AS BIGINT)").alias("zeros"),
    )
    exact = (
        ud.select(
            "user_id",
            F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("target_day"),
        )
        .crossJoin(F.broadcast(maxd))
        .where(F.col("target_day") <= F.col("mx"))
        .distinct()
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_wau"))
    )
    est = _hll_est_sql("s", "zeros")
    return (
        sums.join(exact, "target_day")
        .selectExpr(
            "target_day AS day",
            f"{est} AS est_wau",
            "exact_wau",
            f"CAST(floor(1000.0 * abs({est} - exact_wau)"
            " / exact_wau) AS BIGINT) AS err_permille",
        )
    )


# --- KMV / theta sketch: distinct counts WITH set operations ---------------

# k-minimum-values sketch (Bar-Yossef et al.; the theta-sketch family):
# keep the KMV_K smallest 48-bit hash values of a key set. Cardinality
# estimate: (K-1) * HMAX / kth_smallest. Unlike HLL (register max-merge,
# union only), KMV summaries support INTERSECTION: with theta =
# min(kth_A, kth_B), the sketch entries below theta are a uniform
# hash-sample of each set, so |A n B| ~ |{h in sk_A n sk_B : h < theta}|
# * HMAX / theta. 48-bit hashes keep every product (K-1)*HMAX ~ 2^56
# inside BIGINT on both engines (no HUGEINT/DECIMAL divergence).
KMV_K = 128  # small enough that the estimator path (not the exact-count
# fallback) is exercised from sf0.01 up — the correctness gate must see
# the real sketch math, not the |S| < K degenerate case
KMV_HEX = 12  # md5 hex prefix length -> 48-bit hash
KMV_HMAX = 1 << 48

_KMV_H_SPARK = (
    f"CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, {KMV_HEX}), 16, 10)"
    " AS BIGINT)"
)
_KMV_H_DUCK = (
    f"(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, {KMV_HEX}))"
    "::UBIGINT)::BIGINT"
)


@register(
    "kmv_theta_user_overlap",
    oracle=f"""
WITH base AS (
  SELECT DISTINCT event_type, {_KMV_H_DUCK} AS h
  FROM events WHERE event_type IN ('purchase', 'click')
),
sk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM base QUALIFY rk <= {KMV_K}
),
stats AS (SELECT event_type, count(*)::BIGINT AS nh FROM base GROUP BY 1),
kth AS (SELECT event_type, h AS kth FROM sk WHERE rk = {KMV_K}),
per_type AS (
  SELECT s.event_type AS measure,
         CASE WHEN k.kth IS NULL THEN s.nh
              ELSE ({KMV_K - 1}::BIGINT * {KMV_HMAX}::BIGINT) // k.kth
         END AS est_distinct
  FROM stats s LEFT JOIN kth k ON k.event_type = s.event_type
),
uh AS (SELECT DISTINCT h FROM sk),
topu AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM uh QUALIFY rk <= {KMV_K}),
est_u AS (
  SELECT 'UNION' AS measure,
         CASE WHEN (SELECT count(*) FROM uh) < {KMV_K}
              THEN (SELECT count(*)::BIGINT FROM uh)
              ELSE ({KMV_K - 1}::BIGINT * {KMV_HMAX}::BIGINT)
                   // (SELECT h FROM topu WHERE rk = {KMV_K})
         END AS est_distinct
),
theta AS (
  SELECT least(
    coalesce((SELECT kth FROM kth WHERE event_type = 'purchase'), {KMV_HMAX}::BIGINT),
    coalesce((SELECT kth FROM kth WHERE event_type = 'click'), {KMV_HMAX}::BIGINT)
  ) AS th
),
est_i AS (
  SELECT 'INTERSECT' AS measure,
         ((SELECT count(*)::BIGINT FROM sk a JOIN sk b ON a.h = b.h
            AND a.event_type = 'purchase' AND b.event_type = 'click'
           WHERE a.h < (SELECT th FROM theta))
          * {KMV_HMAX}::BIGINT) // (SELECT th FROM theta) AS est_distinct
),
est AS (
  SELECT * FROM per_type UNION ALL SELECT * FROM est_u UNION ALL SELECT * FROM est_i
),
upt AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE event_type IN ('purchase', 'click')
),
exact AS (
  SELECT event_type AS measure, count(*)::BIGINT AS exact_distinct
  FROM upt GROUP BY 1
  UNION ALL
  SELECT 'UNION', count(DISTINCT user_id)::BIGINT FROM upt
  UNION ALL
  SELECT 'INTERSECT', count(*)::BIGINT FROM (
    SELECT user_id FROM upt GROUP BY user_id HAVING count(*) = 2
  )
)
SELECT e.measure,
       CAST(e.est_distinct AS BIGINT) AS est_distinct,
       x.exact_distinct,
       CAST(floor(1000.0 * abs(e.est_distinct - x.exact_distinct)
                  / x.exact_distinct) AS BIGINT) AS err_permille
FROM est e JOIN exact x ON x.measure = e.measure
""",
    description=(
        f"KMV/theta sketch: {KMV_K}-minimum-values summaries of the "
        "purchaser and clicker user sets — per-set cardinality, "
        "sketch-merge UNION, and the theta INTERSECTION estimate HLL "
        "cannot express, each beside its exact count with measured "
        "error (estimator-audit pattern); 48-bit integer hashes keep "
        "every product in BIGINT, bit-identical across engines"
    ),
    # Round-9 rotation (eighth): ceded after driver-green r7-r8 (the
    # sketch family stays evidenced via hll_distinct_users_by_type);
    # promoted in the sixth rotation for first driver evidence.
    driver_exposed=False,
)
def kmv_theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra from mergeable fixed-size summaries.

    Scale shape: ONE corpus pass computes distinct (type, 48-bit-hash)
    pairs (map-side partial distinct); the per-type K-smallest runs as a
    single-row_number window that Spark executes as WindowGroupLimit —
    each input partition forwards at most K rows before the shuffle, so
    the full-data sort never happens. Everything after operates on
    <= 2*K summary rows (broadcast-sized). The union estimate uses only
    the two summaries (K smallest of their union IS the K smallest of
    the united sets — every hash below the merged kth is below its own
    set's kth); the intersection estimate counts shared summary entries
    below theta = min(kth_A, kth_B). At 100 TB the summaries are the
    only thing that crosses the wire — the sketch-as-data posture shared
    with hll_distinct_users_by_type, plus the set algebra HLL lacks.
    """
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    base = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .selectExpr("event_type", f"{_KMV_H_SPARK} AS h")
        .distinct()
        .transform(ensure_cached)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        base.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KMV_K)
        .transform(ensure_cached)
    )
    stats = base.groupBy("event_type").agg(F.count("*").cast("long").alias("nh"))
    kth = sk.where(F.col("rk") == KMV_K).select("event_type", F.col("h").alias("kth"))
    per_type = stats.join(F.broadcast(kth), "event_type", "left").selectExpr(
        "event_type AS measure",
        f"CAST(CASE WHEN kth IS NULL THEN nh"
        f" ELSE (CAST({KMV_K - 1} AS BIGINT) * CAST({KMV_HMAX} AS BIGINT)) div kth"
        " END AS BIGINT) AS est_distinct",
    )
    uh = sk.select("h").distinct().transform(ensure_cached)
    n_u = uh.agg(F.count("*").cast("long").alias("n_u"))
    kth_u = uh.orderBy("h").limit(KMV_K).agg(
        F.max("h").alias("kth_u"), F.count("*").cast("long").alias("n_top")
    )
    est_u = n_u.crossJoin(kth_u).selectExpr(
        "'UNION' AS measure",
        f"CAST(CASE WHEN n_u < {KMV_K} THEN n_u"
        f" ELSE (CAST({KMV_K - 1} AS BIGINT) * CAST({KMV_HMAX} AS BIGINT)) div kth_u"
        " END AS BIGINT) AS est_distinct",
    )
    theta = (
        sk.groupBy()
        .pivot("event_type", ["purchase", "click"])
        .agg(F.max(F.when(F.col("rk") == KMV_K, F.col("h"))))
        .selectExpr(
            f"least(coalesce(purchase, {KMV_HMAX}L),"
            f" coalesce(click, {KMV_HMAX}L)) AS th"
        )
    )
    ska = sk.where(F.col("event_type") == "purchase").select("h")
    skb = sk.where(F.col("event_type") == "click").select("h")
    est_i = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("th"))
        .groupBy("th")
        .agg(F.count("*").cast("long").alias("shared"))
        .unionByName(
            theta.selectExpr("th", "CAST(0 AS BIGINT) AS shared")
        )  # empty-intersection guard: keep exactly one row per theta
        .groupBy("th")
        .agg(F.max("shared").alias("shared"))
        .selectExpr(
            "'INTERSECT' AS measure",
            f"CAST((shared * CAST({KMV_HMAX} AS BIGINT)) div th AS BIGINT)"
            " AS est_distinct",
        )
    )
    est = per_type.unionByName(est_u).unionByName(est_i)

    upt = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select("event_type", "user_id")
        .distinct()
        .transform(ensure_cached)
    )
    exact = (
        upt.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("exact_distinct"))
        .selectExpr("event_type AS measure", "exact_distinct")
        .unionByName(
            upt.agg(
                F.lit("UNION").alias("measure"),
                F.countDistinct("user_id").cast("long").alias("exact_distinct"),
            )
        )
        .unionByName(
            upt.groupBy("user_id")
            .agg(F.count("*").alias("nt"))
            .where(F.col("nt") == 2)
            .agg(
                F.lit("INTERSECT").alias("measure"),
                F.count("*").cast("long").alias("exact_distinct"),
            )
        )
    )
    return est.join(F.broadcast(exact), "measure").selectExpr(
        "measure",
        "est_distinct",
        "exact_distinct",
        "CAST(floor(1000.0 * abs(est_distinct - exact_distinct)"
        " / exact_distinct) AS BIGINT) AS err_permille",
    )


@register(
    "pareto_cheapest_large_parts",
    oracle="""
WITH p AS (SELECT DISTINCT p_retailprice AS pr, p_size AS sz FROM part),
sky AS (
  SELECT pr, sz FROM p a
  WHERE NOT EXISTS (
    SELECT 1 FROM p b
    WHERE b.pr <= a.pr AND b.sz >= a.sz AND (b.pr < a.pr OR b.sz > a.sz)
  )
)
SELECT t.p_partkey, t.p_name, t.p_retailprice, t.p_size
FROM part t JOIN sky ON sky.pr = t.p_retailprice AND sky.sz = t.p_size
""",
    description=(
        "Skyline / Pareto front (EDBT-2023 Spark-skyline class): the "
        "parts no other part dominates on (price MIN, size MAX), "
        "computed as a distributed prefix min-scan — range-partition on "
        "price, two window frames per partition, one broadcast "
        "carry-in; never the O(n^2) self-join the ORACLE literally runs "
        "(over distinct value pairs) to define the semantics"
    ),
    # Promoted in the ninth rotation (round 10): the skyline operator
    # class gets driver-green evidence (VERDICT r9 next-step 2).
)
def pareto_cheapest_large_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts: no cheaper-and-at-least-as-large rival.

    operators/skyline.py has the plan argument; scale=100 makes the
    2-decimal price an exact-integer RANGE key. Ties on both dimensions
    are mutually non-dominating and all kept (NOT-EXISTS semantics)."""
    from iceberg_file_writer_spark.operators.skyline import skyline2d

    parts = load_tables(spark, sf_dir)["part"].select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    return skyline2d(
        parts, "p_retailprice", "p_size",
        minimize_x=True, minimize_y=False, scale=100,
    )


@register(
    "orders_quality_expectations",
    oracle="""
WITH r AS (
  SELECT 'not_null' AS rule, 'o_orderkey' AS "column",
         (SELECT count(*)::BIGINT FROM orders WHERE o_orderkey IS NULL) AS n_violations
  UNION ALL
  SELECT 'unique', 'o_orderkey',
         (SELECT (count(o_orderkey) - count(DISTINCT o_orderkey))::BIGINT FROM orders)
  UNION ALL
  SELECT 'range', 'o_totalprice',
         (SELECT count(*)::BIGINT FROM orders
          WHERE o_totalprice IS NOT NULL
            AND (o_totalprice < 0.0 OR o_totalprice > 600000.0))
  UNION ALL
  SELECT 'in_set', 'o_orderstatus',
         (SELECT count(*)::BIGINT FROM orders
          WHERE o_orderstatus IS NOT NULL
            AND o_orderstatus NOT IN ('P', 'F', 'O'))
  UNION ALL
  SELECT 'ref', 'o_custkey',
         (SELECT count(*)::BIGINT FROM orders o
          WHERE o.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
)
SELECT rule, "column", n_violations, n_violations = 0 AS passed FROM r
""",
    description=(
        "Declarative data-quality expectations over orders: not-null + "
        "uniqueness (key), value range (price), enum membership "
        "(status), referential integrity (custkey -> customer) — all "
        "non-referential rules fused into ONE scan's conditional "
        "aggregates, the FK rule one broadcast anti-join; report = "
        "(rule, column, n_violations, passed)"
    ),
    driver_exposed=False,
    eager=True,  # builds/loads a trained artifact or runs a stream at plan time
)
def orders_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contract-checking pass a pipeline runs before publishing.

    operators/expectations.py compiles the rule list; at 100 TB the
    whole non-referential report costs one table read however many
    rules are declared."""
    from iceberg_file_writer_spark.operators.expectations import (
        check_expectations,
    )

    t = load_tables(spark, sf_dir)
    return check_expectations(
        t["orders"],
        [
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("range", "o_totalprice", 0.0, 600000.0),
            ("in_set", "o_orderstatus", ["P", "F", "O"]),
            ("ref", "o_custkey", t["customer"], "c_custkey"),
        ],
    )


@register(
    "pareto_lineitems_3d",
    oracle="""
WITH p AS (
  SELECT DISTINCT l_quantity AS q, l_discount AS d, l_tax AS t
  FROM lineitem
),
sky AS (
  SELECT q, d, t FROM p a
  WHERE NOT EXISTS (
    SELECT 1 FROM p b
    WHERE b.q >= a.q AND b.d >= a.d AND b.t <= a.t
      AND (b.q > a.q OR b.d > a.d OR b.t < a.t)
  )
)
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_discount, l.l_tax
FROM lineitem l
JOIN sky ON sky.q = l.l_quantity AND sky.d = l.l_discount
        AND sky.t = l.l_tax
""",
    description=(
        "3-dimensional skyline (quantity MAX, discount MAX, tax MIN "
        "over lineitem) via the compose+verify plan: per-partition "
        "numpy dominance scans, then one candidate-set pass — no "
        "all-pairs over the input; oracle runs the NOT-EXISTS "
        "definition over the distinct value triples"
    ),
    driver_exposed=False,
)
def pareto_lineitems_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d>2 Pareto front (operators/skyline.py::skyline_nd)."""
    from iceberg_file_writer_spark.operators.skyline import skyline_nd

    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return skyline_nd(
        li,
        [("l_quantity", "max"), ("l_discount", "max"), ("l_tax", "min")],
    )


# --- pairwise Pearson correlation matrix --------------------------------------

CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    sums = [f"count(*)::DOUBLE AS n"]
    for c in CORR_COLS:
        sums.append(f"sum({c}::DOUBLE) AS s_{c}")
        sums.append(f"sum({c}::DOUBLE * {c}::DOUBLE) AS ss_{c}")
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        sums.append(f"sum({a}::DOUBLE * {b}::DOUBLE) AS sx_{a}_{b}")
    selects = []
    for a, b in pairs:
        num = f"(n * sx_{a}_{b} - s_{a} * s_{b})"
        den = (
            f"sqrt((n * ss_{a} - s_{a} * s_{a})"
            f" * (n * ss_{b} - s_{b} * s_{b}))"
        )
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"round({num} / nullif({den}, 0), 6) AS pearson_r FROM sums"
        )
    return (
        "WITH sums AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(selects)
    )


@register(
    "lineitem_numeric_correlations",
    oracle=_corr_oracle(),
    description=(
        "Pairwise Pearson correlation matrix over lineitem's four "
        "numeric measures in ONE aggregate pass (15 shared sums, 6 "
        "pairs) — the column-profiling step feature selection and "
        "anomaly triage start from; closed-form sums make it one "
        "map-side-combined scan, never per-pair passes"
    ),
    driver_exposed=False,
)
def lineitem_numeric_correlations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Which measures move together — the profiling correlation matrix.

    Scale shape: ONE partial-agg'd pass computes all 15 sums (4 sums, 4
    sums of squares, 6 cross-products, 1 count); the 6 correlations are
    a 1-row projection unpivoted via stack. At 100 TB the cost equals a
    single column-pruned scan regardless of how many pairs the matrix
    has (k columns = k(k+3)/2 + 1 aggregates in the same pass), where
    the naive per-pair F.corr() would re-scan the table 6 times.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in CORR_COLS:
        d = F.col(c).cast("double")
        aggs.append(F.sum(d).alias(f"s_{c}"))
        aggs.append(F.sum(d * d).alias(f"ss_{c}"))
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(
                f"sx_{a}_{b}"
            )
        )
    one = li.agg(*aggs)
    rows = []
    for a, b in pairs:
        num = f"(n * sx_{a}_{b} - s_{a} * s_{b})"
        den = (
            f"sqrt((n * ss_{a} - s_{a} * s_{a})"
            f" * (n * ss_{b} - s_{b} * s_{b}))"
        )
        rows.append(
            f"'{a}', '{b}', round({num} / nullif({den}, 0.0D), 6)"
        )
    return one.select(
        F.expr(
            f"stack({len(pairs)}, {', '.join(rows)}) AS "
            "(col_a, col_b, pearson_r)"
        )
    )


# ---------------------------------------------------------------------------
# Exponentially weighted moving average (time-series smoothing).
# ---------------------------------------------------------------------------

# Truncated EWMA: per-day decay 0.5 (exact in binary floating point),
# window of the 7 most recent calendar days. Truncation is what makes the
# operator distributable — the classic EWMA recursion y_t = a*x_t +
# (1-a)*y_{t-1} is a sequential scan, but with decay 0.5 the weight of a
# day 7+ days back is < 1/128 of the newest, so the windowed form is the
# same smoother with a strictly bounded operand per output row.
EWMA_WINDOW_DAYS = 7


@register(
    "event_type_daily_ewma",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT e.event_type, e.day,
       CAST(count(*) AS BIGINT)            AS n_days_in_window,
       round(avg(h.v), 6)                  AS sma7,
       round(sum(h.v * power(0.5, e.day - h.day))
             / sum(power(0.5, e.day - h.day)), 6) AS ewma7
FROM daily e
JOIN daily h
  ON h.event_type = e.event_type
 AND h.day >= e.day - {EWMA_WINDOW_DAYS - 1} AND h.day <= e.day
GROUP BY e.event_type, e.day
""",
    description=(
        "Per-event-type daily EWMA (decay 0.5/day, 7-day truncated "
        "window) plus the simple moving average it sharpens — the "
        "trend-vs-noise smoother dashboards and drift monitors read; "
        "windowed form instead of the sequential recursion so it "
        "distributes"
    ),
    driver_exposed=False,
)
def event_type_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed daily value per event type.

    Scale shape: the raw scan collapses to ONE partial-agg'd daily
    aggregate whose output is calendar-bounded (days x event types) —
    independent of row count — so the 7-day range self-join that
    follows is a broadcast hash join on event_type with the day-range
    as a post-filter over a relation that stays tiny at ANY data
    scale. The EWMA weights are powers of 0.5 over integer day gaps:
    exact doubles, so both engines compute bit-identical weights.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = ensure_cached(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.avg("value").alias("v")
        )
    )
    h = daily.select(
        F.col("event_type").alias("h_et"),
        F.col("day").alias("h_day"),
        F.col("v").alias("h_v"),
    )
    j = daily.drop("v").join(
        F.broadcast(h),
        (F.col("h_et") == F.col("event_type"))
        & (F.col("h_day") >= F.date_sub(F.col("day"), EWMA_WINDOW_DAYS - 1))
        & (F.col("h_day") <= F.col("day")),
    )
    w = F.pow(F.lit(0.5), F.datediff(F.col("day"), F.col("h_day")))
    return j.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_in_window"),
        F.round(F.avg("h_v"), 6).alias("sma7"),
        F.round(F.sum(F.col("h_v") * w) / F.sum(w), 6).alias("ewma7"),
    )


# ---------------------------------------------------------------------------
# Candidate-key / functional-dependency audit (schema profiling).
# ---------------------------------------------------------------------------

# The column sets a modeler would test as keys or grain columns on orders.
KEY_COMBOS: "list[tuple[str, ...]]" = [
    ("o_orderkey",),
    ("o_custkey",),
    ("o_custkey", "o_orderdate"),
    ("o_orderstatus", "o_orderpriority"),
    ("o_totalprice",),
]


def _key_audit_oracle() -> str:
    parts = []
    for combo in KEY_COMBOS:
        cols = ", ".join(combo)
        tup = f"({cols})" if len(combo) > 1 else cols
        parts.append(f"""
SELECT '{",".join(combo)}' AS key_cols,
       CAST(count(*) AS BIGINT)            AS n_rows,
       CAST(count(DISTINCT {tup}) AS BIGINT) AS n_distinct,
       (count(DISTINCT {tup}) = count(*))  AS is_unique,
       round(count(*)::DOUBLE / count(DISTINCT {tup}), 6) AS dup_ratio
FROM orders""")
    return "\nUNION ALL\n".join(parts)


@register(
    "orders_key_candidate_audit",
    oracle=_key_audit_oracle(),
    description=(
        "Candidate-key audit over orders: for each candidate column set, "
        "exact distinct count, uniqueness verdict, and duplication "
        "factor in ONE scan (Spark expands the multi-distinct into a "
        "single Expand+aggregate pass) — the grain check every model "
        "and MERGE key starts from"
    ),
    driver_exposed=False,
)
def orders_key_candidate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which column sets actually identify an order.

    Scale shape: k candidate sets are NOT k scans — all five exact
    distinct counts ride ONE aggregate (Catalyst rewrites multiple
    DISTINCT aggregates into a single Expand(k+1 projections) +
    two-level partial aggregate), then the 1-row result unpivots with
    ``stack`` into the k-row report. The oracle is the straightforward
    k-scan UNION ALL — deliberately a different plan shape.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for i, combo in enumerate(KEY_COMBOS):
        aggs.append(F.countDistinct(*combo).cast("long").alias(f"d{i}"))
    one = orders.agg(*aggs)
    stacked = ", ".join(
        f"'{','.join(combo)}', d{i}" for i, combo in enumerate(KEY_COMBOS)
    )
    return one.select(
        "n_rows",
        F.expr(f"stack({len(KEY_COMBOS)}, {stacked}) AS (key_cols, n_distinct)"),
    ).select(
        "key_cols",
        "n_rows",
        "n_distinct",
        (F.col("n_distinct") == F.col("n_rows")).alias("is_unique"),
        F.round(
            F.col("n_rows").cast("double") / F.col("n_distinct"), 6
        ).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# Time-series diagnostics (round-10 session 3): autocorrelation and lagged
# cross-correlation over the daily event series — the seasonality /
# lead-lag readouts a metrics pipeline runs next to the EWMA smoother.
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7
XCORR_MAX_LAG = 3

# Daily totals in exact integer cents so both engines aggregate
# bit-identically; the corr() runs over the calendar-bounded daily
# relation (days x types — independent of row count), rounded to 6.
def _daily_value_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _DAILY_CENTS_CTE: per-(type, day) total value in
    exact integer cents (per-row round, integer sum — no float
    accumulation anywhere), cached because the ACF and cross-correlation
    entries both consume it."""
    ev = load_tables(spark, sf_dir)["events"]
    return ensure_cached(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("v")
        )
    )


_DAILY_CENTS_CTE = """
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
)"""

_ACF_ORACLE = f"""
WITH {_DAILY_CENTS_CTE},
lags AS (SELECT CAST(lag_days AS BIGINT) AS lag_days FROM range(1, {ACF_MAX_LAG + 1}) t(lag_days))
SELECT d.event_type, l.lag_days,
       CAST(count(*) AS BIGINT)  AS n_pairs,
       round(corr(d.v, h.v), 6)  AS acf
FROM daily d
CROSS JOIN lags l
JOIN daily h
  ON h.event_type = d.event_type AND h.day = d.day - CAST(l.lag_days AS INT)
GROUP BY d.event_type, l.lag_days
"""


@register(
    "event_type_autocorrelation",
    oracle=_ACF_ORACLE,
    description=(
        f"Per-event-type autocorrelation of the daily value series at "
        f"lags 1..{ACF_MAX_LAG} — the seasonality detector behind "
        "anomaly thresholds; ONE partial-agg'd scan, then lag pairing "
        "as a broadcast self-join of the calendar-bounded daily relation"
    ),
    driver_exposed=False,
)
def event_type_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF(1..7) per type. Same scale shape as event_type_daily_ewma:
    the raw scan collapses to a daily aggregate whose size is calendar-
    bounded; the lag join is broadcast; daily sums are exact integer
    cents so the corr inputs are bit-identical across engines."""
    daily = _daily_value_cents(spark, sf_dir)
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag_days")
    )
    h = daily.select(
        F.col("event_type").alias("h_et"),
        F.col("day").alias("h_day"),
        F.col("v").alias("h_v"),
    )
    j = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(h),
            (F.col("h_et") == F.col("event_type"))
            & (
                F.col("h_day")
                == F.date_sub(F.col("day"), F.col("lag_days").cast("int"))
            ),
        )
    )
    return j.groupBy("event_type", "lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.corr("v", "h_v"), 6).alias("acf"),
    )


_XCORR_ORACLE = f"""
WITH {_DAILY_CENTS_CTE},
x AS (SELECT day, v FROM daily WHERE event_type = 'click'),
y AS (SELECT day, v FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT CAST(lag_days AS BIGINT) AS lag_days
         FROM range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG + 1}) t(lag_days))
SELECT l.lag_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(corr(x.v, y.v), 6) AS xcorr
FROM x CROSS JOIN lags l
JOIN y ON y.day = x.day + CAST(l.lag_days AS INT)
GROUP BY l.lag_days
"""


@register(
    "clicks_purchases_crosscorr",
    oracle=_XCORR_ORACLE,
    description=(
        f"Lagged cross-correlation (lags -{XCORR_MAX_LAG}..{XCORR_MAX_LAG}) "
        "between the daily click and purchase value series — the lead-lag "
        "readout that says whether clicks predict purchases days ahead; "
        "same calendar-bounded broadcast shape as the ACF"
    ),
    driver_exposed=False,
)
def clicks_purchases_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr(click(t), purchase(t+lag)) for each lag over the daily
    relation; positive-lag peaks mean clicks lead purchases."""
    daily = _daily_value_cents(spark, sf_dir)
    x = daily.where(F.col("event_type") == "click").select(
        F.col("day").alias("x_day"), F.col("v").alias("x_v")
    )
    y = daily.where(F.col("event_type") == "purchase").select(
        F.col("day").alias("y_day"), F.col("v").alias("y_v")
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag_days")
    )
    j = x.crossJoin(F.broadcast(lags)).join(
        F.broadcast(y),
        F.col("y_day") == F.expr("date_add(x_day, CAST(lag_days AS INT))"),
    )
    return j.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.corr("x_v", "y_v"), 6).alias("xcorr"),
    )


# ---------------------------------------------------------------------------
# Approximate functional-dependency audit (round-10 session 3): the
# dependency-discovery sibling of orders_key_candidate_audit. For each
# candidate FD A -> B the g3 metric: the minimum fraction of rows that
# would have to be removed for the dependency to hold exactly
# (rows - sum over determinant values of the modal dependent count).
# ---------------------------------------------------------------------------

# (table, determinant, dependent) triples a modeler would test. The
# nation row holds exactly (key determinant) — the audit must report
# g3 = 0 for it; the others are approximate.
FD_CANDIDATES: "list[tuple[str, str, str]]" = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("supplier", "s_nationkey", "s_name"),
]


def _fd_audit_oracle() -> str:
    parts = []
    for table, det, dep in FD_CANDIDATES:
        parts.append(f"""
SELECT '{table}: {det} -> {dep}' AS fd,
       CAST(sum(cnt) AS BIGINT)           AS n_rows,
       CAST(count(*) AS BIGINT)           AS n_determinants,
       CAST(sum(cnt) - sum(mx) AS BIGINT) AS n_violations,
       (sum(cnt) = sum(mx))               AS holds,
       round((sum(cnt) - sum(mx))::DOUBLE / sum(cnt), 6) AS g3_rate
FROM (
  SELECT {det}, max(c) AS mx, sum(c) AS cnt
  FROM (SELECT {det}, {dep}, count(*) AS c FROM {table} GROUP BY 1, 2)
  GROUP BY {det}
)""")
    return "\nUNION ALL\n".join(parts)


@register(
    "fd_violation_audit",
    oracle=_fd_audit_oracle(),
    description=(
        "Approximate functional-dependency audit: for each candidate "
        "A -> B, the g3 violation metric (minimum row fraction to "
        "remove for the FD to hold) via a two-level partial-agg'd "
        "count — the dependency-discovery profiling a schema modeler "
        "runs before normalizing a 100 TB table"
    ),
    driver_exposed=False,
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3 per candidate FD.

    Scale shape: each candidate is exactly two hash aggregates — (A, B)
    counts (map-side combined, output bounded by the PAIR domain, not
    the row count) then per-A max/sum — plus a 1-row rollup. Candidates
    on different tables scan independently; nothing is row-scaled past
    the first partial aggregation.
    """
    t = load_tables(spark, sf_dir)
    outs = []
    for table, det, dep in FD_CANDIDATES:
        pairs = t[table].groupBy(det, dep).agg(F.count(F.lit(1)).alias("c"))
        per_det = pairs.groupBy(det).agg(
            F.max("c").alias("mx"), F.sum("c").alias("cnt")
        )
        outs.append(
            per_det.agg(
                F.lit(f"{table}: {det} -> {dep}").alias("fd"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_determinants"),
                (F.sum("cnt") - F.sum("mx")).cast("long").alias("n_violations"),
                (F.sum("cnt") == F.sum("mx")).alias("holds"),
                F.round(
                    (F.sum("cnt") - F.sum("mx")).cast("double") / F.sum("cnt"), 6
                ).alias("g3_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Benford's-law audit (round-10 session 3): first-digit distribution of a
# monetary column vs the Benford expectation — the classic anomaly /
# fabricated-data screen an audit pipeline runs over financial facts.
# ---------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, inlined as the same literals on both
# engines so the expectation can never disagree.
_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {_BENFORD_P[d]!r}" for d in range(1, 10)
    )
    return f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1
),
counts AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT sum(n) AS t FROM counts)
SELECT c.d AS first_digit, c.n AS n_values,
       round(c.n::DOUBLE / t.t, 6) AS observed_p,
       round((CASE c.d {cases} END)::DOUBLE, 6) AS benford_p,
       round(power(c.n::DOUBLE / t.t - (CASE c.d {cases} END)::DOUBLE, 2)
             / ((CASE c.d {cases} END)::DOUBLE), 8) AS chi2_term
FROM counts c CROSS JOIN tot t
"""


@register(
    "orders_benford_audit",
    oracle=_benford_oracle(),
    description=(
        "Benford's-law first-digit audit of order totals: observed vs "
        "expected digit distribution with per-digit chi-square terms — "
        "the fabricated-data / anomaly screen auditors run over "
        "monetary columns; ONE partial-agg'd scan, 9 output rows at any "
        "scale"
    ),
    driver_exposed=False,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit law screen.

    Scale shape: the scan collapses to a 9-group aggregate (map-side
    combined); the total joins back as a broadcast 1-row relation. The
    Benford expectations are Python-computed literals inlined
    identically into both plans.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    # 9 rows at any scale — cached so the grand total derives from the
    # aggregate instead of re-scanning orders a second time.
    counts = ensure_cached(
        digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("t"))
    expected = F.create_map(
        *[x for d in range(1, 10) for x in (F.lit(d), F.lit(_BENFORD_P[d]))]
    )[F.col("d")]
    obs = F.col("n").cast("double") / F.col("t")
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        F.col("n").alias("n_values"),
        F.round(obs, 6).alias("observed_p"),
        F.round(expected, 6).alias("benford_p"),
        F.round(F.pow(obs - expected, 2) / expected, 8).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection (round-10 session 3). The textbook recursion
# S_t = max(0, S_{t-1} + (x_t - target - slack)) is sequential; the
# distributed form used here is the classic identity
#   S_t = R_t - min(R_0..R_t),  R_t = running sum of (x_t - target - slack)
# — a cumulative-sum window plus a running-min window over the
# calendar-bounded daily relation, no recursion anywhere.
# ---------------------------------------------------------------------------

CUSUM_SLACK_CENTS = 50  # k: slack below which deviation is noise
CUSUM_ALARM_CENTS = 2000  # h: alarm threshold on the statistic


@register(
    "event_type_cusum_drift",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT))::DOUBLE
                    / count(*), 0) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
target AS (
  SELECT event_type, CAST(round(avg(cents), 0) AS BIGINT) AS mu
  FROM daily GROUP BY event_type
),
r AS (
  SELECT d.event_type, d.day,
         sum(d.cents - t.mu - {CUSUM_SLACK_CENTS})
           OVER (PARTITION BY d.event_type ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt
  FROM daily d JOIN target t ON t.event_type = d.event_type
),
s AS (
  SELECT event_type, day,
         rt - least(0, min(rt) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS st
  FROM r
)
SELECT event_type, day, CAST(st AS BIGINT) AS cusum_cents,
       (st > {CUSUM_ALARM_CENTS}) AS alarm
FROM s
""",
    description=(
        "CUSUM upward-drift statistic per event type over the daily "
        "mean-value series (integer cents) with alarm flags — the "
        "change-point monitor; computed via the distributed identity "
        "S_t = R_t - min(R_<=t) (cumsum + running-min windows over the "
        "calendar-bounded daily relation), never the sequential "
        "recursion"
    ),
    driver_exposed=False,
)
def event_type_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift detection without recursion.

    Scale shape: ONE partial-agg'd scan collapses events to the daily
    relation (calendar-bounded); the per-type target is a broadcast
    join; both windows run per-type over that tiny relation. Integer
    cents end-to-end, so the running sums are exact in both engines.
    """
    from pyspark.sql import Window

    # mean daily cents via exact integer sums and ONE double division —
    # round(avg(value)*100) would ride a float accumulation whose order
    # (and therefore half-boundary rounding) differs between engines
    ev = load_tables(spark, sf_dir)["events"]
    daily = ensure_cached(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.round(
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                0,
            )
            .cast("long")
            .alias("cents")
        )
    )
    target = daily.groupBy("event_type").agg(
        F.round(F.avg("cents"), 0).cast("long").alias("mu")
    )
    r = daily.join(F.broadcast(target), "event_type").withColumn(
        "rt",
        F.sum(
            F.col("cents") - F.col("mu") - F.lit(CUSUM_SLACK_CENTS)
        ).over(
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # the min INCLUDES the current row (and 0, standing in for R_0):
    # S_t = R_t - min(0, R_1..R_t) is the exact prefix-min form of the
    # recursion S_t = max(0, S_{t-1} + d_t) — excluding the current row
    # would let the statistic go negative
    run_min = F.min("rt").over(
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = F.col("rt") - F.least(F.lit(0), run_min)
    return r.select(
        "event_type",
        "day",
        st.cast("long").alias("cusum_cents"),
        (st > CUSUM_ALARM_CENTS).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (round-10 session 3): recency/frequency/monetary
# quintile scores per purchasing user, rolled up to segment cells.
# DELIBERATELY NOT a global ntile (customer_balance_deciles' scale note:
# a corpus-wide rank is a single-partition sort) — scores come from the
# two-phase bucket-ledger pattern: per-user metrics quantize into a
# bounded domain, a tiny per-value ledger carries cumulative user counts,
# and the quintile index is floor(5 * users_below / total) computed on
# the ledger and broadcast back. Exact, deterministic, distributed.
# ---------------------------------------------------------------------------

RFM_MONETARY_BUCKET_CENTS = 1000  # $10 buckets bound the monetary domain


def _rfm_score_sql(metric: str, higher_is_better: bool) -> str:
    """Ledger CTE pair for one metric: per-value user counts with the
    cumulative count of users at strictly-smaller values, then the
    quintile score. Works on the QUANTIZED value domain (bounded), so
    the window is ledger-sized at any corpus size."""
    direction = "" if higher_is_better else "5 + 1 -"
    return f"""
  SELECT {metric} AS v,
         CAST({direction} (least(4, floor(5.0 * COALESCE(sum(n) OVER (
             ORDER BY {metric} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / (SELECT sum(n) FROM {metric}_ledger))) + 1) AS BIGINT) AS score
  FROM {metric}_ledger
"""


_RFM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         date_diff('day', CAST(max(ts) AS DATE),
                   (SELECT CAST(max(ts) AS DATE) FROM events
                    WHERE event_type = 'purchase')) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(floor(sum(CAST(round(value * 100, 0) AS BIGINT))
                    / {RFM_MONETARY_BUCKET_CENTS}.0) AS BIGINT) AS mbucket,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
recency_days_ledger AS (SELECT recency_days, count(*) AS n FROM u GROUP BY 1),
frequency_ledger AS (SELECT frequency, count(*) AS n FROM u GROUP BY 1),
mbucket_ledger AS (SELECT mbucket, count(*) AS n FROM u GROUP BY 1),
r_scores AS ({_rfm_score_sql("recency_days", False)}),
f_scores AS ({_rfm_score_sql("frequency", True)}),
m_scores AS ({_rfm_score_sql("mbucket", True)})
SELECT r.score AS r_score, f.score AS f_score, m.score AS m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       round(avg(u.recency_days), 6)   AS avg_recency_days,
       round(avg(u.frequency), 6)      AS avg_frequency,
       round(sum(u.monetary_cents)::DOUBLE / count(*) / 100, 6)
                                       AS avg_monetary
FROM u
JOIN r_scores r ON r.v = u.recency_days
JOIN f_scores f ON f.v = u.frequency
JOIN m_scores m ON m.v = u.mbucket
GROUP BY 1, 2, 3
"""


@register(
    "user_rfm_segmentation",
    oracle=_RFM_ORACLE,
    description=(
        "RFM segmentation: recency/frequency/monetary quintile scores "
        "per purchasing user rolled up to segment cells — computed via "
        "the two-phase bucket-ledger pattern (quantized value domains, "
        "ledger-sized windows, broadcast score joins), NEVER a global "
        "ntile; the distributed form of the classic marketing segmenter"
    ),
    driver_exposed=False,
)
def user_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide quantile scores without a corpus-wide sort.

    Scale shape: the only corpus-sized stage is the per-user aggregate
    (user-keyed shuffle). Each metric's score comes from a per-distinct-
    value ledger — recency is calendar-bounded, frequency is bounded by
    per-user activity, monetary quantizes into $10 buckets — so the
    cumulative window runs over ledger-sized relations and scores join
    back broadcast. Same armor class as token_budget_sample's ledger
    and event_value_auc's per-distinct-score window.
    """
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"].where(
        F.col("event_type") == "purchase"
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("anchor"))
    u = ensure_cached(
        ev.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(cents).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("anchor"), F.col("last_day")).alias(
                "recency_days"
            ),
            "frequency",
            F.floor(
                F.col("monetary_cents") / float(RFM_MONETARY_BUCKET_CENTS)
            )
            .cast("long")
            .alias("mbucket"),
            "monetary_cents",
        )
    )

    def scores(metric: str, higher_is_better: bool):
        ledger = u.groupBy(metric).agg(F.count(F.lit(1)).alias("n"))
        total = ledger.agg(F.sum("n").alias("t"))
        w = Window.orderBy(metric).rowsBetween(Window.unboundedPreceding, -1)
        below = F.coalesce(F.sum("n").over(w), F.lit(0))
        base = F.least(F.lit(4), F.floor(F.lit(5.0) * below / F.col("t"))) + 1
        score = base if higher_is_better else F.lit(5 + 1) - base
        return ledger.crossJoin(F.broadcast(total)).select(
            F.col(metric).alias("v"), score.cast("long").alias("score")
        )

    r = scores("recency_days", False).withColumnsRenamed(
        {"v": "r_v", "score": "r_score"}
    )
    f_ = scores("frequency", True).withColumnsRenamed(
        {"v": "f_v", "score": "f_score"}
    )
    m = scores("mbucket", True).withColumnsRenamed(
        {"v": "m_v", "score": "m_score"}
    )
    return (
        u.join(F.broadcast(r), F.col("recency_days") == F.col("r_v"))
        .join(F.broadcast(f_), F.col("frequency") == F.col("f_v"))
        .join(F.broadcast(m), F.col("mbucket") == F.col("m_v"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("recency_days"), 6).alias("avg_recency_days"),
            F.round(F.avg("frequency"), 6).alias("avg_frequency"),
            F.round(
                F.sum("monetary_cents").cast("double") / F.count(F.lit(1)) / 100,
                6,
            ).alias("avg_monetary"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-square independence test (round-10 session 3): are order priority
# and order status independent? The classic categorical association test,
# as pure aggregation: observed cell counts vs expected = row*col/total.
# ---------------------------------------------------------------------------


@register(
    "orders_priority_status_chi2",
    oracle="""
WITH obs AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
rows_t AS (SELECT pri, sum(o) AS r FROM obs GROUP BY pri),
cols_t AS (SELECT st, sum(o) AS c FROM obs GROUP BY st),
tot AS (SELECT sum(o) AS t FROM obs)
SELECT obs.pri, obs.st, obs.o AS observed,
       round(r.r * c.c / t.t::DOUBLE, 6) AS expected,
       round(power(obs.o - r.r * c.c / t.t::DOUBLE, 2)
             / (r.r * c.c / t.t::DOUBLE), 8) AS chi2_term
FROM obs
JOIN rows_t r ON r.pri = obs.pri
JOIN cols_t c ON c.st = obs.st
CROSS JOIN tot t
""",
    description=(
        "Chi-square independence test of order priority vs order "
        "status: per-cell observed counts, expected counts under "
        "independence (row x col / total), and chi-square terms — the "
        "classic categorical association test as ONE contingency "
        "aggregate plus broadcast marginals"
    ),
    driver_exposed=False,
)
def orders_priority_status_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association as pure aggregation.

    Scale shape: the scan collapses to the contingency table (bounded
    by the category-pair domain — priorities x statuses); marginals and
    the grand total derive from the CACHED table and join back
    broadcast. All counts exact integers; the only floats are the final
    expected/term divisions, identical single operations per cell in
    both engines.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    obs = ensure_cached(
        orders.groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rows_t = obs.groupBy("pri").agg(F.sum("o").alias("r"))
    cols_t = obs.groupBy("st").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("t"))
    exp = F.col("r") * F.col("c") / F.col("t").cast("double")
    return (
        obs.join(F.broadcast(rows_t), "pri")
        .join(F.broadcast(cols_t), "st")
        .crossJoin(F.broadcast(tot))
        .select(
            "pri",
            "st",
            F.col("o").alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(F.pow(F.col("o") - exp, 2) / exp, 8).alias("chi2_term"),
        )
    )
