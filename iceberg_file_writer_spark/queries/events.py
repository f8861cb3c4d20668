"""Time-series / event-stream query corpus over the ``events`` table.

The ``events`` table is the driver-provided stand-in for the reference's
stream input (entity column ``user_id``, event-time ``ts`` — the same
*events-by-entity-by-time* shape as the reference's Location records,
reference main.go:50-51). These queries are the batch duals of the
streaming operators in ``iceberg_file_writer_spark.streaming``; each is
SQL-expressible so the DuckDB oracle checks it exactly.

Scale notes:
- Sessionization and as-of join are window functions partitioned by
  ``user_id`` — one shuffle on the entity key, then linear per-partition
  work; no self-join blowup. This is the formulation that survives 100 TB
  (the alternative, a range self-join, is quadratic per user).
- The as-of join is the union+last(ignorenulls) formulation: both streams
  are unioned, ordered by (ts, kind, event_id) within each user, and the
  most recent left-side row is carried forward — a single window pass,
  identical semantics to ``pd.merge_asof`` with strict inequality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables

SESSION_GAP_SECONDS = 1800


@register(
    "pruned_time_range_scan",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE user_id = 7
  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
""",
    description="The reference layout's flagship read: entity + time-range pruned scan (SURVEY §7.1)",
    driver_exposed=False,  # r12 rotation: ceded per tenure (class continuity kept)
)
def pruned_time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(
            (F.col("user_id") == 7)
            & (F.col("ts") >= F.to_timestamp(F.lit("2024-01-10")))
            & (F.col("ts") < F.to_timestamp(F.lit("2024-01-20")))
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "events_hourly_stats",
    oracle="""
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*)   AS n_events,
       sum(value) AS total_value,
       avg(value) AS avg_value
FROM events
GROUP BY 1, 2
""",
    description="Tumbling-window aggregation (batch dual of streaming window agg)",
    # Round-6 rotation: slot ceded to the round-6 promotions
    # (driver-green in earlier rounds; still benched + pytest-
    # oracle-checked every session).
    driver_exposed=False,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.avg("value").alias("avg_value"),
        )
    )


@register(
    "events_sliding_stats",
    oracle="""
WITH base AS (
  SELECT (epoch_us(ts) // (1800 * 1000000)) * 1800 AS s1, event_type, value
  FROM events
), assigned AS (
  SELECT unnest([s1, s1 - 1800]) AS s, event_type, value FROM base
)
SELECT TIMESTAMP '1970-01-01 00:00:00' + s * INTERVAL 1 SECOND AS window_start,
       TIMESTAMP '1970-01-01 00:00:00' + (s + 3600) * INTERVAL 1 SECOND AS window_end,
       event_type,
       count(*)   AS n_events,
       sum(value) AS total_value
FROM assigned
GROUP BY 1, 2, 3
""",
    description="Sliding windows: 1-hour window every 30 minutes — each event lands in exactly two overlapping windows (batch dual of the streaming slide)",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def events_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "user_sessions",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_SECONDS} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
  FROM flagged
)
SELECT user_id,
       session_seq,
       min(ts)  AS session_start,
       max(ts)  AS session_end,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_seq
""",
    description="Sessionization: gaps-and-islands via lag + running sum, 30-min gap",
    # Round-7 rotation (fifth): driver-green 5-6 consecutive rounds; ceded
    # its slot to the round-6 flagship promotions + persisted-ANN probes
    # (class keeps an exposed sibling — see BASELINE.md rotation table).
    driver_exposed=False,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    return (
        t["events"]
        .select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts"))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_seq",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "purchase_asof_click",
    oracle="""
WITH stream AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind
  FROM events
  WHERE event_type IN ('purchase', 'click')
), carried AS (
  SELECT user_id, ts, event_id, kind,
         last_value(CASE WHEN kind = 1 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
         last_value(CASE WHEN kind = 1 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
  FROM stream
)
SELECT event_id AS purchase_id,
       user_id,
       ts AS purchase_ts,
       click_id,
       click_ts
FROM carried
WHERE kind = 0
""",
    description="As-of join: each purchase matched to the user's most recent strictly-earlier click",
    # Ceded in the ninth rotation (round 10, r1-r8 tenure); the as-of
    # shape stays pytest-oracle-checked and lives on in cohort machinery.
    driver_exposed=False,
)
def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Union + carry-forward window: one shuffle on user_id, linear scan per
    # partition. Purchases sort before clicks at an equal ts (kind 0 < 1) and
    # the frame ends at 1 PRECEDING, so a same-timestamp click never matches —
    # strict "before" semantics, the classic as-of contract.
    t = load_tables(spark, sf_dir)
    stream = (
        t["events"]
        .where(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.last(F.when(F.col("kind") == 1, F.col("event_id")), ignorenulls=True).over(w)
    click_ts = F.last(F.when(F.col("kind") == 1, F.col("ts")), ignorenulls=True).over(w)
    return (
        stream.withColumn("click_id", click_id)
        .withColumn("click_ts", click_ts)
        .where(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_id",
            "click_ts",
        )
    )


@register(
    "event_props_extraction",
    oracle="""
SELECT event_type,
       count(*)                                         AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
FROM events
GROUP BY event_type
""",
    description="Semi-structured extraction: JSON property pulled and aggregated",
    # Round-8 rotation (sixth): driver-green 7 consecutive rounds;
    # ceded its slot to the restored/promoted classes (class keeps an
    # exposed sibling — see BASELINE.md sixth-rotation table).
    driver_exposed=False,
)
def event_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.avg(k).alias("avg_k"),
        )
    )


@register(
    "user_event_gaps",
    # lag-window coverage is carried by the richer user_sessions entry;
    # ceded its driver slot to the round-2 operator classes (50-entry cap)
    driver_exposed=False,
    oracle="""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id,
       count(gap_us)                  AS n_gaps,
       avg(gap_us / 1000000.0)        AS avg_gap_sec,
       max(gap_us / 1000000.0)        AS max_gap_sec
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
    description="Lag analytics: inter-event arrival gaps per entity",
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        t["events"]
        .select("user_id", gap_us.alias("gap_us"))
        .where(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.avg(F.col("gap_us") / 1_000_000.0).alias("avg_gap_sec"),
            F.max(F.col("gap_us") / 1_000_000.0).alias("max_gap_sec"),
        )
    )


@register(
    "top_purchasers",
    oracle="""
SELECT user_id,
       count(*)   AS n_purchases,
       sum(value) AS total_spent
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY total_spent DESC, user_id
LIMIT 10
""",
    description="Global top-k: TakeOrderedAndProject, no full sort",
    driver_exposed=False,  # r12 rotation: ceded per tenure (class continuity kept)
)
def top_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"), F.sum("value").alias("total_spent"))
        .orderBy(F.desc("total_spent"), "user_id")
        .limit(10)
    )


@register(
    "event_value_quantiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS median_value,
       quantile_cont(value, 0.9) AS p90_value
FROM events
GROUP BY event_type
""",
    description="Exact continuous quantiles per event type",
    # Ceded its driver slot round 4; the percentile class stays covered by
    # approx_value_percentiles.
    driver_exposed=False,
)
def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("median_value"),
            F.percentile("value", 0.9).alias("p90_value"),
        )
    )


@register(
    "events_hourly_gapfill",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, avg(value) AS avg_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
              FROM bounds) g
),
j AS (
  SELECT g.event_type, g.hour, h.n_events, h.avg_value
  FROM grid g LEFT JOIN hourly h USING (event_type, hour)
),
grp AS (
  SELECT *, count(avg_value) OVER (PARTITION BY event_type ORDER BY hour) AS fg
  FROM j
)
SELECT event_type, hour,
       coalesce(n_events, 0) AS n_events,
       avg_value,
       max(avg_value) OVER (PARTITION BY event_type, fg) AS filled_avg_value
FROM grp
""",
    description=(
        "Time-series resample + gap-fill: events resampled to a dense "
        "hourly grid per event type (empty hours materialized with "
        "n_events=0), hourly avg forward-filled from the last observed "
        "hour — the hypertable-style downsampling shape"
    ),
    driver_exposed=False,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time-grid resampling with forward fill.

    Scale shape: the observed side is one partial-agg'd groupBy; the
    grid is |event types| x |hours| — generated from a broadcast scalar
    bounds row + sequence/explode, orders smaller than the event corpus,
    and never shuffles the corpus to build. Forward fill uses the
    portable fill-group trick (running count of non-nulls, then max
    within (type, group)) instead of last(ignorenulls) so the oracle
    runs the identical computation. The ffill window partitions by
    event_type — at 100 TB with unbounded history you'd bound it by
    (type, day) with boundary stitching; the per-type hourly grid here
    is bounded by calendar time, not corpus size.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    j = grid.join(hourly, ["event_type", "hour"], "left")
    wff = Window.partitionBy("event_type").orderBy("hour")
    wgrp = Window.partitionBy("event_type", "fg")
    return (
        j.withColumn("fg", F.count("avg_value").over(wff))
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            "avg_value",
            F.max("avg_value").over(wgrp).alias("filled_avg_value"),
        )
    )


FUNNEL_HORIZON_US = 3600 * 1_000_000  # each step within 1 hour of the previous


@register(
    "funnel_view_click_purchase",
    oracle=f"""
WITH keyed AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         printf('%020d-%012d', epoch_us(ts), event_id) AS ordk
  FROM events
),
nexts AS (
  SELECT user_id, event_type, us, ordk,
         min(CASE WHEN event_type = 'click' THEN ordk END) OVER w AS next_click_key,
         min(CASE WHEN event_type = 'purchase' THEN ordk END) OVER w AS next_purchase_key
  FROM keyed
  WINDOW w AS (PARTITION BY user_id ORDER BY ordk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
views AS (
  SELECT user_id, us AS view_us, next_click_key
  FROM nexts WHERE event_type = 'view'
),
clicks AS (
  SELECT user_id, ordk, us AS click_us, next_purchase_key
  FROM nexts WHERE event_type = 'click'
),
chained AS (
  SELECT v.user_id, v.view_us, c.click_us,
         CAST(string_split(c.next_purchase_key, '-')[1] AS BIGINT) AS purchase_us
  FROM views v
  LEFT JOIN clicks c
    ON c.user_id = v.user_id AND c.ordk = v.next_click_key
)
SELECT user_id,
       count(*) AS n_views,
       sum(CASE WHEN click_us IS NOT NULL
                 AND click_us <= view_us + {FUNNEL_HORIZON_US}
                THEN 1 ELSE 0 END)::BIGINT AS n_view_click,
       sum(CASE WHEN click_us IS NOT NULL
                 AND click_us <= view_us + {FUNNEL_HORIZON_US}
                 AND purchase_us IS NOT NULL
                 AND purchase_us <= click_us + {FUNNEL_HORIZON_US}
                THEN 1 ELSE 0 END)::BIGINT AS n_full_funnel
FROM chained
GROUP BY user_id
""",
    description=(
        "Funnel analysis: per-user view -> click -> purchase conversions, "
        "each step the strictly-next matching event within 1 hour — "
        "sequence matching via running-min order keys over a descending "
        "event-time window, no self-join of the event stream"
    ),
    driver_exposed=False,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel over the event stream.

    The classic funnel needs, for every step-N event, the *earliest*
    step-N+1 event strictly after it. Expressed as a running min of a
    fixed-width (ts, event_id) order key over a DESCENDING per-user
    window (rows strictly above = events strictly after), each step is
    one window pass over the already-partitioned stream — no per-step
    self-join of the corpus, no explosion on hot users. The chain then
    resolves with ONE equi-join of view rows to their matched click row
    (user + order key). Deterministic under timestamp ties because the
    order key includes event_id — the oracle replays it exactly.
    """
    t = load_tables(spark, sf_dir)
    ordk = F.format_string("%020d-%012d", F.unix_micros(F.col("ts")), F.col("event_id"))
    keyed = t["events"].select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        ordk.alias("ordk"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ordk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nexts = keyed.select(
        "user_id",
        "event_type",
        "us",
        "ordk",
        F.min(F.when(F.col("event_type") == "click", F.col("ordk"))).over(w).alias(
            "next_click_key"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ordk"))).over(w).alias(
            "next_purchase_key"
        ),
    )
    # both sides derive from `nexts`: rename the join key on one side so
    # resolution never leans on dataset-id lineage (self-join ambiguity)
    views = nexts.where(F.col("event_type") == "view").select(
        "user_id", F.col("us").alias("view_us"), "next_click_key"
    )
    clicks = nexts.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user_id"),
        F.col("ordk").alias("click_key"),
        F.col("us").alias("click_us"),
        F.split(F.col("next_purchase_key"), "-").getItem(0).cast("long").alias(
            "purchase_us"
        ),
    )
    chained = views.join(
        clicks,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("next_click_key") == F.col("click_key")),
        "left",
    ).select("user_id", "view_us", "click_us", "purchase_us")
    click_ok = F.col("click_us").isNotNull() & (
        F.col("click_us") <= F.col("view_us") + FUNNEL_HORIZON_US
    )
    full_ok = (
        click_ok
        & F.col("purchase_us").isNotNull()
        & (F.col("purchase_us") <= F.col("click_us") + FUNNEL_HORIZON_US)
    )
    return chained.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(click_ok.cast("long")).alias("n_view_click"),
        F.sum(full_ok.cast("long")).alias("n_full_funnel"),
    )


HIST_BUCKETS = 20


@register(
    "event_value_histogram",
    oracle=f"""
WITH bounds AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
),
bucketed AS (
  SELECT e.event_type,
         CAST(least(floor((e.value - b.lo) * {HIST_BUCKETS} / (b.hi - b.lo)),
                    {HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
         b.lo, b.hi
  FROM events e CROSS JOIN bounds b
)
SELECT event_type, bucket,
       round(lo + bucket * (hi - lo) / {HIST_BUCKETS}, 6)       AS bucket_lo,
       round(lo + (bucket + 1) * (hi - lo) / {HIST_BUCKETS}, 6) AS bucket_hi,
       count(*) AS n
FROM bucketed
GROUP BY event_type, bucket, lo, hi
""",
    description=(
        f"Equi-width histogram: {HIST_BUCKETS} value buckets per event type "
        "over data-derived bounds (broadcast scalar min/max), identical "
        "bucket arithmetic on both engines"
    ),
    driver_exposed=False,
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partial-agg pass for bounds (broadcast scalar row), one
    partial-agg pass for the bucket counts — the corpus is scanned twice
    and shuffled once on (event_type, bucket), never on raw rows."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.floor(
            (F.col("value") - F.col("lo")) * HIST_BUCKETS / (F.col("hi") - F.col("lo"))
        ),
        F.lit(HIST_BUCKETS - 1),
    ).cast("long")
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select("event_type", bucket.alias("bucket"), "lo", "hi")
        .groupBy("event_type", "bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            F.round(
                F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / HIST_BUCKETS,
                6,
            ).alias("bucket_lo"),
            F.round(
                F.col("lo")
                + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / HIST_BUCKETS,
                6,
            ).alias("bucket_hi"),
            "n",
        )
    )


ANOMALY_TRAIL = 24  # trailing observed hours in the baseline window
ANOMALY_Z = 2.0


@register(
    "events_hourly_anomalies",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour, n_events,
         avg(n_events)         OVER w AS mu,
         stddev_samp(n_events) OVER w AS sigma,
         count(*)              OVER w AS n_trail
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n_events,
       round((n_events - mu) / sigma, 6) AS zscore,
       (abs(round((n_events - mu) / sigma, 6)) >= {ANOMALY_Z}) AS is_anomaly
FROM scored
WHERE n_trail = {ANOMALY_TRAIL} AND sigma > 0
""",
    description=(
        f"Time-series anomaly flags: per-(event type, hour) volume z-score "
        f"against the trailing {ANOMALY_TRAIL} observed hours (rows frame "
        "excluding the current hour), |z| >= 2 flagged; scores rounded "
        "before thresholding for cross-engine determinism"
    ),
    driver_exposed=False,
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly counts are one partial-agg'd groupBy; the baseline is a
    bounded ROWS frame over the per-type hourly series (tiny relative to
    the corpus — the window shuffles hours, not events)."""
    t = load_tables(spark, sf_dir)
    hourly = (
        t["events"]
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-ANOMALY_TRAIL, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.avg("n_events").over(w).alias("mu"),
        F.stddev_samp("n_events").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_trail"),
    )
    z = F.round((F.col("n_events") - F.col("mu")) / F.col("sigma"), 6)
    return (
        scored.where((F.col("n_trail") == ANOMALY_TRAIL) & (F.col("sigma") > 0))
        .select(
            "event_type",
            "hour",
            "n_events",
            z.alias("zscore"),
            (F.abs(z) >= ANOMALY_Z).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Conversion-latency percentiles (round 5).
# ---------------------------------------------------------------------------

CONV_WINDOW_SECS = 3600


@register(
    "conversion_latency_percentiles",
    oracle="\nUNION ALL\n".join(
        f"""SELECT hour, {q}::DOUBLE AS quantile,
       quantile_disc(delay_secs, {q}) AS approx_value
FROM (
  SELECT CAST(hour(ts) AS BIGINT) AS hour,
         (epoch_us(ts) - lastview) // 1000000 AS delay_secs
  FROM (
    SELECT ts, event_type, epoch_us(ts) AS eu,
           max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastview
    FROM events
  )
  WHERE event_type = 'purchase' AND lastview IS NOT NULL
    AND (epoch_us(ts) - lastview) // 1000000 BETWEEN 0 AND {CONV_WINDOW_SECS}
) GROUP BY hour"""
        for q in (0.5, 0.9, 0.99)
    ),
    description=(
        "View-to-purchase conversion latency p50/p90/p99 by hour of day — "
        "the as-of delay distribution; GK sketch exact at the oracle "
        "accuracy window so quantile_disc matches"
    ),
    # Registered mid-round 5; driver surface is at its 50-entry cap, so
    # pytest-oracle + bench coverage until a future rotation.
    driver_exposed=False,
)
def conversion_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long after the last view does a purchase land.

    Scale shape: one user-keyed window pass carries the most recent view
    timestamp forward (running max over the preceding frame — no
    self-join of the event stream), then per-hour GK percentile sketches
    partial-aggregate map-side. Delays are integer seconds, so the
    sketch's exact-window oracle equality is bitwise.
    """
    from iceberg_file_writer_spark.queries.relational_ext import (
        _PCT_EXACT_ORACLE_ACCURACY,
        approx_percentiles,
    )

    ev = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastview = F.max(
        F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    ).over(w)
    delays = (
        ev.select("ts", "event_type", lastview.alias("lastview"))
        .where(
            (F.col("event_type") == "purchase") & F.col("lastview").isNotNull()
        )
        .select(
            F.hour("ts").cast("long").alias("hour"),
            F.expr("(unix_micros(ts) - lastview) div 1000000").alias("delay_secs"),
        )
        .where(F.col("delay_secs").between(0, CONV_WINDOW_SECS))
    )
    return approx_percentiles(
        delays,
        "delay_secs",
        ["hour"],
        qs=(0.5, 0.9, 0.99),
        accuracy=_PCT_EXACT_ORACLE_ACCURACY,
    )


@register(
    "user_longest_streak",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
),
streaks AS (
  SELECT user_id, count(*) AS streak_days, min(d) AS streak_start
  FROM islands GROUP BY user_id, island
)
SELECT user_id, streak_days, streak_start FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY streak_days DESC, streak_start) AS rn
  FROM streaks
) WHERE rn = 1
""",
    description=(
        "Longest consecutive-day activity streak per user (gaps-and-"
        "islands): distinct active days, date-minus-row_number island "
        "keys, per-island counts, best streak with deterministic "
        "earliest-start tie-break"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gaps-and-islands shape over the events stream.

    Scale shape: the distinct-days relation is user-keyed (partial-agg'd
    map-side, at most users x days rows), every window partitions on
    user_id (the table's own partition key — one exchange, shared by the
    island numbering and the final best-streak rank), and the island
    aggregate is co-partitioned behind it. Nothing corpus-sized after
    the distinct.
    """
    ev = load_tables(spark, sf_dir)["events"]
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wd = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(wd))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_days"), F.min("d").alias("streak_start")
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


@register(
    "purchase_asof_next_error",
    oracle="""
WITH stream AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS kind
  FROM events
  WHERE event_type IN ('purchase', 'error')
), carried AS (
  SELECT user_id, ts, event_id, kind,
         first_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS err_id,
         first_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS err_ts
  FROM stream
)
SELECT event_id AS purchase_id,
       user_id,
       ts AS purchase_ts,
       CASE WHEN err_ts <= ts + INTERVAL 1 HOUR THEN err_id END AS next_error_id,
       CASE WHEN err_ts <= ts + INTERVAL 1 HOUR THEN err_ts END AS next_error_ts
FROM carried
WHERE kind = 1
""",
    description=(
        "Forward as-of join: each purchase matched to the user's first "
        "strictly-later error within 1 hour (null if none) — the "
        "look-ahead direction of the as-of family"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def purchase_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The look-ahead as-of direction (did an error follow the purchase).

    Same union + carry window as the backward as-of, mirrored: errors
    sort BEFORE purchases at an equal ts (kind 0 < 1) and the frame
    starts at 1 FOLLOWING, so a same-timestamp error never matches —
    strict "after" semantics. One user_id shuffle, linear scan per
    partition; the 1-hour horizon is a post-filter (at streaming scale
    it is what bounds the look-ahead state).
    """
    t = load_tables(spark, sf_dir)
    stream = (
        t["events"]
        .where(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "error", F.lit(0))
            .otherwise(F.lit(1))
            .alias("kind"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    err_id = F.first(
        F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True
    ).over(w)
    err_ts = F.first(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    in_horizon = F.col("err_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return (
        stream.withColumn("err_id", err_id)
        .withColumn("err_ts", err_ts)
        .where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(in_horizon, F.col("err_id")).alias("next_error_id"),
            F.when(in_horizon, F.col("err_ts")).alias("next_error_ts"),
        )
    )


@register(
    "rolling_weekly_active_users",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
grid AS (
  SELECT DISTINCT CAST(ts AS DATE) AS target_day FROM events
),
contrib AS (
  SELECT DISTINCT g.target_day, dy.user_id
  FROM days dy JOIN grid g
    ON dy.d <= g.target_day AND dy.d >= g.target_day - INTERVAL 6 DAY
)
SELECT target_day, count(*) AS weekly_active_users
FROM contrib GROUP BY target_day
""",
    description=(
        "Exact rolling 7-day active users per observed day — sliding-"
        "window distinct counting in its exact day-granular form "
        "(the approximate path is the HLL sketch rollup)"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling MAU/WAU without a window-distinct.

    Window functions cannot COUNT(DISTINCT) — the exact shape is the
    day-offset explode: the DISTINCT (user, day) relation (a tiny
    pre-aggregate: users x days rows regardless of event volume) fans
    out x7 onto the days it contributes to, then distinct + count per
    target day. The fan-out factor is the window length — a constant —
    and the relation it multiplies is already day-granular, which is
    what keeps exact sliding distincts feasible; for long windows or
    high-cardinality keys the HLL rollup (daily_user_sketch_rollup) is
    the approximate path, merged instead of recounted.
    """
    ev = load_tables(spark, sf_dir)["events"]
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = (
        days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("target_day"),
        )
        .distinct()
    )
    grid = ev.select(F.to_date("ts").alias("target_day")).distinct()
    return (
        contrib.join(grid, "target_day")
        .groupBy("target_day")
        .agg(F.count("*").alias("weekly_active_users"))
    )


# --- time-series densification + OHLC rollup --------------------------------


@register(
    "hourly_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
  ) g
),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT g.event_type, g.hour,
       (h.hour IS NOT NULL)          AS observed,
       coalesce(h.v, 0.0)            AS hour_value,
       last_value(h.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
FROM grid g LEFT JOIN hourly h
  ON h.event_type = g.event_type AND h.hour = g.hour
""",
    description=(
        "Time-series densification: the full (type x hour) grid between "
        "the corpus bounds, missing hours flagged and forward-filled with "
        "the last observed hourly value (gap filling / interpolation "
        "baseline)"
    ),
    driver_exposed=False,
    # Round-6 addition, registered after the rotation froze the surface;
    # pytest-oracle-checked (test_oracle_parity).
)
def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid with forward-fill — the densification step
    before window models or charting, where missing buckets must be
    explicit rows, not absent ones.

    Scale shape: the only corpus-sized pass is the (type, hour) partial
    aggregate; the grid is |types| x |hours| rows built from a broadcast
    1-row bounds aggregate via `sequence` (no generator UDF), the join
    onto it is grid-sized, and the carry-forward window partitions by
    type over hour-granular rows — never events. At 100 TB the grid is
    still thousands of rows.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.sum("value").alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.col("v").isNotNull().alias("observed"),
            F.coalesce("v", F.lit(0.0)).alias("hour_value"),
            F.last("v", ignorenulls=True).over(w).alias("carried_value"),
        )
    )


@register(
    "hourly_value_ohlc",
    oracle="""
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rk_open,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rk_close
  FROM events
)
SELECT event_type, hour,
       min(CASE WHEN rk_open = 1 THEN value END)  AS open,
       max(value)                                  AS high,
       min(value)                                  AS low,
       min(CASE WHEN rk_close = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT)                   AS n_events
FROM ranked GROUP BY 1, 2
""",
    description=(
        "OHLC candles: per (type, hour) the first/max/min/last event "
        "value with deterministic (ts, event_id) endpoints — the "
        "financial-style downsampling rollup"
    ),
    driver_exposed=False,
    # Round-6 addition, registered after the rotation froze the surface;
    # pytest-oracle-checked (test_oracle_parity).
)
def hourly_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close downsampling per (type, hour).

    Open/close use min_by/max_by over the (ts, event_id) struct — one
    partial-aggregated pass, no window, no second scan: at scale this is
    a pure map-side-combined groupBy on bounded keys (types x hours).
    The deterministic (ts, event_id) tie-break makes endpoints exact
    across engines and partitionings.
    """
    ev = load_tables(spark, sf_dir)["events"]
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


FUNNEL_STEPS = ["signup", "view", "click", "purchase"]

# Hot-user bound: the per-user sorted array keeps only the first
# FUNNEL_EVENT_CAP funnel-type events by (ts, event_type). The funnel
# reads earliest-qualifying timestamps, so a user whose funnel-type
# activity fits the cap (every realistic user) is unaffected; a
# pathological hot user degrades to "funnel over their first cap
# events" instead of an unbounded collect_list blowing a task (the
# 100x-scale failure VERDICT r9 item 8 flagged). The oracle applies
# the identical row_number cap so parity holds by construction.
FUNNEL_EVENT_CAP = 10_000


def _funnel_oracle() -> str:
    """Chained-join oracle: step k's first timestamp is the earliest
    event of its type STRICTLY AFTER step k-1's — a deliberately
    different algorithm from the engine's per-user array fold."""
    types = ", ".join(f"'{s}'" for s in FUNNEL_STEPS)
    ctes = [
        "capped AS (SELECT user_id, ts, event_type FROM ("
        "SELECT user_id, ts, event_type, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts, event_type) AS rn "
        f"FROM events WHERE event_type IN ({types})) "
        f"WHERE rn <= {FUNNEL_EVENT_CAP})"
    ]
    prev = None
    for i, s in enumerate(FUNNEL_STEPS, start=1):
        if prev is None:
            ctes.append(
                f"t{i} AS (SELECT user_id, min(ts) AS ts{i} FROM capped "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"t{i} AS (SELECT e.user_id, min(e.ts) AS ts{i} "
                f"FROM capped e JOIN {prev} p USING (user_id) "
                f"WHERE e.event_type = '{s}' AND e.ts > p.ts{i - 1} "
                f"GROUP BY e.user_id)"
            )
        prev = f"t{i}"
    selects = [
        f"""SELECT {i} AS step_idx, '{s}' AS step,
       (SELECT count(*)::BIGINT FROM t{i}) AS n_users,
       (SELECT CASE WHEN {i} = 1 THEN 0 ELSE
          min(epoch_us(x.ts{i}) - epoch_us(t1.ts1)) // 1000000 END
        FROM t{i} x JOIN t1 USING (user_id))::BIGINT AS min_secs_from_first,
       (SELECT CASE WHEN {i} = 1 THEN 0 ELSE
          max(epoch_us(x.ts{i}) - epoch_us(t1.ts1)) // 1000000 END
        FROM t{i} x JOIN t1 USING (user_id))::BIGINT AS max_secs_from_first"""
        for i, s in enumerate(FUNNEL_STEPS, start=1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
    )


def _funnel_fold_expr() -> str:
    """One LINEAR pass over the sorted per-user array via the
    ``aggregate`` HOF: the accumulator carries (t1..tk); element x
    advances step i iff step i is unreached, step i-1 is reached, x is
    the step's type, and x strictly follows t_{i-1}. Because the array
    is sorted by (tus, et), "first qualifying element in array order"
    equals the oracle's min(ts of type s with ts > t_{i-1}) — t_{i-1}
    is already set by the time any qualifying element is folded (its
    setter has a strictly smaller tus), and strictness makes same-tus
    tie order irrelevant.

    This replaces the round-9 chained filter/transform/array_min HOF
    columns whose step-(k-1) expression re-inlined into step k's lambda
    guard (CollapseProject) — O(n^k) per-element re-evaluation, the
    25.7 s sf0.1 pathology VERDICT r9 item 1 isolated. The fold is
    O(n) per user and evaluated exactly once."""
    k = len(FUNNEL_STEPS)
    nulls = ", ".join(f"'t{i}', CAST(NULL AS BIGINT)" for i in range(1, k + 1))
    fields = []
    for i, s in enumerate(FUNNEL_STEPS, start=1):
        guard = (
            f"x.et = '{s}'"
            if i == 1
            else f"a.t{i - 1} IS NOT NULL AND x.tus > a.t{i - 1} AND x.et = '{s}'"
        )
        fields.append(f"'t{i}', IF(a.t{i} IS NULL AND {guard}, x.tus, a.t{i})")
    return (
        f"aggregate(seq, named_struct({nulls}), "
        f"(a, x) -> named_struct({', '.join(fields)}))"
    )


@register(
    "user_conversion_funnel",
    oracle=_funnel_oracle(),
    description=(
        "Ordered conversion funnel (signup -> view -> click -> "
        "purchase): per step, users whose FIRST qualifying event "
        "strictly follows the previous step's, plus min/max seconds "
        "from funnel entry — ONE event scan, ONE data shuffle (groupBy "
        "user + capped sorted array + single linear fold), vs the "
        "oracle's chained-join derivation"
    ),
    # Promoted in the ninth rotation (round 10) after the r9 perf
    # pathology was fixed; see BASELINE.md rotation table.
)
def user_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel as ONE array fold, not self-joins.

    Scale shape: events pre-filtered to the k funnel types, one hash
    shuffle on user_id, each user's events become ONE sorted array
    capped at FUNNEL_EVENT_CAP (hot-user bound — a pathological user
    can no longer blow a task's memory), then a single O(n) JVM
    ``aggregate`` fold extracts all k step timestamps in one pass.
    The k step reports come from ONE global conditional aggregate
    (count/min/max gated on t_i) unpivoted with ``stack`` — one scan
    of events total, vs the previous 4-branch union re-scanning the
    per-user relation with exponentially re-inlined HOFs (VERDICT r9
    item 1: 25.7 s -> this plan) and vs the oracle's k-join chain.
    Timestamps compare as epoch micros (exact integers)."""
    k = len(FUNNEL_STEPS)
    ev = load_tables(spark, sf_dir)["events"].where(
        F.col("event_type").isin(FUNNEL_STEPS)
    )
    per_user = ev.groupBy("user_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("tus"),
                        F.col("event_type").alias("et"),
                    )
                )
            ),
            1,
            FUNNEL_EVENT_CAP,
        ).alias("seq")
    )
    th = per_user.select(F.expr(_funnel_fold_expr()).alias("th"))
    aggs = []
    for i in range(1, k + 1):
        aggs.append(
            F.count(F.when(F.col(f"th.t{i}").isNotNull(), 1))
            .cast("long")
            .alias(f"n{i}")
        )
        if i > 1:
            # t_i set implies t1 set; NULL t_i rows fall out of min/max.
            secs = F.expr(f"(th.t{i} - th.t1) div 1000000")
            aggs.append(F.min(secs).cast("long").alias(f"mn{i}"))
            aggs.append(F.max(secs).cast("long").alias(f"mx{i}"))
    one = th.agg(*aggs)
    stack_rows = []
    for i, s in enumerate(FUNNEL_STEPS, start=1):
        mn = "CAST(0 AS BIGINT)" if i == 1 else f"mn{i}"
        mx = "CAST(0 AS BIGINT)" if i == 1 else f"mx{i}"
        stack_rows.append(f"{i}, '{s}', n{i}, {mn}, {mx}")
    return one.select(
        F.expr(
            f"stack({k}, {', '.join(stack_rows)}) AS "
            "(step_idx, step, n_users, min_secs_from_first, "
            "max_secs_from_first)"
        )
    )


# --- multi-touch attribution -------------------------------------------------

ATTRIB_LOOKBACK_DAYS = 7
ATTRIB_TOUCH_TYPES = ("view", "click")

_ATTRIB_ORACLE = f"""
WITH pairs AS (
  SELECT p.event_id AS p_id, p.value AS p_val,
         t.event_type AS touch_type, t.ts AS t_ts, t.event_id AS t_id
  FROM events p JOIN events t
    ON t.user_id = p.user_id
   AND p.event_type = 'purchase'
   AND t.event_type IN ('view', 'click')
   AND t.ts <= p.ts
   AND t.ts >= p.ts - INTERVAL {ATTRIB_LOOKBACK_DAYS} DAY
),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rn,
         count(*) OVER (PARTITION BY p_id) AS n
  FROM pairs
),
wts AS (
  SELECT touch_type, p_val,
         CASE WHEN rn = 1 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS w_first,
         CASE WHEN rn = n THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS w_last,
         1.0::DOUBLE / n AS w_linear,
         CASE WHEN n = 1 THEN 1.0::DOUBLE
              WHEN n = 2 THEN 0.5::DOUBLE
              WHEN rn = 1 OR rn = n THEN 0.4::DOUBLE
              ELSE 0.2::DOUBLE / (n - 2) END AS w_position
  FROM rk
),
m AS (
  SELECT touch_type, 'first_touch' AS model, w_first AS w, p_val FROM wts
  UNION ALL SELECT touch_type, 'last_touch', w_last, p_val FROM wts
  UNION ALL SELECT touch_type, 'linear', w_linear, p_val FROM wts
  UNION ALL SELECT touch_type, 'position_based', w_position, p_val FROM wts
)
SELECT touch_type, model,
       round(sum(w), 6) AS credited_conversions,
       round(sum(w * p_val), 4) AS credited_revenue
FROM m GROUP BY touch_type, model
"""


@register(
    "purchase_multitouch_attribution",
    oracle=_ATTRIB_ORACLE,
    description=(
        "Multi-touch attribution: every purchase's preceding view/click "
        f"touches within a {ATTRIB_LOOKBACK_DAYS}-day lookback are credited "
        "under four models at once — first-touch, last-touch, linear, and "
        "U-shaped position-based (40/20/40) — reported as credited "
        "(fractional) conversions and revenue per touch type and model"
    ),
    driver_exposed=True,  # tenth rotation (round 11): promoted,
)
def purchase_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The marketing-analytics attribution read over the event stream.

    Scale shape: the only corpus-sized movement is one hash shuffle of
    each filtered event subset on ``user_id`` for the touch-to-purchase
    interval join (sort-merge with the lookback range as the band
    predicate — per-user fan-out is bounded by activity within the
    7-day window, never all-pairs). The per-purchase ranking then
    re-partitions the pair relation by purchase id; the
    window needs ONE sort (the unbounded count carries no ordering, and
    the last-touch test is ``rn = n``), and all four models' weights are
    codegen'd projections off the same (rn, n) pair — the model dimension
    multiplies rows only AFTER the windows, via ``stack``, into the
    final partial-agg'd groupBy. Weights are exact per-pair arithmetic,
    so each model distributes exactly 1.0 per purchase.
    """
    ev = load_tables(spark, sf_dir)["events"]
    touches = ev.where(F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("t_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_val"),
        F.col("event_id").alias("p_id"),
    )
    pairs = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_LOOKBACK_DAYS} DAYS")
        ),
    )
    w = Window.partitionBy("p_id")
    rk = pairs.select(
        "touch_type",
        "p_val",
        F.row_number().over(w.orderBy("t_ts", "t_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    rn, n = F.col("rn"), F.col("n")
    wts = rk.select(
        "touch_type",
        "p_val",
        F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0)).alias("w_first"),
        F.when(rn == n, F.lit(1.0)).otherwise(F.lit(0.0)).alias("w_last"),
        (F.lit(1.0) / n).alias("w_linear"),
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((rn == 1) | (rn == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
        .alias("w_position"),
    )
    m = wts.select(
        "touch_type",
        F.expr(
            "stack(4, 'first_touch', w_first, 'last_touch', w_last, "
            "'linear', w_linear, 'position_based', w_position) AS (model, w)"
        ),
        "p_val",
    )
    return m.groupBy("touch_type", "model").agg(
        F.round(F.sum("w"), 6).alias("credited_conversions"),
        F.round(F.sum(F.col("w") * F.col("p_val")), 4).alias("credited_revenue"),
    )
