"""Extended relational corpus: subqueries, having, date rollups, approx ops.

Adaptations of further TPC-H query shapes to the columns the testdata
star schema actually has (FIXTURES.md §2 — no partsupp, no l_shipmode /
o_comment), plus the approximate aggregates (HLL distinct, quantile
sketch) that are rows-only checked — their sketches are engine-specific
by design, so no value oracle exists (the exact duals are oracle-checked
in relational.py / events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.cache_util import ensure_cached
from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
    description="TPC-H Q4: EXISTS semi-join + priority counts",
    # Round-5 rotation: slot ceded to chunk_exact_dedup (driver-green
    # r2-r4 here; still benched + pytest-oracle-checked every session).
    driver_exposed=False,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
    # Round-5 rotation: slot ceded to table_snapshot_diff (driver-green
    # r2-r4 here; still benched + pytest-oracle-checked every session).
    driver_exposed=False,
    description="TPC-H Q7: bilateral trade volume, dual-aliased dimension join",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT 100.00 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
    description="TPC-H Q14: conditional aggregation ratio (promo share)",
    # Round-5 rotation: slot ceded to bpe_merge_train (driver-green r2-r4
    # here; still benched + pytest-oracle-checked every session).
    driver_exposed=False,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
        )
        .join(F.broadcast(t["part"].select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice, t.sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
) t
JOIN orders   ON o_orderkey = t.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    description="TPC-H Q18: HAVING filter over grouped fact, then dim join",
    # Round-5 rotation: driver-green r4; ceded its slot to the round-5
    # search/filter/centrality entries. The grouped-fact + dim-join class
    # stays driver-exposed via q1/q3/q5; still benched + pytest-checked.
    driver_exposed=False,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "q19_brand_filters",
    # filter+scalar-agg coverage is carried by q6/q14; ceded its driver
    # slot to the round-2 operator classes (50-entry cap)
    driver_exposed=False,
    oracle="""
SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
    description="TPC-H Q19: disjunctive multi-predicate join filter",
)
def q19_brand_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "supplier_above_nation_avg",
    oracle="""
WITH nat_avg AS (
  SELECT s_nationkey AS nk, avg(s_acctbal) AS nation_avg
  FROM supplier GROUP BY s_nationkey
)
SELECT s_suppkey, s_name, s_acctbal, nation_avg
FROM supplier JOIN nat_avg ON s_nationkey = nk
WHERE s_acctbal > nation_avg
""",
    description="Correlated-subquery shape: suppliers above their nation's average balance",
    # Ceded its driver slot round 4; the correlated-subquery class stays
    # covered by orders_above_customer_avg.
    driver_exposed=False,
)
def supplier_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("s_nationkey")
    return (
        t["supplier"]
        .withColumn("nation_avg", F.avg("s_acctbal").over(w))
        .where(F.col("s_acctbal") > F.col("nation_avg"))
        .select("s_suppkey", "s_name", "s_acctbal", "nation_avg")
    )


@register(
    "monthly_order_rollup",
    # rollup coverage is carried by rollup_sales_by_region_nation; ceded
    # its driver slot to the round-2 operator classes (50-entry cap)
    driver_exposed=False,
    oracle="""
SELECT year(o_orderdate)  AS o_year,
       month(o_orderdate) AS o_month,
       count(*)           AS n_orders,
       sum(o_totalprice)  AS total_sales
FROM orders
GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
""",
    description="Date-hierarchy rollup: year/month/grand-total order stats",
)
def monthly_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            "o_totalprice",
        )
        .rollup("o_year", "o_month")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total_sales"))
    )


@register(
    "intersect_customers",
    oracle="""
SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
  WHERE o_orderstatus = 'F'
INTERSECT
SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
  WHERE o_orderstatus = 'O'
""",
    description="Set operation: INTERSECT of customer populations",
    # Ceded in the ninth rotation (round 10, r1-r9 tenure);
    # except_customers carries the set-op class. BASELINE.md table.
    driver_exposed=False,
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select("c_custkey")
    o = t["orders"]
    f = c.join(o.where(F.col("o_orderstatus") == "F"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    op = c.join(o.where(F.col("o_orderstatus") == "O"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    return f.intersect(op)


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    description="TPC-H Q13: LEFT OUTER join + order-count distribution (customers with zero orders kept)",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "daily_activity_full_outer",
    oracle="""
SELECT coalesce(od, ed)     AS day,
       n_orders,
       n_events
FROM (SELECT date_trunc('day', o_orderdate)::TIMESTAMP AS od, count(*) AS n_orders
      FROM orders GROUP BY 1) o
FULL OUTER JOIN
     (SELECT date_trunc('day', ts)::TIMESTAMP AS ed, count(*) AS n_events
      FROM events GROUP BY 1) e
  ON od = ed
""",
    description="FULL OUTER join: per-day order vs event activity, unmatched days kept from both sides",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def daily_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = (
        t["orders"]
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("od"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        t["events"]
        .groupBy(F.date_trunc("day", F.col("ts")).alias("ed"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return o.join(e, F.col("od") == F.col("ed"), "full_outer").select(
        F.coalesce("od", "ed").alias("day"), "n_orders", "n_events"
    )


@register(
    "cube_orders_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*)          AS n_orders,
       sum(o_totalprice) AS total_sales
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description="CUBE aggregation: all grouping-set combinations of status x priority",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total_sales"))
    )


@register(
    "except_customers",
    oracle="""
SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
  WHERE o_orderstatus = 'F'
EXCEPT
SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
  WHERE o_orderstatus = 'O'
""",
    description="Set operation: EXCEPT of customer populations (F-status minus O-status)",
    # Promoted in the ninth rotation (round 10) to keep the set-op
    # class driver-covered when intersect_customers ceded.
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select("c_custkey")
    o = t["orders"]
    f = c.join(o.where(F.col("o_orderstatus") == "F"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    op = c.join(o.where(F.col("o_orderstatus") == "O"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    return f.exceptAll(op).distinct()


@register(
    "rolling_customer_order_totals",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       sum(o_totalprice) OVER w AS rolling_30d_total,
       count(*)          OVER w AS rolling_30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
""",
    description="RANGE-frame window: per-customer 30-day rolling order totals (event-time range frame, not row frame)",
    # pytest-oracle-checked; the driver surface is at its 50-entry cap.
    driver_exposed=False,
)
def rolling_customer_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A range frame over event time: ORDER BY epoch seconds with a
    # rangeBetween in seconds — one shuffle on the entity key, linear per
    # partition, ties (same orderdate) included on both engines.
    # o_orderdate is TIMESTAMP_NTZ; the session runs UTC, so the cast chain
    # ntz -> timestamp -> long is the shift-free epoch second.
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum("o_totalprice").over(w).alias("rolling_30d_total"),
        F.count(F.lit(1)).over(w).alias("rolling_30d_orders"),
    )


# --- approximate aggregates: rows-only (sketches are engine-specific) -------


@register(
    "approx_distinct_users",
    oracle=None,
    description="HLL++ approximate distinct users per event type (sketch values are engine-specific; accuracy contract asserted in tests/test_oracle_parity.py: |approx-exact| <= 3*rsd*exact)",
    # Not driver-exposed: a rows-only driver check is weaker than the
    # in-repo 3-sigma accuracy bound this entry carries in pytest, and its
    # slot lets the driver surface be 50/50 value-hash-checked.
    driver_exposed=False,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # rsd 0.02, not 0.01: halving rsd quadruples the HLL register count and
    # with it the per-group merge cost (measured 3x the whole query), for
    # precision the use case (dedup-rate estimation) doesn't need.
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


_PCT_QS = (0.5, 0.9, 0.99)
# GK sketch accuracy (relative rank error <= 1/accuracy; memory is
# O(accuracy) samples per group, ~8 bytes each). Two settings, kept
# deliberately distinct so the exact-oracle trick never ships as a
# production constant (VERDICT r4 next-step 5):
#   - PCT_PRODUCTION_ACCURACY (10k, ~80 KB/group): the default every
#     production caller gets; at 100 TB group cardinality the sketch
#     approximates by design with bounded memory.
#   - _PCT_EXACT_ORACLE_ACCURACY (1M): the oracle-parity override. Below
#     rows=accuracy the GK sketch keeps every sample and
#     percentile_approx returns the exact discrete quantile —
#     bit-for-bit the quantile_disc oracle (needs accuracy >= ~50x
#     rows/group; sf0.1 has ~20k rows/type). Used only by the
#     registered driver/test query.
PCT_PRODUCTION_ACCURACY = 10_000
_PCT_EXACT_ORACLE_ACCURACY = 1_000_000


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs=_PCT_QS,
    accuracy: int = PCT_PRODUCTION_ACCURACY,
) -> DataFrame:
    """Per-group GK-sketch percentiles, one row per (group, quantile).

    The production API: ``accuracy`` defaults to the bounded-memory
    production setting; tests/oracles pass the exact-window override.
    """
    qs_arr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        df.groupBy(*group_cols)
        .agg(F.percentile_approx(value_col, list(qs), accuracy).alias("pcts"))
        .select(*group_cols, F.posexplode("pcts").alias("qi", "approx_value"))
        .select(
            *group_cols,
            F.element_at(qs_arr, F.col("qi") + 1).alias("quantile"),
            "approx_value",
        )
    )


@register(
    "approx_value_percentiles",
    oracle="\nUNION ALL\n".join(
        f"""SELECT event_type, {q}::DOUBLE AS quantile, quantile_disc(value, {q}) AS approx_value
FROM events GROUP BY event_type"""
        for q in _PCT_QS
    ),
    description="Quantile-sketch percentiles of event value, one row per (event_type, quantile); GK sketch is exact below its accuracy bound, so the discrete-quantile oracle matches at check SF",
    # Round-8 rotation (sixth): driver-green 7 consecutive rounds;
    # ceded its slot to the restored/promoted classes (class keeps an
    # exposed sibling — see BASELINE.md sixth-rotation table).
    driver_exposed=False,
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One row per quantile (posexplode inside approx_percentiles) keeps the
    # result scalar-typed for the driver's canonicalizer (arrays are
    # unhashable there). The exact-window accuracy override makes the GK
    # sketch bit-for-bit the oracle's quantile_disc at check SF.
    t = load_tables(spark, sf_dir)
    return approx_percentiles(
        t["events"],
        "value",
        ["event_type"],
        qs=_PCT_QS,
        accuracy=_PCT_EXACT_ORACLE_ACCURACY,
    )


@register(
    "unpivot_nation_balance_metrics",
    oracle="""
WITH a AS (
  SELECT c_nationkey,
         min(c_acctbal) AS min_bal,
         avg(c_acctbal) AS avg_bal,
         max(c_acctbal) AS max_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'min_bal' AS metric, min_bal AS balance FROM a
UNION ALL
SELECT c_nationkey, 'avg_bal' AS metric, avg_bal AS balance FROM a
UNION ALL
SELECT c_nationkey, 'max_bal' AS metric, max_bal AS balance FROM a
""",
    description=(
        "Unpivot (melt): per-nation balance aggregates widened to columns, "
        "then melted back to (nation, metric, balance) long form — the "
        "inverse of the pivot operator"
    ),
    driver_exposed=False,
)
def unpivot_nation_balance_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    agg = t["customer"].groupBy("c_nationkey").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.avg("c_acctbal").alias("avg_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )
    # native unpivot: no explode/struct gymnastics, stays in codegen
    return agg.unpivot(
        ["c_nationkey"], ["min_bal", "avg_bal", "max_bal"], "metric", "balance"
    )


@register(
    "grouping_sets_revenue",
    oracle="""
SELECT r.r_name, n.n_name,
       GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS gid,
       sum(o.o_totalprice) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY GROUPING SETS ((r.r_name), (n.n_name))
""",
    description=(
        "Explicit GROUPING SETS: revenue by region AND by nation in one "
        "pass (non-hierarchical sets, unlike rollup/cube) with the "
        "grouping_id disambiguator"
    ),
    driver_exposed=False,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupingSets(
            [[F.col("r_name")], [F.col("n_name")]], F.col("r_name"), F.col("n_name")
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "customer_balance_deciles",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       ntile(10)  OVER w AS balance_decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cum_dist,
       nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING)
         AS second_richest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
    description=(
        "Analytic-function surface: ntile deciles, percent_rank, "
        "cume_dist, and full-frame nth_value per market segment — the "
        "rank-statistics window family in one pass"
    ),
    # pytest-oracle-checked; driver surface at its 50-entry cap — the
    # window class is driver-visible via user_sessions/top_parts_per_brand.
    driver_exposed=False,
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist/nth_value in a single window pass.

    The unique (acctbal DESC, custkey) ordering makes every rank statistic
    deterministic (no ties), so percent_rank/cume_dist round-compare
    exactly cross-engine. Scale note: rank statistics require the full
    window partition sorted — inherent to the semantics, and why the
    partition key here is a grouping column (segment), never the whole
    relation; for corpus-wide ranks at 100 TB the two-phase bucket-ledger
    pattern (token_budget_sample) or approx percentiles are the scale
    path, and a global ntile would be a deliberate single-partition
    bottleneck.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        # cast: Spark ntile is int32, DuckDB's is int64 — align the schema
        F.ntile(10).over(w).cast("long").alias("balance_decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.nth_value("c_custkey", 2).over(wf).alias("second_richest_custkey"),
    )


COPURCHASE_TOP_K = 20


@register(
    "part_copurchase_pairs",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, n_orders FROM pairs
ORDER BY n_orders DESC, part_a, part_b
LIMIT {COPURCHASE_TOP_K}
""",
    description=(
        f"Market-basket co-purchase: the top-{COPURCHASE_TOP_K} part "
        "pairs by number of orders containing both — the frequent-"
        "itemset-pairs shape over the order/lineitem basket"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (support counting).

    Scale shape: the self-join is an equi-join on the basket key
    (l_orderkey), so pair fan-out is bounded by items-per-order squared
    — a data constant (~7² here), never corpus-quadratic; the a<b
    predicate halves it and canonicalizes pair identity. Pair counts
    partial-aggregate map-side, and the report is a
    TakeOrderedAndProject. At true market-basket scale the same shape
    takes a pre-filter on frequent single items (the a-priori cut) as
    one more broadcast semi-join in front — seam noted, not needed at
    this item cardinality.
    """
    items = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.selectExpr("l_orderkey", "l_partkey AS part_a")
    b = items.selectExpr("l_orderkey", "l_partkey AS part_b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    return pairs.orderBy(
        F.col("n_orders").desc(), "part_a", "part_b"
    ).limit(COPURCHASE_TOP_K)


RULE_MIN_SUPPORT = 3  # orders containing the pair


@register(
    "part_association_rules",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders_t AS (
  SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM items
),
item_supp AS (
  SELECT l_partkey, count(*) AS n_a FROM items GROUP BY l_partkey
),
pair_supp AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p.part_a AS antecedent, p.part_b AS consequent, p.n_ab,
       ((1000 * p.n_ab) // sa.n_a)::BIGINT AS confidence_permille,
       round((p.n_ab * t.n_orders) / (sa.n_a * sb.n_a * 1.0), 4) AS lift
FROM pair_supp p
JOIN item_supp sa ON sa.l_partkey = p.part_a
JOIN item_supp sb ON sb.l_partkey = p.part_b
CROSS JOIN n_orders_t t
WHERE p.n_ab >= {RULE_MIN_SUPPORT}
""",
    description=(
        f"Association rules a=>b over order baskets (pair support >= "
        f"{RULE_MIN_SUPPORT}): exact integer confidence permille and "
        "rounded lift"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed rules with confidence and lift.

    Scale shape: identical basket-keyed self-join as the co-purchase
    pairs (fan-out items-per-order², a data constant), directed this
    time (a<>b) because confidence is asymmetric; single-item supports
    are a vocabulary-sized relation joined back (broadcastable), and
    the 1-row basket total broadcasts. Confidence is exact integer
    permille; lift rounds a single multiply-divide chain, associated
    identically in both engines.
    """
    items = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    total = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    supp = items.groupBy("l_partkey").agg(F.count("*").alias("n_a"))
    a = items.selectExpr("l_orderkey", "l_partkey AS antecedent")
    b = items.selectExpr("l_orderkey", "l_partkey AS consequent")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= RULE_MIN_SUPPORT)
    )
    return (
        pairs.join(
            F.broadcast(supp.selectExpr("l_partkey AS antecedent", "n_a")),
            "antecedent",
        )
        .join(
            F.broadcast(
                supp.selectExpr("l_partkey AS consequent", "n_a AS n_b")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            F.floor((F.lit(1000) * F.col("n_ab")) / F.col("n_a"))
            .cast("long")
            .alias("confidence_permille"),
            F.round(
                (F.col("n_ab") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b") * F.lit(1.0)),
                4,
            ).alias("lift"),
        )
    )


@register(
    "open_orders_backlog",
    oracle="""
WITH spans AS (
  SELECT o.o_orderkey, o.o_orderdate AS start_day,
         max(l.l_shipdate) AS end_day
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
  SELECT d, sum(delta)::BIGINT AS net FROM (
    SELECT start_day AS d, 1 AS delta FROM spans
    UNION ALL
    SELECT end_day AS d, -1 AS delta FROM spans
  ) GROUP BY d
)
SELECT d AS day,
       net,
       sum(net) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ::BIGINT AS open_orders
FROM deltas
""",
    description=(
        "Open-order backlog per day (sweep line): +1 at order date, -1 at "
        "last shipment, cumulative over the date axis — the interval-"
        "counting shape (concurrent sessions / active loans / WIP)"
    ),
    driver_exposed=False,
    # Registered after the round-5 driver surface froze at the cap;
    # pytest-oracle-checked at sf0.001/sf0.01 (test_oracle_parity).
)
def open_orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many intervals cover each day, without expanding intervals.

    The sweep-line dual of the rolling-WAU fan-out: instead of exploding
    each interval onto every day it covers (length-proportional), each
    interval emits exactly two signed events and a prefix sum over the
    date axis recovers the concurrent count — O(intervals), any span
    lengths. The per-order span is an orderkey-keyed aggregate; deltas
    partial-aggregate onto the |dates| relation, and only that tiny
    relation passes through the single-partition cumulative window (the
    documented exception class: constant-bounded input). A day ending
    and starting the same count nets in one row.
    """
    t = load_tables(spark, sf_dir)
    spans = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_day"))
    )
    deltas = (
        spans.select(F.col("o_orderdate").alias("d"), F.lit(1).alias("delta"))
        .unionAll(spans.select(F.col("end_day").alias("d"), F.lit(-1).alias("delta")))
        .groupBy("d")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return deltas.select(
        F.col("d").alias("day"),
        "net",
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


# ---------------------------------------------------------------------------
# Item-item collaborative recommendations (round-10 session 3): the
# "customers who bought X also bought Y" serving table, composed from the
# co-purchase statistics above.
# ---------------------------------------------------------------------------

RECS_SIMS_PER_ITEM = 10  # neighborhood cap — bounds the candidate fan-out
RECS_PER_CUSTOMER = 3


@register(
    "customer_item_recommendations",
    oracle=f"""
WITH owned AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
sims AS (
  SELECT part_a, part_b, n_ab FROM (
    SELECT *, row_number() OVER (PARTITION BY part_a
                                 ORDER BY n_ab DESC, part_b) AS rk
    FROM pairs
  ) WHERE rk <= {RECS_SIMS_PER_ITEM}
),
cand AS (
  SELECT o.cust, s.part_b AS candidate,
         CAST(sum(s.n_ab) AS BIGINT) AS total_cooc,
         CAST(count(*) AS BIGINT)    AS n_paths
  FROM owned o JOIN sims s ON s.part_a = o.part
  WHERE NOT EXISTS (SELECT 1 FROM owned w
                    WHERE w.cust = o.cust AND w.part = s.part_b)
  GROUP BY 1, 2
)
SELECT cust, candidate, total_cooc, n_paths
FROM (
  SELECT *, row_number() OVER (PARTITION BY cust
            ORDER BY total_cooc DESC, n_paths DESC, candidate) AS rrk
  FROM cand
) WHERE rrk <= {RECS_PER_CUSTOMER}
""",
    description=(
        f"Item-item collaborative filtering: top-{RECS_PER_CUSTOMER} "
        "not-yet-owned part recommendations per customer from the "
        f"degree-capped (top-{RECS_SIMS_PER_ITEM} per item) co-purchase "
        "neighborhood — the 'bought X, also bought Y' serving table; "
        "all-integer scoring so ranking is engine-deterministic"
    ),
    driver_exposed=False,
)
def customer_item_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-method recommendations as pure relational composition.

    Scale shape: the pair fan-out is bounded by basket size squared
    (equi-join on the basket key, same armor as part_copurchase_pairs);
    the neighborhood cap is applied BEFORE the customer join, so the
    candidate stage is |owned| x top-M, never |owned| x |catalog|; the
    already-owned exclusion is a left-anti equi-join; final top-k per
    customer is a window over per-customer groups. Every score is an
    integer count — no float ranking anywhere.
    """
    t = load_tables(spark, sf_dir)
    # cache(): owned feeds BOTH the candidate join and the already-owned
    # anti-join on different keys (no exchange reuse possible), so
    # without the pin the orders x lineitem join + distinct executed
    # twice per run (r13 optimization; guide §1.2)
    owned = ensure_cached(
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = items.selectExpr("l_orderkey", "l_partkey AS part_a")
    b = items.selectExpr("l_orderkey", "l_partkey AS part_b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    wk = Window.partitionBy("part_a").orderBy(F.desc("n_ab"), F.asc("part_b"))
    sims = (
        pairs.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= RECS_SIMS_PER_ITEM)
        .drop("rk")
    )
    cand = (
        owned.join(sims, owned["part"] == sims["part_a"])
        .groupBy("cust", F.col("part_b").alias("candidate"))
        .agg(
            F.sum("n_ab").cast("long").alias("total_cooc"),
            F.count(F.lit(1)).cast("long").alias("n_paths"),
        )
        # already-owned exclusion AFTER the aggregate (r14, guide §1.2):
        # ownership is a property of the whole (cust, candidate) group,
        # so the anti-join filters identical groups either way — placed
        # here it probes |groups| rows instead of |paths| (the owned x
        # top-M fan-out), and the aggregate's map-side partials shrink
        # the shuffle first. A/B: 3.54 -> 3.21 s, results identical.
        .join(
            owned.selectExpr("cust AS w_cust", "part AS w_part"),
            (F.col("cust") == F.col("w_cust"))
            & (F.col("candidate") == F.col("w_part")),
            "left_anti",
        )
    )
    wr = Window.partitionBy("cust").orderBy(
        F.desc("total_cooc"), F.desc("n_paths"), F.asc("candidate")
    )
    return (
        cand.withColumn("rrk", F.row_number().over(wr))
        .where(F.col("rrk") <= RECS_PER_CUSTOMER)
        .select("cust", "candidate", "total_cooc", "n_paths")
    )
