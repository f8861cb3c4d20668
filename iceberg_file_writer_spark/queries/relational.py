"""Relational query corpus over the star schema.

The reference implements zero relational operators (SURVEY.md §2.2 — its
only computation is schema decode + partition routing, reference
main.go:61-90). This module is the query layer the rebuild exposes on top
of ingested tables: scans with pushed-down predicates, projections, joins
(broadcast + shuffle), aggregations (partial/final via Catalyst), window
functions, set operations, rollup/pivot, and top-k — each declared as a
DataFrame plan so Catalyst performs pushdown/pruning/join-selection, and
each paired with the equivalent ANSI SQL for the DuckDB oracle.

Scale notes (100 TB posture):
- Dimension tables (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast`` where they are small relative to the fact side, so the
  big ``lineitem``/``orders`` scans never shuffle for those joins.
- All aggregates are expressed as groupBy/agg → Catalyst plans partial
  (map-side) aggregation before the exchange.
- Top-k is window row_number ≤ k (per-group) or orderBy+limit (global,
  which Spark executes as TakeOrderedAndProject — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       sum(l_quantity)                                       AS sum_qty,
       sum(l_extendedprice)                                  AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity)                                       AS avg_qty,
       avg(l_extendedprice)                                  AS avg_price,
       avg(l_discount)                                       AS avg_disc,
       count(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 pricing summary: filter-pushdown scan + 8-agg groupBy",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    description="TPC-H Q3: 3-way join (broadcast dim) + agg + global top-10",
    # Round-6 rotation: slot ceded to the round-6 promotions
    # (driver-green in earlier rounds; still benched + pytest-
    # oracle-checked every session).
    driver_exposed=False,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].where(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    description="TPC-H Q5: 6-way join star query, region-filtered, agg by nation",
    # Round-6 rotation: slot ceded to the round-6 promotions
    # (driver-green in earlier rounds; still benched + pytest-
    # oracle-checked every session).
    driver_exposed=False,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT sum(l_extendedprice * l_discount) AS revenue,
       count(*)                          AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6: pure pushed-down filter + scalar aggregate (no shuffle of note)",
    # Round-7 rotation (fifth): driver-green 5-6 consecutive rounds; ceded
    # its slot to the round-6 flagship promotions + persisted-ANN probes
    # (class keeps an exposed sibling — see BASELINE.md rotation table).
    driver_exposed=False,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey,
       c_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    description="TPC-H Q10: returned-item ranking, 4-way join + agg + top-20",
    # Mid-round-5 rotation: driver-green r1-r4; ceded its slot to
    # bpe_encode_docs (pipeline_ext.py). The 4-way-join + group-agg +
    # top-k shape stays driver-covered by q3/q5/q18.
    driver_exposed=False,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-10-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "top_parts_per_brand",
    oracle="""
WITH part_rev AS (
  SELECT p_brand,
         p_partkey,
         sum(l_extendedprice * (1 - l_discount)) AS revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
), ranked AS (
  SELECT p_brand, p_partkey, revenue,
         row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rk
  FROM part_rev
)
SELECT p_brand, p_partkey, revenue, rk
FROM ranked
WHERE rk <= 3
""",
    description="Top-k per group: window row_number over per-brand part revenue",
    # Round-5 rotation: slot ceded to knn_filtered_by_label (driver-green
    # r1-r4 here; still benched + pytest-oracle-checked every session).
    driver_exposed=False,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(F.broadcast(t["part"].select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return rev.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    description="Anti join: customers that never placed an order",
    # Ceded its driver slot round 4 (0 rows at sf0.01 — weak check
    # signal); the anti-join class stays pytest-covered by
    # except_customers and the broadcast-anti plan gates.
    driver_exposed=False,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "suppliers_with_shipments",
    # semi-join coverage is carried by q4 (EXISTS form); ceded its driver
    # slot to the round-2 operator classes (50-entry cap)
    driver_exposed=False,
    oracle="""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey
    AND l.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
)
""",
    description="Semi join: suppliers with at least one recent shipment",
)
def suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    recent = t["lineitem"].where(F.col("l_shipdate") >= F.to_timestamp(F.lit("2001-01-01")))
    return (
        t["supplier"]
        .join(recent, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "rollup_sales_by_region_nation",
    oracle="""
SELECT r_name,
       n_name,
       sum(o_totalprice) AS total_sales,
       count(*)          AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    description="Rollup aggregation: region/nation/grand-total sales cube slice",
    # Round-8 rotation (sixth): restored/promoted — r7 verdict item 3
    # (class-coverage guard: grouping extensions and correlated
    # subqueries lost their last exposed sibling in the fifth
    # rotation; kmv joins the surface for first driver evidence).
    driver_exposed=True,
)
def rollup_sales_by_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    geo = (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
    )
    return (
        t["orders"]
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(geo), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("r_name", "n_name")
        .agg(F.sum("o_totalprice").alias("total_sales"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "pivot_orders_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
""",
    description="Pivot: order counts, priority rows × status columns",
    # Round-6 rotation: slot ceded to the round-6 promotions
    # (driver-green in earlier rounds; still benched + pytest-
    # oracle-checked every session).
    driver_exposed=False,
)
def pivot_orders_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    )


@register(
    "segment_customer_stats",
    oracle="""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*)                    AS n_customers,
       avg(c_acctbal)              AS avg_acctbal,
       min(c_acctbal)              AS min_acctbal,
       max(c_acctbal)              AS max_acctbal
FROM customer
GROUP BY c_mktsegment
""",
    description="Exact distinct aggregation + multi-agg per segment",
    # Ceded its driver slot round 4; the multi-agg groupBy class stays
    # covered by q1/corpus_stats_by_source.
    driver_exposed=False,
)
def segment_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            F.avg("c_acctbal").alias("avg_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
    )


@register(
    "part_scalar_expressions",
    oracle="""
SELECT p_partkey,
       upper(p_brand)                             AS brand_upper,
       substr(p_name, 1, 8)                       AS name_prefix,
       length(p_name)::BIGINT                     AS name_len,
       round(p_retailprice * 1.1, 2)              AS price_with_tax,
       abs(p_retailprice - 1000.0)                AS price_dist_1000,
       CASE WHEN p_size >= 25 THEN 'LARGE'
            WHEN p_size >= 10 THEN 'MEDIUM'
            ELSE 'SMALL' END                      AS size_class,
       concat(p_brand, ':', p_type)               AS brand_type
FROM part
WHERE p_size BETWEEN 5 AND 45
""",
    description="Scalar function library: string/math/conditional expressions",
)
def part_scalar_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(F.col("p_size").between(5, 45))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
            F.abs(F.col("p_retailprice") - 1000.0).alias("price_dist_1000"),
            F.when(F.col("p_size") >= 25, "LARGE")
            .when(F.col("p_size") >= 10, "MEDIUM")
            .otherwise("SMALL")
            .alias("size_class"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        )
    )


@register(
    "orders_above_customer_avg",
    oracle="""
WITH stats AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM stats
WHERE o_totalprice > 1.5 * cust_avg
""",
    description="Analytic window: orders 1.5x above their customer's average",
    # Round-8 rotation (sixth): restored/promoted — r7 verdict item 3
    # (class-coverage guard: grouping extensions and correlated
    # subqueries lost their last exposed sibling in the fifth
    # rotation; kmv joins the surface for first driver evidence).
    driver_exposed=True,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.avg("o_totalprice").over(w).alias("cust_avg"),
        )
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
    )


@register(
    "high_balance_parties",
    oracle="""
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS party
FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS party
FROM supplier WHERE s_acctbal > 9000
""",
    description="Set operation: union of high-balance customers and suppliers",
    # Ceded its driver slot to the round-4 pipeline classes; the set-op
    # class stays covered by intersect_customers.
    driver_exposed=False,
)
def high_balance_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"), F.lit("customer").alias("party"))
    )
    s = (
        t["supplier"]
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"), F.lit("supplier").alias("party"))
    )
    return c.unionAll(s)
