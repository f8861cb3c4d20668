"""Remaining TPC-H query shapes, adapted to the pruned star schema.

The testdata schema has no ``partsupp`` and drops several TPC-H columns
(``l_shipmode``/``l_commitdate``/``l_receiptdate``, ``c_phone``,
``p_container``/``p_mfgr`` — FIXTURES.md §2), so the queries that depend
on them are re-targeted at the columns that exist while keeping the
operator shape that makes each query interesting: correlated scalar
subqueries (Q17), scalar-subquery thresholds against a global aggregate
(Q11, Q15, Q22), multi-way dimension joins with conditional shares
(Q8, Q12), per-group distinct counts (Q16), and window-equality
self-joins (Q2, Q21).

The reference implements zero relational operators (SURVEY.md §2.2);
this corpus is part of the rebuild's query layer. Scale posture follows
relational.py: dimension sides broadcast, aggregates declared via
groupBy/agg so Catalyst plans map-side partial aggregation, and
scalar-subquery thresholds computed once and broadcast rather than
recomputed per row.

Registered with ``driver_exposed=False``: the driver's correctness
report caps at 50 entries and the exposed surface already covers every
category; these are benched and pytest-oracle-checked via
``all_queries()`` (tests/test_oracle_parity.py parametrizes over the
full registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    AND r_name = 'EUROPE'
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
FROM costs
WHERE unit_cost = (SELECT min(unit_cost) FROM costs c2
                   WHERE c2.p_partkey = costs.p_partkey)
""",
    description=(
        "TPC-H Q2 (adapted: observed lineitem unit price stands in for the "
        "absent partsupp supplycost): cheapest EUROPE supplier per STANDARD "
        "mid-size part, correlated-min subquery as a window equality"
    ),
    driver_exposed=False,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    europe_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        t["part"]
        .where((F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    costs = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(europe_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # min-over-part window ≡ the correlated subquery; both sides compare
    # doubles each engine derived from identical per-row divisions, so the
    # equality is exact.
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("part_min", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("part_min"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")
    )


@register(
    "q8_market_share",
    oracle="""
SELECT year(o_orderdate) AS o_year,
       sum(CASE WHEN n2.n_name = 'NATION_5'
                THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
         / sum(l_extendedprice * (1 - l_discount)) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey  = p_partkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY year(o_orderdate)
""",
    description=(
        "TPC-H Q8 (adapted: supplier nation stands in for the absent "
        "p_mfgr): NATION_5's share of ASIA's ECONOMY-part revenue by year"
    ),
    driver_exposed=False,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_cust = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select(F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       sum(floor(l_extendedprice * (1 - l_discount) * 64) / 64) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
    description=(
        "TPC-H Q9 (adapted: discounted revenue stands in for profit — no "
        "partsupp supplycost): per supplier-nation yearly revenue on "
        "name-matched parts. Per-row revenue is quantized to 1/64 so the "
        "sum is associative-exact in double — the plain double sum differs "
        "from the oracle's in the 9th significant digit (accumulation "
        "order), which is exactly the canonicalizer's precision"
    ),
    driver_exposed=False,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    red_parts = t["part"].where(F.col("p_name").like("%red%")).select("p_partkey")
    supp_nation = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 64) / 64
            ).alias("sum_profit")
        )
    )


@register(
    "q11_important_parts",
    oracle="""
WITH part_value AS (
  SELECT l_partkey, sum(floor(l_extendedprice * (1 - l_discount) * 64) / 64) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM part_value
WHERE value > (SELECT sum(value) * 0.002 FROM part_value)
""",
    description=(
        "TPC-H Q11 (adapted: shipped revenue stands in for stock value — "
        "no partsupp): parts above a scalar-subquery share of NATION_3's "
        "total, threshold computed once and broadcast. Per-row revenue is "
        "quantized to 1/64 so per-part sums (and hence the threshold cut) "
        "are associative-exact in double across engines"
    ),
    driver_exposed=False,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    nation_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    part_value = (
        t["lineitem"]
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 64) / 64
            ).alias("value")
        )
    )
    threshold = part_value.agg((F.sum("value") * F.lit(0.002)).alias("threshold"))
    return (
        part_value.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
SELECT l_linestatus,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))     AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
""",
    description=(
        "TPC-H Q12 (adapted: 90-day ship lag stands in for the absent "
        "commit/receipt dates, linestatus for shipmode): priority mix of "
        "late shipments"
    ),
    driver_exposed=False,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    description="TPC-H Q15: quarterly top supplier via scalar max subquery",
    # Mid-round-5 rotation: driver-green r3-r4; ceded its slot to
    # cohort_retention (analytics_ext.py). The view+agg+scalar-subquery
    # shape stays driver-covered by q5 / orders_above_customer_avg.
    driver_exposed=False,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
""",
    description=(
        "TPC-H Q16 (adapted: observed shippers stand in for the absent "
        "partsupp relation): distinct supplier count per part segment"
    ),
    driver_exposed=False,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(parts.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
""",
    description=(
        "TPC-H Q17: small-quantity order revenue, correlated per-part avg "
        "subquery as a pre-aggregated broadcast join"
    ),
    # Round-5 rotation: slot ceded to knn_sq8_rerank (driver-green r3-r4
    # here; still benched + pytest-oracle-checked every session).
    driver_exposed=False,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#23").select("p_partkey")
    # The correlated avg ranges over ALL lineitems of the part (not just the
    # brand-filtered ones), so compute it before the brand semi-join.
    part_avg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cutoff"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg((F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 100
  )
""",
    description=(
        "TPC-H Q20 (adapted: shipped quantity stands in for the absent "
        "partsupp availqty): NATION_7 suppliers who moved >100 units of "
        "red parts in 1997, IN-subquery as semi join over a HAVING agg"
    ),
    driver_exposed=False,
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    red_parts = t["part"].where(F.col("p_name").like("red%")).select("p_partkey")
    movers = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_last_to_ship_suppliers",
    oracle="""
WITH order_ship AS (
  SELECT l_orderkey,
         max(l_shipdate) AS last_ship,
         count(DISTINCT l_suppkey) AS n_suppliers
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name,
       count(DISTINCT l.l_orderkey) AS numwait
FROM lineitem l
JOIN order_ship os ON l.l_orderkey = os.l_orderkey
                  AND l.l_shipdate = os.last_ship
JOIN supplier ON l.l_suppkey = s_suppkey
WHERE os.n_suppliers >= 2
GROUP BY s_name
""",
    description=(
        "TPC-H Q21 (adapted: latest shipper stands in for the absent "
        "receipt/commit lateness): per supplier, how many multi-supplier "
        "finalized orders it was last to ship"
    ),
    driver_exposed=False,
)
def q21_last_to_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    f_orders = t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = t["lineitem"].join(
        f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    order_ship = (
        li.groupBy("l_orderkey")
        .agg(
            F.max("l_shipdate").alias("last_ship"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
        .where(F.col("n_suppliers") >= 2)
        .select(F.col("l_orderkey").alias("os_orderkey"), "last_ship")
    )
    return (
        li.join(
            order_ship,
            (F.col("l_orderkey") == F.col("os_orderkey"))
            & (F.col("l_shipdate") == F.col("last_ship")),
        )
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH wealthy AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
)
SELECT c_nationkey,
       count(*)        AS numcust,
       sum(c_acctbal)  AS totacctbal
FROM wealthy w
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = w.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
)
GROUP BY c_nationkey
""",
    description=(
        "TPC-H Q22 (adapted: nation key stands in for the absent phone "
        "country code; recent-order anti join for the empty no-orders "
        "case): wealthy customers idle since 1999, scalar-subquery "
        "threshold + anti join"
    ),
    driver_exposed=False,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent_orders = t["orders"].where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01"))
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("c_acctbal").alias("totacctbal"),
        )
    )
