"""Second wave of TPC-H-adapted analytics (B-series extension).

The driver's schema has no partsupp table and no
commit/receipt dates, so the queries that need them (Q2, Q4, Q11,
Q16, Q17, Q20, Q21) are adapted: the part-supplier relationship is
derived from lineitem history (distinct (l_partkey, l_suppkey) with
min unit price as the offer), and date-lag predicates use
shipdate-vs-orderdate. Join shapes, subquery patterns, and
aggregation structure are preserved — that is what exercises the
optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators._helpers import dec, money
from cdk_serverless_data_lake_sandbox_spark.registry import register

_ONE = "CAST(1 AS DECIMAL(18,4))"


# ---------------------------------------------------------------- B22 (Q2 adapted)
_Q2_ORACLE = """
WITH offers AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
    MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT partkey, MIN(unit_price) AS best_price FROM offers GROUP BY 1
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, o.unit_price
FROM offers o
JOIN best b ON o.partkey = b.partkey AND o.unit_price = b.best_price
JOIN part p ON p.p_partkey = o.partkey
JOIN supplier s ON s.s_suppkey = o.suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size <= 10
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per part, the supplier offering the minimum unit
    price (correlated-min subquery become a join against the grouped
    minimum — one shuffle on partkey feeds both)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    offers = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offers.groupBy("partkey").agg(F.min("unit_price").alias("best_price"))
    return (
        offers.join(best, ["partkey"])
        .where(F.col("unit_price") == F.col("best_price"))
        .join(F.broadcast(t["part"].where(F.col("p_size") <= 10)), F.col("p_partkey") == F.col("partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_price")
    )


# ---------------------------------------------------------------- B23 (Q4 adapted)
_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: priority counts for orders having a late-shipped
    line (EXISTS -> left-semi join with a non-equi conjunct)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------- B24 (Q7)
_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    YEAR(l.l_shipdate) AS l_year,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,4))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE n1.n_nationkey <> n2.n_nationkey
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume by year between two nations."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(18,4)")
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(F.col("n1_key") != F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money(F.sum(dec("l_extendedprice") * (one - dec("l_discount")))).alias("revenue"))
    )


# ---------------------------------------------------------------- B25 (Q8)
_Q8_ORACLE = f"""
SELECT o_year,
  CAST(SUM(CASE WHEN nation = 'BRAZIL' THEN volume
      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT YEAR(o.o_orderdate) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,4))) AS volume,
    n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: a nation's market share inside a region by year — 8-way
    join, all dims broadcast, single fact shuffle."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    n1 = t["nation"].select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    volume = dec("l_extendedprice") * (one - dec("l_discount"))
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"].where(F.col("p_type") == "ECONOMY")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")), F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("sn_key") == F.col("s_nationkey"))
        .where(
            F.col("o_orderdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "BRAZIL", volume).otherwise(zero)).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------- B26 (Q9 adapted)
_Q9_ORACLE = f"""
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,4)))
      - CAST(l.l_quantity AS DECIMAL(18,4))
        * CAST(p.p_retailprice AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(18,4))
      AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year (supply cost
    approximated from p_retailprice — no partsupp in this schema)."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(18,4)")
    cost_rate = F.lit(0.1).cast("decimal(18,4)")
    amount = dec("l_extendedprice") * (one - dec("l_discount")) - dec("l_quantity") * dec(
        "p_retailprice"
    ) * cost_rate
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["part"].where(F.col("p_name").like("%red%"))), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money(F.sum(amount)).alias("sum_profit"))
    )


# ---------------------------------------------------------------- B27 (Q11 adapted)
_Q11_ORACLE = """
WITH stock AS (
  SELECT l_suppkey, l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
  FROM lineitem GROUP BY 1, 2
)
SELECT l_partkey, CAST(ROUND(CAST(SUM(value) AS DECIMAL(18,2)), 2) AS DOUBLE) AS part_value
FROM stock
GROUP BY l_partkey
HAVING SUM(value) > (
  SELECT 1.5 * SUM(value) / COUNT(DISTINCT l_partkey) FROM stock
)
"""


@register("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose traded value exceeds 1.5x the mean part
    value — grouped agg + scalar-subquery HAVING (the global
    threshold broadcast back, no driver round-trip)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    stock = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_extendedprice", 2)).cast("double").alias("value"))
    )
    total = stock.agg(
        (F.lit(1.5) * F.sum("value") / F.count_distinct("l_partkey")).alias("_threshold")
    )
    return (
        stock.groupBy("l_partkey")
        .agg(F.sum("value").alias("_pv"))
        .crossJoin(F.broadcast(total))
        .where(F.col("_pv") > F.col("_threshold"))
        .select(
            "l_partkey",
            money(F.col("_pv").cast("decimal(18,2)")).alias("part_value"),
        )
    )


# ---------------------------------------------------------------- B28 (Q13)
_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: order-count histogram over customers, left join with an
    extra join-side predicate (kept on the join, not the filter — the
    semantics TPC-H is testing)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    o = t["orders"].where(F.col("o_orderpriority") != "1-URGENT")
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------- B29 (Q15)
_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max quarterly revenue — the revenue CTE
    is computed once and reused for both the max and the join."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    one = F.lit(1).cast("decimal(18,4)")
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money(F.sum(dec("l_extendedprice") * (one - dec("l_discount")))).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------- B30 (Q16 adapted)
_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_parts_supplier", oracle=_Q16_ORACLE)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part bucket with a
    NOT-IN exclusion (anti join on the complaint-supplier set)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    return (
        t["lineitem"]
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- B31 (Q17)
_Q17_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("q17_small_quantity", oracle=_Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from small-quantity orders vs the per-part average
    — the correlated AVG subquery becomes a grouped aggregate joined
    back on partkey (one extra shuffle instead of n subquery scans)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_qty_cut")
    )
    return (
        li.join(F.broadcast(t["part"].where(F.col("p_brand") == "Brand#2")), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("_pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("_qty_cut"))
        .agg(
            (money(F.sum(dec("l_extendedprice", 2))) / F.lit(7.0)).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------- B32 (Q20 adapted)
_Q20_ORACLE = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 100
)
"""


@register("q20_promo_suppliers", oracle=_Q20_ORACLE)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers that moved significant PROMO volume in a
    year (IN-subquery with HAVING -> aggregate + semi join)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    movers = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(t["part"].where(F.col("p_type") == "PROMO")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------- B42 (Q12 adapted)
_Q12_ORACLE = """
SELECT l.l_returnflag AS ship_class,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@register("q12_shipmode_priority", oracle=_Q12_ORACLE)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: priority split of late-shipped lines per line class
    (no l_shipmode/commitdate in this schema, so l_returnflag stands in
    for the mode and the commit-lag predicate is shipdate-vs-orderdate).
    The conditional split is two CASE sums in one aggregation pass."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")),
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------- B33 (Q21 adapted)
_Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s JOIN (
  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
    )
) waiting ON waiting.l_suppkey = s.s_suppkey
GROUP BY s.s_name
"""


@register("q21_waiting_supplier", oracle=_Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the sole supplier who shipped late on a
    multi-supplier order. The EXISTS + NOT-EXISTS pair becomes one
    pre-aggregated per-(order, supplier) profile: a single lineitem
    scan, one shuffle on orderkey feeding both the per-supplier flag
    and the per-order counts — instead of three correlated rescans."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    f_orders = t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", (F.col("l_shipdate") > late_cut).cast("int"))
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("is_late").alias("supp_late"))
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"), F.sum("supp_late").alias("n_late_supps")
    )
    culprit = (
        per_supp.where(F.col("supp_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    return (
        culprit.join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------- B34 (Q22 adapted)
_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
  CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
"""


@register("q22_global_sales", oracle=_Q22_ORACLE)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: wealthy-but-dormant customers per country bucket —
    scalar-subquery threshold + anti join."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    avg_bal = (
        t["customer"].where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("_a"))
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        t["customer"]
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            money(F.sum(dec("c_acctbal", 2))).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------- B91
_RECON_ORACLE = """
WITH calc AS (
  SELECT l_orderkey,
    SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS computed
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderstatus AS status, o.o_totalprice, c.computed,
    ABS(o.o_totalprice - c.computed) AS delta
  FROM orders o JOIN calc c ON c.l_orderkey = o.o_orderkey
)
SELECT status,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(COUNT(*) FILTER (WHERE delta > 0.01) AS BIGINT) AS n_mismatched,
  CAST(ROUND(SUM(delta), 2) AS DOUBLE) AS total_abs_delta,
  CAST(ROUND(MAX(delta), 2) AS DOUBLE) AS max_abs_delta
FROM j GROUP BY status
"""


@register("order_reconciliation", oracle=_RECON_ORACLE)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalization audit: does each order's stored total equal the
    total recomputed from its line items (extendedprice x (1-disc) x
    (1+tax))? The reconciliation every warehouse runs after ingest —
    a nonzero mismatch count localizes silent corruption (partial
    loads, currency/rounding drift, missed CDC deletes) to a status
    class before anyone trusts a revenue number downstream.

    Scale: one map-side-combinable aggregation over lineitem, one
    shuffle join on the order key (the natural key both tables are
    bucketed on in D2's layout), and a tiny per-status rollup. Sums
    are DECIMAL until the final delta so accumulation order cannot
    manufacture mismatches."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    calc = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
                * (F.lit(1).cast("decimal(18,4)") + F.col("l_tax").cast("decimal(18,4)"))
            ).alias("computed")
        )
    )
    j = t["orders"].join(
        calc, t["orders"].o_orderkey == calc.l_orderkey
    ).select(
        F.col("o_orderstatus").alias("status"),
        F.abs(
            F.col("o_totalprice").cast("decimal(24,8)")
            - F.col("computed").cast("decimal(24,8)")
        )
        .cast("double")
        .alias("delta"),
    )
    return j.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("delta") > 0.01, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        F.round(F.sum("delta"), 2).alias("total_abs_delta"),
        F.round(F.max("delta"), 2).alias("max_abs_delta"),
    )


# ---------------------------------------------------------------- B118
_HIER_ORACLE = """
WITH RECURSIVE chain(suppkey, root, depth, bal) AS (
  SELECT s_suppkey, s_suppkey, 0, CAST(s_acctbal AS DECIMAL(18,2))
  FROM supplier WHERE s_suppkey < 10
  UNION ALL
  SELECT s.s_suppkey, c.root, c.depth + 1,
    CAST(s.s_acctbal AS DECIMAL(18,2))
  FROM supplier s JOIN chain c ON s.s_suppkey // 10 = c.suppkey
  WHERE s.s_suppkey >= 10
)
SELECT root AS root_suppkey,
  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(MAX(depth) AS INTEGER) AS max_depth,
  CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS subtree_acctbal
FROM chain GROUP BY root ORDER BY root
"""


@register("supplier_hierarchy_rollup", oracle=_HIER_ORACLE)
def supplier_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive reporting-chain rollup via a RECURSIVE CTE — the
    Spark 4 engine feature (WITH RECURSIVE landed in 4.0) exercised
    as a first-class operator: suppliers form a synthetic hierarchy
    (parent = suppkey div 10, roots below 10 — the decimal-trie shape
    a real org/BOM table would carry as an explicit parent column),
    and the recursion computes every supplier's root, depth, and the
    per-root subtree size/DECIMAL balance rollup. The iterative
    union-expansion is executed BY CATALYST (each recursion step is
    one distributed join), not a driver loop — the declarative form
    of the graph module's hand-rolled iterations, correct wherever
    the hierarchy is a forest (guaranteed here: parent < child).

    DuckDB replays the identical WITH RECURSIVE (both engines follow
    the SQL-standard UNION ALL semantics), so the report is
    hash-exact."""
    t = load_tables(spark, sf_dir, ("supplier",))["supplier"]
    t.createOrReplaceTempView("_supplier_hier_src")
    return spark.sql("""
WITH RECURSIVE chain(suppkey, root, depth, bal) AS (
  SELECT s_suppkey, s_suppkey, 0, CAST(s_acctbal AS DECIMAL(18,2))
  FROM _supplier_hier_src WHERE s_suppkey < 10
  UNION ALL
  SELECT s.s_suppkey, c.root, c.depth + 1,
    CAST(s.s_acctbal AS DECIMAL(18,2))
  FROM _supplier_hier_src s JOIN chain c ON s.s_suppkey DIV 10 = c.suppkey
  WHERE s.s_suppkey >= 10
)
SELECT root AS root_suppkey,
  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(MAX(depth) AS INT) AS max_depth,
  CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS subtree_acctbal
FROM chain GROUP BY root ORDER BY root
""")
