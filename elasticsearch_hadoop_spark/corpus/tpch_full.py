"""Remaining TPC-H query shapes (Q2, Q7, Q8, Q9, Q11, Q13, Q15, Q16, Q21,
Q22), adapted to the fixture schema (no partsupp / comment / phone /
commitdate columns — see FIXTURES.md; part-supplier relationships are
derived as ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``), plus a
salted-skew-join corpus entry backed by operators/skew.py.

Together with tpch_more.py (Q1/Q3/Q5/Q6/Q10/Q12/Q14/Q19) and the subquery
corpus (Q4/Q17/Q18 shapes) this completes the 22-query TPC-H surface the
reference's itests exercise via Spark over scanned data
(AbstractScalaEsSparkSQL.scala class of queries — SURVEY.md §2.C).

Scale notes: dims (part, supplier, nation, region, customer at these
ratios) broadcast; the only fact-side shuffles are on join/group keys.
Correlated subqueries are written so Catalyst decorrelates them to joins
(check: no per-row subplan re-execution in the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.skew import salted_join


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM part, ps, supplier, nation
WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
  AND s_nationkey = n_nationkey
  AND p_size = 15 AND p_type = 'PROMO'
  AND s_acctbal = (SELECT max(s2.s_acctbal)
                   FROM ps ps2, supplier s2
                   WHERE ps2.l_partkey = p_partkey
                     AND s2.s_suppkey = ps2.l_suppkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 20
""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier → max-acctbal supplier; the fixture
    has no partsupp, so part↔supplier pairs derive from lineitem). The
    correlated max is a window max over p_partkey in Spark — one shuffle on
    partkey instead of a re-executed subquery; dims broadcast."""
    li = tbl(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey"), F.col("l_suppkey")).distinct()
    p = tbl(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    joined = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("__max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__max_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(20)
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year. Both nation copies and
    supplier/customer broadcast; lineitem⋈orders is the one big shuffle."""
    s = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO') all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: a nation's market share inside a region, per year. All
    dims broadcast; the fact flows through one orderkey shuffle then a
    tiny per-year aggregation."""
    p = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * l_quantity * 0.1 AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and year. The fixture has
    no ps_supplycost; cost is modeled as 10% of p_retailprice × quantity —
    same join/agg topology, deterministic values."""
    p = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = tbl(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q11_important_suppliers",
    oracle="""
SELECT l_suppkey, round(sum(l_extendedprice * l_quantity), 2) AS value
FROM lineitem
GROUP BY l_suppkey
HAVING sum(l_extendedprice * l_quantity) >
       (SELECT sum(l_extendedprice * l_quantity) * 1.05
               / count(DISTINCT l_suppkey) FROM lineitem)
ORDER BY value DESC, l_suppkey
""",
)
def q11_important_suppliers(spark, sf_dir):
    """TPC-H Q11 shape (partsupp value → lineitem value by supplier):
    grouped HAVING against an uncorrelated scalar threshold. The threshold
    is scale-free (1.05× the average supplier's value — TPC-H's own Q11
    fraction is 0.0001/SF for the same reason), so the result is non-empty
    at every sf. The scalar agg is a 1-row broadcast (crossJoin), never a
    driver collect — the same plan works when lineitem is 100 TB."""
    li = tbl(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(val).alias("__raw_value"))
    threshold = li.agg(
        (F.sum(val) * 1.05 / F.countDistinct("l_suppkey")).alias("__threshold")
    )
    return (
        per_supp.crossJoin(F.broadcast(threshold))
        .filter(F.col("__raw_value") > F.col("__threshold"))
        .select(
            "l_suppkey", F.round(F.col("__raw_value"), 2).alias("value")
        )
        .orderBy(F.col("value").desc(), "l_suppkey")
    )


@query(
    "q13_order_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts. Left outer
    join keeps order-less customers (count 0); second agg is over a tiny
    (distinct-count-sized) intermediate."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (SELECT l_suppkey AS supplier_no,
                        round(sum(l_extendedprice * (1 - l_discount)), 2)
                          AS total_revenue
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue. Revenue is
    rounded to 2 dp on BOTH sides before the max-equality compare so float
    noise can't make the engines disagree on the argmax. Window max over an
    unpartitioned frame on the tiny per-supplier aggregate (100 rows)."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    s = tbl(spark, sf_dir, "supplier")
    w = Window.partitionBy()
    return (
        revenue.withColumn("__max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (partsupp → lineitem-derived pairs): distinct
    supplier count per brand/type/size. Distinct-agg expands to a two-phase
    hash aggregate; part broadcasts into the fact scan."""
    p = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
  AND s_nationkey = n_nationkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (no commit/receipt dates in the fixture, so "late" =
    shipped >60 days after order date): suppliers who were the sole last
    shipper in a multi-supplier finished order. EXISTS/NOT EXISTS become
    left-semi and left-anti joins on l_orderkey — three shuffles on the same
    key, which Spark co-partitions (exchange reuse), no per-row subqueries."""
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = tbl(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    late = (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    multi = late.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    sole_last = multi.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey"))
        & (F.col("l3_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        sole_last.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
SELECT cntry, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM (SELECT c_nationkey AS cntry, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 2, 3, 4, 5)
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0
                           AND c_nationkey IN (1, 2, 3, 4, 5))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
     ) custsale
GROUP BY cntry
ORDER BY cntry
""",
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (phone-prefix → nation-key membership): well-funded
    customers in target countries with no RECENT (>= 2000-01-01) orders —
    the fixture's order coverage is dense enough that "never ordered"
    matches nobody, which would make the check vacuous. The avg is a 1-row
    broadcast; NOT EXISTS is a left-anti join against the date-filtered
    orders keyed on custkey."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(1, 2, 3, 4, 5))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    o = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@query(
    "skew_salted_join",
    oracle="""
SELECT o_orderpriority, round(sum(l_extendedprice), 2) AS rev,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def skew_salted_join(spark, sf_dir):
    """Salted skew join (operators/skew.py): the fact side gets a random
    salt in [0,8), the orders side is exploded 8×, and the join key becomes
    (orderkey, salt) — a single hot orderkey spreads over 8 reducers. The
    oracle is the PLAIN join: salting must be result-invariant."""
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, on=["o_orderkey"], how="inner", num_salts=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "order_nulls_explicit",
    oracle="""
SELECT c_custkey, rev
FROM (SELECT c_custkey, round(sum(o_totalprice), 2) AS rev
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey
       AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY c_custkey) t
ORDER BY rev ASC NULLS FIRST, c_custkey
""",
)
def order_nulls_explicit(spark, sf_dir):
    """Null-ordering semantics (SURVEY.md §7 step 3 watch item): Spark's
    ASC default is NULLS FIRST, DuckDB's is NULLS LAST — every sort on a
    nullable key must say which.  The key here is genuinely nullable
    (customers with no recent orders aggregate an all-null group -> NULL
    revenue); both sides pin NULLS FIRST explicitly."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy(F.col("rev").asc_nulls_first(), F.col("c_custkey"))
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4: order-priority checking.  The fixture has no
    l_commitdate/l_receiptdate, so "late" is adapted to shipped >60 days
    after the order date (SURVEY.md §2.C subquery surface; same EXISTS →
    left-semi decorrelation as the reference's Q4 pushdown tests).
    Scale: the quarter filter is pushed to the orders scan; the semi join
    shuffles both sides once on orderkey with the non-equi lateness
    predicate evaluated inside the join — no per-row subplan."""
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'PROMO'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: small-quantity-order revenue.  The correlated scalar AVG
    per part becomes a window AVG over l_partkey AFTER the broadcast join
    with the filtered part dim — correct because the part filter touches
    only part attributes, so the joined set still holds every lineitem of
    each qualifying part.  One broadcast + one shuffle on partkey; no
    re-executed subquery (the DuckDB oracle keeps the correlated form)."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "PROMO")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customer",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 280)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: large-volume customer (IN over a grouped HAVING).  Spark
    computes the per-order quantity total ONCE (groupBy orderkey, map-side
    partial agg) and reuses it as both the IN filter and the output column
    — the oracle's second sum over the joined rows is identical by
    construction.  The >280 HAVING leaves a tiny key set, so the join into
    orders/customer broadcasts the aggregated side; at 100 TB the same
    plan holds because the HAVING output stays small relative to the
    fact."""
    li = tbl(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 280)
    )
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "q20_potential_promotion",
    oracle="""
SELECT s_name, n_name, s_suppkey
FROM supplier, nation
WHERE s_nationkey = n_nationkey
  AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem, part
      WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 45)
ORDER BY s_name
""",
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20: potential part promotion.  The fixture has no partsupp/
    ps_availqty, so "excess stock" is adapted to suppliers who shipped >45
    units of any 'small%' part during 1996 (nested grouped-HAVING IN, the
    same two-level subquery shape).  Scale: part filter broadcasts into the
    lineitem scan (prefix LIKE stays JVM-side), the grouped HAVING is one
    shuffle on (suppkey, partkey), and the surviving supplier keys flow
    into a left-semi join against the supplier dim."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 45)
        .select("l_suppkey")
        .distinct()
    )
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    return (
        s.join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name", "s_suppkey")
        .orderBy("s_name")
    )
