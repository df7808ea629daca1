"""Join corpus: equi joins (shuffle + broadcast), every outer flavor,
semi/anti, cross, theta, and the CUSTOM as-of join (SURVEY.md §2.C "Joins").

Scale notes per query in docstrings; the general rules applied:
- dimension tables (region/nation/supplier/customer at TPC-H ratios) are
  broadcast — F.broadcast() pins it even if stats are stale;
- fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE handles
  skew; at 100 TB both sides would be bucketed on the key to skip the
  shuffle entirely (see elasticsearch_hadoop_spark/catalog.py bucketing);
- as-of uses the union-tag O(n log n) recipe, never a pair-range join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.asof import asof_join


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: broadcast(customer) ⋈ orders ⋈ lineitem, agg, top-10.

    customer is ~1/40 of lineitem — broadcast side; orders⋈lineitem
    shuffles on orderkey (bucket both by orderkey at 100 TB)."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join with a cross-dimension equality
    (c_nationkey = s_nationkey). region/nation/supplier all broadcast."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey,
       CAST(count(o_orderkey) AS BIGINT) AS n_big_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS big_total
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 300000
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER with an extra join-side predicate (unmatched rows kept)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_total"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 250000),
     rich   AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
SELECT coalesce(b.k, r.k) AS custkey,
       (b.k IS NOT NULL) AS is_big_buyer,
       (r.k IS NOT NULL) AS is_rich
FROM buyers b
FULL OUTER JOIN rich r ON b.k = r.k
ORDER BY custkey
""",
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join of two derived key sets."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    buyers = (
        o.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("k")).distinct()
    )
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    return (
        buyers.alias("b")
        .join(rich.alias("r"), F.col("b.k") == F.col("r.k"), "full_outer")
        .select(
            F.coalesce(F.col("b.k"), F.col("r.k")).alias("custkey"),
            F.col("b.k").isNotNull().alias("is_big_buyer"),
            F.col("r.k").isNotNull().alias("is_rich"),
        )
        .orderBy("custkey")
    )


@query(
    "join_semi_anti",
    oracle="""
SELECT c_custkey, c_name,
       TRUE AS has_urgent
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT c_custkey, c_name, FALSE AS has_urgent
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def join_semi_anti(spark, sf_dir):
    """LEFT SEMI + LEFT ANTI (EXISTS / NOT EXISTS equivalents)."""
    c = tbl(spark, sf_dir, "customer")
    urgent = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("has_urgent", F.lit(True))
    )
    anti = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("has_urgent", F.lit(False))
    )
    return semi.unionByName(anti).orderBy("c_custkey")


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name
FROM region
CROSS JOIN nation
WHERE r_regionkey <> n_regionkey
ORDER BY r_name, n_name
""",
)
def join_cross(spark, sf_dir):
    """Explicit cross join (small × small only — never at fact scale)."""
    r = tbl(spark, sf_dir, "region")
    n = tbl(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "join_theta",
    oracle="""
SELECT a.s_suppkey AS supp_lo, b.s_suppkey AS supp_hi
FROM supplier a
JOIN supplier b ON a.s_acctbal < b.s_acctbal AND a.s_suppkey <> b.s_suppkey
ORDER BY supp_lo, supp_hi
""",
)
def join_theta(spark, sf_dir):
    """Pure theta (non-equi) join -> BroadcastNestedLoopJoin. Only sane on
    a small broadcast side; documented as such."""
    s = tbl(spark, sf_dir, "supplier")
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.s_acctbal") < F.col("b.s_acctbal"))
            & (F.col("a.s_suppkey") != F.col("b.s_suppkey")),
        )
        .select(F.col("a.s_suppkey").alias("supp_lo"), F.col("b.s_suppkey").alias("supp_hi"))
        .orderBy("supp_lo", "supp_hi")
    )


@query(
    "join_range_bucketed",
    oracle="""
SELECT p_size AS size_class,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 2 AND p_size + 2
GROUP BY p_size
ORDER BY p_size
""",
)
def join_range_bucketed(spark, sf_dir):
    """Equi join + residual range predicate: the scalable range-join shape
    (equi key carries the shuffle; range is a cheap post-filter)."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey)
            & (li.l_quantity >= p.p_size - 2)
            & (li.l_quantity <= p.p_size + 2),
        )
        .groupBy(F.col("p_size").alias("size_class"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("size_class")
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
       round(c.value, 6) AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
)
def join_asof(spark, sf_dir):
    """CUSTOM as-of join (operators/asof.py): for each purchase, the most
    recent prior-or-equal click by the same user. DuckDB's native ASOF JOIN
    is the oracle. Union-tag recipe: one shuffle on user_id, O(n log n)."""
    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_value"],
    )
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "user_id",
        F.date_format("matched_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_click_ts"),
        F.round("click_value", 6).alias("last_click_value"),
    ).orderBy("event_id")


def _join_field_frame(spark, sf_dir):
    """The ES join-field data model built from orders (parents) +
    lineitem (children): one frame, `_id` + join_field struct + the
    payload columns either side carries (nulls on the other).  At scale
    the union is two parquet scans — no shuffle until a join-family
    query demands one."""
    o = tbl(spark, sf_dir, "orders").select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("_id"),
        F.struct(
            F.lit("order").alias("name"),
            F.lit(None).cast("string").alias("parent"),
        ).alias("join_field"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("totalprice"),
        F.lit(None).cast("double").alias("quantity"),
    )
    l = tbl(spark, sf_dir, "lineitem").select(
        F.concat(
            F.lit("l"),
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ).alias("_id"),
        F.struct(
            F.lit("line").alias("name"),
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("parent"),
        ).alias("join_field"),
        F.col("l_orderkey").alias("orderkey"),
        F.lit(None).cast("string").alias("priority"),
        F.lit(None).cast("double").alias("totalprice"),
        F.col("l_quantity").alias("quantity"),
    )
    return o.unionByName(l)


@query(
    "join_has_child",
    oracle="""
SELECT o.o_orderkey AS orderkey, o.o_orderpriority AS priority,
       round(o.o_totalprice, 2) AS totalprice
FROM orders o
WHERE (SELECT count(*) FROM lineitem l
       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45) >= 3
ORDER BY orderkey
""",
)
def join_has_child(spark, sf_dir):
    """ES `has_child` with min_children: parent docs (orders) having >= 3
    `line` children with quantity >= 45 — child filter pushes to the
    scan, child counts aggregate per parent key (partial agg), then a
    LEFT SEMI join against the parents (operators/parent_child.py).  The
    matching-key set is small post-filter, so AQE broadcasts it."""
    from elasticsearch_hadoop_spark.operators.parent_child import has_child

    df = _join_field_frame(spark, sf_dir)
    out = has_child(
        df, "line", {"range": {"quantity": {"gte": 45}}}, min_children=3
    )
    return out.select(
        "orderkey", "priority", F.round("totalprice", 2).alias("totalprice")
    ).orderBy("orderkey")


@query(
    "join_has_parent_parent_id",
    oracle="""
WITH urgent AS (
  SELECT l.l_orderkey AS orderkey, l.l_quantity
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
)
SELECT orderkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_quantity), 2) AS sum_qty,
       (orderkey = (SELECT min(o_orderkey) FROM orders
                    WHERE o_orderpriority = '1-URGENT')) AS of_first_parent
FROM urgent
GROUP BY orderkey
ORDER BY orderkey
""",
)
def join_has_parent_parent_id(spark, sf_dir):
    """ES `has_parent` (children of 1-URGENT orders; the filtered parent
    key set broadcasts into the semi join) aggregated per parent, plus
    `parent_id` membership for the first urgent order as a boolean — the
    parent_id path is a plain sargable filter (no join); its key set
    joins back on the unique post-agg orderkey."""
    from elasticsearch_hadoop_spark.operators.parent_child import (
        has_parent,
        parent_id,
    )

    df = _join_field_frame(spark, sf_dir)
    kids = has_parent(df, "order", {"term": {"priority": "1-URGENT"}})
    agg = kids.groupBy("orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("quantity"), 2).alias("sum_qty"),
    )
    first = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    pid_keys = (
        parent_id(df, "line", f"o{first}")
        .select(F.col("orderkey").alias("__k"))
        .distinct()
    )
    out = agg.join(pid_keys, agg["orderkey"] == pid_keys["__k"], "left").select(
        "orderkey",
        "n_lines",
        "sum_qty",
        F.col("__k").isNotNull().alias("of_first_parent"),
    )
    return out.orderBy("orderkey")
