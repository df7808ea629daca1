"""Subquery corpus: EXISTS / IN / correlated-scalar shapes (SURVEY.md §4.1
"subquery decorrelation" — built-in Catalyst `RewriteCorrelatedScalarSubquery`
and `RewritePredicateSubquery` rules; reference parity context:
elasticsearch-hadoop delegates all of this to Spark, exercised in its itests
`spark/sql-20/.../AbstractScalaEsSparkSQL.scala`).

These queries deliberately go through ``spark.sql`` over temp views rather
than the DataFrame API: the SQL entry point is part of the §2.C surface, and
subqueries are where Catalyst's rewrites (decorrelation into left-semi /
left-outer aggregate joins) do real work.

Scale notes:
- EXISTS / IN decorrelate to shuffle left-semi joins on the correlation key —
  same cost profile as an equi join; at 100 TB bucket both sides on the key.
- Correlated scalar aggregates decorrelate to a grouped pre-aggregate joined
  back on the key: one extra shuffle over the group key, map-side partials
  keep it cheap. Never evaluated per-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (kept for parity with siblings)

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


def _views(spark, sf_dir, *names):
    for n in names:
        tbl(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "subq_exists_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def subq_exists_priority(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS → Catalyst rewrites to a left-semi
    join on l_orderkey (check: plan shows LeftSemi, not a per-row subplan)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "subq_scalar_uncorrelated",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem
WHERE l_quantity < (SELECT avg(l_quantity) FROM lineitem) * 0.5
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def subq_scalar_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery: the inner avg runs once (broadcast as a
    literal into the filter), not per row."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_small
        FROM lineitem
        WHERE l_quantity < (SELECT avg(l_quantity) FROM lineitem) * 0.5
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "subq_correlated_scalar",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def subq_correlated_scalar(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar AVG per part — decorrelates to a
    grouped pre-aggregate on l_partkey joined back (one shuffle, no per-row
    re-execution)."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """
    )


@query(
    "subq_in_big_orders",
    oracle="""
SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total,
       round(qty_sum, 2) AS qty_sum
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (SELECT l_orderkey, sum(l_quantity) AS qty_sum
      FROM lineitem GROUP BY l_orderkey) lq ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 100)
ORDER BY o_orderkey
""",
)
def subq_in_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped HAVING subquery → left-semi join
    against the aggregated key set."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total,
               round(qty_sum, 2) AS qty_sum
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN (SELECT l_orderkey, sum(l_quantity) AS qty_sum
              FROM lineitem GROUP BY l_orderkey) lq ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 100)
        ORDER BY o_orderkey
        """
    )


@query(
    "subq_not_in_inactive",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_never_ordered
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def subq_not_in_inactive(spark, sf_dir):
    """NOT IN (null-aware anti join). o_custkey is non-null in the fixture,
    so NOT IN ≡ NOT EXISTS here; Spark still plans the null-aware variant."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT count(*) AS n_never_ordered
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """
    )
