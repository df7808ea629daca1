"""Window-function corpus: ranking, analytic, running frames, range frames,
top-k per group (SURVEY.md §2.C "Windows", "Sort/limit/top-k").

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort.  partitionBy keys here are mid-cardinality (custkey, user_id, brand)
so partitions stay small; a window WITHOUT partitionBy (global sort) is
avoided everywhere except where semantically required — that's the
100 TB trap.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer: row_number + filter — the distributed
    top-k-per-group idiom (each group sorted independently after one
    shuffle; no global sort)."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_ranking",
    oracle="""
SELECT p_brand, p_partkey,
       CAST(rank()        OVER w AS BIGINT) AS rnk,
       CAST(dense_rank()  OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)      OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS prank
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
ORDER BY p_brand, rnk, p_partkey
""",
)
def window_ranking(spark, sf_dir):
    """rank / dense_rank / ntile / percent_rank over parts per brand."""
    p = tbl(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
        )
        .orderBy("p_brand", "rnk", "p_partkey")
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT user_id, event_id,
       round(value, 6) AS value,
       round(lag(value)  OVER w, 6) AS prev_value,
       round(lead(value) OVER w, 6) AS next_value,
       lag(event_type) OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""",
)
def window_lag_lead(spark, sf_dir):
    """lag/lead analytic over each user's event timeline (tie-broken by
    event_id for determinism)."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(F.lag("value").over(w), 6).alias("prev_value"),
            F.round(F.lead("value").over(w), 6).alias("next_value"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_frames",
    oracle="""
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS running_sum,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
       round(cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS cdist,
       first(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_type,
       last(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_type
FROM events
ORDER BY user_id, event_id
""",
)
def window_running_frames(spark, sf_dir):
    """Running sum, moving average (ROWS frame), cume_dist, first/last."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
                "running_sum"
            ),
            F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg3"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .alias("last_type"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_range_frame",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey
                           RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
FROM customer
ORDER BY c_custkey
""",
)
def window_range_frame(spark, sf_dir):
    """RANGE frame on a numeric ordering column (value-based, not
    row-based)."""
    c = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey").rangeBetween(-10, 0)
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.count(F.lit(1)).over(w).alias("n_near"),
        )
        .orderBy("c_custkey")
    )
