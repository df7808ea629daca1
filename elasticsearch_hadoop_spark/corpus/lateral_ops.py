"""Lateral / generator / map / pivot corpus (SURVEY.md §2.C "Scalar
functions" array+map rows, "Set ops", plus pivot/unpivot reshaping).

Reference-parity context: ES documents routinely hold arrays and open-keyed
objects; the connector surfaces them as ArrayType/StructType columns
(SchemaUtils.scala†, ScalaRowValueReader.scala†) and leaves explode/flatten
to Spark. These queries are that Spark side, over the fixture columns.

Scale notes: explode is a narrow transformation (no shuffle — row fan-out
within the partition); the only shuffles here are the final groupBys. Pivot
with an explicit value list avoids the extra distinct-values job.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "lateral_explode_tokens",
    oracle="""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 25
""",
)
def lateral_explode_tokens(spark, sf_dir):
    """explode(split(text)) → token frequency top-25. The generator runs
    inside the scan stage; only the (token → partial count) agg shuffles."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(25)
    )


@query(
    "lateral_posexplode",
    oracle="""
SELECT doc_id,
       unnest(range(len(toks))) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < 10)
ORDER BY doc_id, pos
""",
)
def lateral_posexplode(spark, sf_dir):
    """posexplode: token with its 0-based position (oracle uses DuckDB's
    lockstep multi-unnest of the list and its 0-based index range)."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@query(
    "map_entries_events",
    oracle="""
SELECT k, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS v_sum
FROM (SELECT unnest(json_keys(props)) AS k,
             CAST(props->>'$.k' AS BIGINT) AS v
      FROM events)
GROUP BY k
ORDER BY k
""",
)
def map_entries_events(spark, sf_dir):
    """Open-keyed JSON object read as MapType (the §1.2 `field.as.map.include`
    decision applied): from_json to map<string,bigint>, explode entries,
    aggregate per key. This is the engine's answer to ES dynamic objects."""
    ev = tbl(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        ev.select(F.explode(m).alias("k", "v"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum"))
        .orderBy("k")
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT ALL
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
)
ORDER BY k
""",
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (multiset semantics — duplicates kept up to the min
    multiplicity on each side), completing the §2.C set-op row alongside
    the existing union/except/distinct query."""
    o = tbl(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    big = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return urgent.intersectAll(big).orderBy("k")


@query(
    "pivot_returnflag",
    oracle="""
SELECT l_linestatus,
       round(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 2) AS qty_A,
       round(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), 2) AS qty_N,
       round(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 2) AS qty_R
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def pivot_returnflag(spark, sf_dir):
    """groupBy().pivot() with an explicit value list (skips the extra
    distinct-scan job Spark otherwise runs to discover pivot values —
    mandatory at 100 TB)."""
    li = tbl(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )
    return piv.select(
        "l_linestatus",
        *[F.round(F.coalesce(F.col(v), F.lit(0.0)), 2).alias(f"qty_{v}") for v in ("A", "N", "R")],
    ).orderBy("l_linestatus")


@query(
    "unpivot_stats",
    oracle="""
SELECT l_returnflag, metric, round(val, 2) AS val
FROM (SELECT l_returnflag,
             sum(l_quantity) AS sum_qty,
             sum(l_extendedprice) AS sum_price
      FROM lineitem GROUP BY l_returnflag)
UNPIVOT (val FOR metric IN (sum_qty, sum_price))
ORDER BY l_returnflag, metric
""",
)
def unpivot_stats(spark, sf_dir):
    """DataFrame.unpivot (melt): wide per-flag aggregates → long
    (flag, metric, val) form."""
    li = tbl(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_price"),
    )
    return (
        wide.unpivot("l_returnflag", ["sum_qty", "sum_price"], "metric", "val")
        .select("l_returnflag", "metric", F.round("val", 2).alias("val"))
        .orderBy("l_returnflag", "metric")
    )
