"""Aggregation corpus: hash aggregate, distinct, rollup/cube/grouping sets,
percentiles, statistical aggs, top-k (SURVEY.md §2.C "Aggregations",
"Sort/limit/top-k", "Set ops").

The reference delegates ALL of these to Spark (SURVEY.md §2.9 — ES aggs are
unused by the connector; its itests run plain Spark aggregations over
scanned rows, AbstractScalaEsSparkSQL.scala†).  Here each shape is declared
once with a DuckDB oracle.

Scale notes: groupBy on low-cardinality keys -> partial (map-side) + final
hash agg, no skew concern; top-k global is TakeOrderedAndProject (no full
sort); count-distinct on high-cardinality keys shuffles by (group, value) —
at 100 TB prefer approx_count_distinct (HLL++, the analogue of the ES
``cardinality`` agg) — declared separately without an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import TS_FMT_SPARK, tbl


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan -> pushed filter -> partial+final hash agg -> sort.

    Flagship: exercises A1 (partitioned scan), A2 (column pruning: 7 of 11
    lineitem columns read), A3 (l_shipdate range pushed to parquet row-group
    stats) with zero custom code — the whole point of the Spark-first design.
    """
    li = tbl(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct_counts",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
       CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS distinct_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_distinct_counts(spark, sf_dir):
    """Exact distinct aggregation (ES `cardinality` agg analogue, exact form).

    Spark plans multi-distinct via Expand; at 100 TB swap to
    approx_count_distinct (see agg_approx_distinct, rows-only check).
    """
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.countDistinct("l_orderkey", "l_linenumber").alias("distinct_lines"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_rsd
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct = HLL++ — the scale path for ES `cardinality`.

    The raw estimate differs per engine, so it cannot be value-hashed.
    Instead the query emits a BOUNDS ASSERTION the oracle can check: the
    exact distinct count (hashable, engine-independent) plus a boolean
    `within_rsd` that is true iff the HLL estimate lands inside ±5×rsd of
    exact (rsd=0.02; HLL++ guarantees ~rsd standard error, so 5σ is a
    deterministic-in-practice margin).  The DuckDB twin asserts TRUE
    literally — a drifting sketch flips the boolean and fails the hash."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 5 * 0.02 * F.col("exact_parts")
            ).alias("within_rsd"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals; NULL grouping cells coalesced to a sentinel
    so Spark-vs-DuckDB null-ordering differences cannot bite."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "agg_cube",
    oracle="""
SELECT coalesce(o_orderstatus, '(all)')   AS orderstatus,
       coalesce(o_orderpriority, '(all)') AS orderpriority,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
""",
)
def agg_cube(spark, sf_dir):
    """CUBE over two dims."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("orderpriority"),
            "sum_price",
            "n",
        )
        .orderBy("orderstatus", "orderpriority")
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY returnflag, linestatus
""",
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via spark.sql (same SQL dialect both sides)."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '(all)') AS returnflag,
               coalesce(l_linestatus, '(all)') AS linestatus,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
       round(quantile_cont(l_quantity, 0.50), 6) AS qty_p50,
       round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
       round(quantile_cont(l_extendedprice, 0.90), 6) AS price_p90
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (ES `percentiles` agg analogue).

    Spark `percentile` == DuckDB `quantile_cont` (linear interpolation).
    The three quantity percentiles go through ONE array-argument
    percentile agg (one sort of the group's values instead of three —
    the per-group buffers are the cost driver at scale). At 100 TB use
    percentile_approx (t-digest-style sketch) — declared separately
    rows-only.
    """
    li = tbl(spark, sf_dir, "lineitem")
    qty_ps = F.percentile(
        "l_quantity", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            qty_ps.alias("qty_ps"),
            F.round(F.percentile("l_extendedprice", F.lit(0.90)), 6).alias("price_p90"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("qty_ps")[0], 6).alias("qty_p25"),
            F.round(F.col("qty_ps")[1], 6).alias("qty_p50"),
            F.round(F.col("qty_ps")[2], 6).alias("qty_p75"),
            "price_p90",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentile_approx",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
       TRUE AS within_rank_err
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_percentile_approx(spark, sf_dir):
    """Sketch percentiles for the 100 TB path.  Like agg_approx_distinct,
    the estimate itself is engine-specific, so the hashed output is the
    exact p50 plus a bounds assertion: percentile_approx(accuracy=10000)
    guarantees rank error <= 1/accuracy, so the estimate must lie within
    the exact [p45, p55] value envelope (a 500× margin).  DuckDB asserts
    the boolean literally."""
    li = tbl(spark, sf_dir, "lineitem")
    ps = F.percentile(
        "l_quantity", F.array(F.lit(0.45), F.lit(0.50), F.lit(0.55))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            ps.alias("__ps"),
            F.percentile_approx("l_quantity", 0.5, 10000).alias("__approx"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("__ps")[1], 6).alias("exact_p50"),
            (
                (F.col("__approx") >= F.col("__ps")[0])
                & (F.col("__approx") <= F.col("__ps")[2])
            ).alias("within_rank_err"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats",
    oracle="""
SELECT c_mktsegment,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 6) AS avg_bal,
       round(stddev_samp(c_acctbal), 6) AS std_bal,
       round(var_samp(c_acctbal), 4) AS var_bal,
       count(*) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates (ES extended_stats analogue)."""
    c = tbl(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 6).alias("std_bal"),
            F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_filtered_case",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS sum_f
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def agg_filtered_case(spark, sf_dir):
    """Conditional aggregation (filtered counts — ES filters-agg analogue)."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_big"),
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)),
                2,
            ).alias("sum_f"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_collect_set",
    oracle="""
SELECT n_regionkey AS regionkey,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
FROM nation
GROUP BY n_regionkey
ORDER BY regionkey
""",
)
def agg_collect_set(spark, sf_dir):
    """collect_set with canonical (sorted) ordering, serialized to a CSV
    string: the driver's pandas canonicalizer cannot hash raw array<T>
    columns (unhashable list), so both sides emit array_to_string/array_join
    of the same sorted set — semantics unchanged, hash computable."""
    n = tbl(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
        .orderBy("regionkey")
    )


@query(
    "topk_global",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk_global(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge — no full sort; the 100 TB-safe top-k)."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "set_ops",
    oracle="""
WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000),
     urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
UNION ALL
SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
UNION ALL
SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM big UNION SELECT * FROM urgent)
ORDER BY op
""",
)
def set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION-distinct over derived key sets."""
    o = tbl(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 150000).select("o_custkey").distinct()
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    rows = [
        ("intersect", big.intersect(urgent)),
        ("except", big.exceptAll(urgent).distinct()),
        ("union", big.union(urgent).distinct()),
    ]
    out = None
    for op, df in rows:
        piece = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = piece if out is None else out.unionByName(piece)
    return out.orderBy("op")


@query(
    "order_by_date_buckets",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 month', o_orderdate), '%Y-%m-%d') AS order_month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def order_by_date_buckets(spark, sf_dir):
    """Date-histogram aggregation (ES `date_histogram` analogue):
    date_trunc month buckets."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("order_month")
    )


# referenced by docstring only; keeps import of TS_FMT_SPARK honest
_ = TS_FMT_SPARK


@query(
    "sketch_hll_rollup_merge",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
GROUP BY 1
ORDER BY day
""",
)
def sketch_hll_rollup_merge(spark, sf_dir):
    """Mergeable-sketch pre-aggregation (operators/sketches.py): per-HOUR
    HLL sketches of distinct users, merged up to per-day estimates WITHOUT
    rescanning the raw rows — the 100 TB pattern for "distinct over any
    time grain".  lgK=14 keeps the DataSketches HLL in its sparse (exact)
    regime through sf0.1's per-day cardinalities (verified: exact at ~1.4k
    distinct/day), so the estimates hash-match the oracle's exact
    COUNT(DISTINCT) at every driver sf; past the sparse regime the
    statistical-error gates in tests/test_sketches.py take over."""
    from elasticsearch_hadoop_spark.operators.sketches import hll_merge, hll_rollup

    ev = tbl(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    ).withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
    per_hour = hll_rollup(ev, ["day", "hour"], "user_id", lgk=14)
    return (
        hll_merge(per_hour, ["day"], out_col="est")
        .select("day", F.round("est").cast("bigint").alias("distinct_users"))
        .orderBy("day")
    )
