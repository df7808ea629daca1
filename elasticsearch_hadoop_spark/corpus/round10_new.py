"""Round-10 net-new graded surface: ES SQL columnar response mode
(``POST /_sql {"columnar": true}`` pages over catalog.sql_page, the mode
persisting through the cursor), ES|QL ``INLINESTATS`` (the STATS
joined-back-onto-source command, 8.11+) in its multi-aggregate argmax
shape, ``MV_PSERIES_WEIGHTED_SUM`` + the null-skip ``MV_COUNT``, and
``TOP`` after the bounded-carry rewrite.

Same contract as every corpus module: the Spark query and the DuckDB
oracle sit side by side with identical aliases and rounding, so the
driver's column-sorted value hash compares them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "writepath_es_sql_columnar",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         row_number() OVER (
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       round(l_quantity, 2) AS qty,
       round(l_extendedprice, 2) AS price,
       CAST(ceil(rn / 30.0) AS BIGINT) AS page
FROM ranked
WHERE rn <= 90
ORDER BY rn
""",
)
def writepath_es_sql_columnar(spark, sf_dir):
    """ES SQL COLUMNAR response mode (``POST /_sql {"query", "fetch_size",
    "columnar": true}`` — catalog.sql_page): write lineitem into a managed
    index, page the statement three 30-row pages with each page rendered
    column-major (``values`` = one array per projected column, ES's exact
    response shape), the mode persisting through the opaque cursor, and
    rebuild the row set by transposing every page.  Exercises what the
    row-mode cursor query can't: the per-page transpose must keep columns
    parallel (a values array off by one row, a page that re-orders
    columns, or a cursor that forgets the minted mode flips the hash).
    The PLAN is identical to row mode — keyset filter +
    TakeOrderedAndProject per page, O(page) at any corpus size — because
    columnar is a response-shape concern, not an execution one (the same
    reason ES documents it as a transport option)."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir

    root = _workdir(sf_dir, "es_sql_columnar")
    cat = Catalog(spark, root)
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    cat.write_index(li, "li", mode="overwrite")

    stmt = (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM li "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber"
    )
    pages: list[list[tuple]] = []
    resp = cat.sql_page(stmt, fetch_size=30, columnar=True)
    pages.append(list(zip(*resp["values"])))
    for _ in range(2):
        assert resp["cursor"] is not None
        assert "rows" not in resp  # columnar pages carry values only
        resp = cat.sql_page(cursor=resp["cursor"])  # mode persists
        pages.append(list(zip(*resp["values"])))
    if resp["cursor"]:
        cat.sql_close_cursor(resp["cursor"])
    rows = [
        tuple(r) + (page_no,)
        for page_no, page in enumerate(pages, start=1)
        for r in page
    ]
    out = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, page long",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
        F.round("l_extendedprice", 2).alias("price"),
        "page",
    ).orderBy(F.col("price").desc(), "l_orderkey", "l_linenumber")


@query(
    "esql_inlinestats_argmax",
    oracle="""
WITH w AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS max_price,
         count(*) OVER (PARTITION BY o_orderpriority) AS n_orders
  FROM orders
)
SELECT o_orderpriority, o_orderkey,
       round(max_price, 2) AS top,
       CAST(n_orders AS BIGINT) AS n_orders
FROM w
WHERE o_totalprice = max_price
ORDER BY o_orderpriority, o_orderkey
""",
)
def esql_inlinestats_argmax(spark, sf_dir):
    """ES|QL ``INLINESTATS`` (8.11+, esql's joined-back STATS): attach
    each priority group's MAX(o_totalprice) and COUNT(*) to every order
    row, then keep the rows that ARE their group's maximum — the argmax
    idiom INLINESTATS exists for (a plain STATS loses the matching row).
    The filter compares o_totalprice == max_price — an exact selection
    of an existing value, never arithmetic, so the float equality is
    deterministic on both engines.  Scale shape: ONE hash aggregation
    over the 5 priority keys, then the 5-row aggregate joins back
    broadcast (AQE sees the tiny build side); the source never shuffles.
    The oracle replays the join-back as analytic window functions — the
    same semantics by construction."""
    from elasticsearch_hadoop_spark.esql import esql

    return esql(
        "FROM orders"
        " | INLINESTATS max_price = MAX(o_totalprice),"
        " n_orders = COUNT(*) BY o_orderpriority"
        " | WHERE o_totalprice == max_price"
        " | EVAL top = ROUND(max_price, 2)"
        " | KEEP o_orderpriority, o_orderkey, top, n_orders"
        " | SORT o_orderpriority, o_orderkey",
        tables={"orders": tbl(spark, sf_dir, "orders")},
    )


@query(
    "esql_mv_pseries",
    oracle="""
WITH s AS (
  SELECT vec_id,
         list_sort(embedding, 'DESC') AS xs,
         len(embedding) AS n,
         CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
  FROM embeddings
)
SELECT vec_id, CAST(n AS INT) AS n, round(mx, 6) AS hi,
       round(list_reduce(
               list_transform(xs, (v, i) ->
                 CAST(v AS DOUBLE) / power(CAST(i AS DOUBLE), 2.0)),
               (a, b) -> a + b), 6) AS ps
FROM s
ORDER BY vec_id
""",
)
def esql_mv_pseries(spark, sf_dir):
    """ES|QL ``MV_PSERIES_WEIGHTED_SUM`` (esql._rewrite_mv_funcs, new
    round 10) + ``MV_COUNT`` (null-skip form) + ``MV_SORT``/``MV_MAX``
    over the 64-d embeddings: each vector's descending-order p-series
    score sum(v_i / i^2) — the relevance-weighted rollup ES built the
    function for.  Pure array codegen (one sort + one zip_with + one
    sequential fold per row), no explode, no shuffle before the final
    sort.  The oracle replays the exact fold: list_transform with
    DuckDB's 1-based lambda index mirrors the 1-based position sequence,
    and list_reduce's left fold mirrors Spark's aggregate (0 + t1 = t1
    exactly, so the partial-sum rounding sequence is identical); the max
    is double-cast BEFORE rounding on both sides so the float32 element
    never rounds in two different precisions."""
    from elasticsearch_hadoop_spark.esql import esql

    return esql(
        "FROM embeddings"
        ' | EVAL s = MV_SORT(embedding, "desc"),'
        " n = MV_COUNT(embedding),"
        " hi = ROUND(TO_DOUBLE(MV_MAX(embedding)), 6),"
        " ps = ROUND(MV_PSERIES_WEIGHTED_SUM(s, 2.0), 6)"
        " | KEEP vec_id, n, hi, ps"
        " | SORT vec_id",
        tables={"embeddings": tbl(spark, sf_dir, "embeddings")},
    )


@query(
    "esql_stats_top",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       array_to_string(list(o_orderkey ORDER BY o_orderkey DESC)[1:3], '|') AS hi,
       array_to_string(list(o_orderkey ORDER BY o_orderkey ASC)[1:3], '|') AS lo
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def esql_stats_top(spark, sf_dir):
    """ES|QL ``TOP(field, limit, order)`` after the round-10 bounded-carry
    rewrite: each priority group's 3 highest and 3 lowest order keys next
    to a COUNT(*) — the mixed-aggregate shape that exercises the full
    split (bounded TOP aggregation joined back onto the unfiltered
    COUNT).  The plan shows WindowGroupLimit Partial+Final per TOP: a hot
    group's past-limit rows drop map-side and never reach an aggregation
    buffer (ES's TopList agg holds a bounded heap; collect-then-slice
    would buffer every group value).  Arrays join to '|' strings on both
    sides (integer rendering is engine-identical; the driver's hash needs
    scalar columns)."""
    from elasticsearch_hadoop_spark.esql import esql

    out = esql(
        "FROM orders"
        ' | STATS n = COUNT(*), hi = TOP(o_orderkey, 3, "desc"),'
        ' lo = TOP(o_orderkey, 3, "asc") BY o_orderpriority'
        " | SORT o_orderpriority",
        tables={"orders": tbl(spark, sf_dir, "orders")},
    )
    def joined(c):
        return F.array_join(F.transform(F.col(c), lambda x: x.cast("string")), "|")
    return out.select(
        "o_orderpriority", "n", joined("hi").alias("hi"), joined("lo").alias("lo")
    )
