"""Round-9 net-new graded surface: ES SQL cursor paging (`POST /_sql`
fetch_size/cursor continuations over catalog.sql_page) and the two `_mvt`
endpoint options the round-8 tile layers documented as open —
``with_labels`` (cell label positions) and sort-by-sub-agg cell ordering.

Same contract as every corpus module: the Spark query and the DuckDB
oracle sit side by side with identical aliases and rounding, so the
driver's column-sorted value hash compares them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.corpus.round8_new import _MERC, _PTS_SQL


@query(
    "writepath_es_sql_cursor",
    oracle="""
WITH ranked AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total,
       CAST(ceil(rn / 40.0) AS BIGINT) AS page
FROM ranked
WHERE rn <= 120
ORDER BY rn
""",
)
def writepath_es_sql_cursor(spark, sf_dir):
    """ES SQL cursor paging (``POST /_sql {"query", "fetch_size"}`` then
    ``{"cursor"}`` continuations — catalog.sql_page): write orders into a
    managed index, page the statement three 40-row pages through opaque
    cursors, and rebuild the union.  The cursor is stateless — statement
    + ORDER BY keyset + last key values — so each page plans as keyset
    filter + TakeOrderedAndProject (O(page) at any corpus size, where
    OFFSET paging re-sorts the prefix); a broken lexicographic-after
    predicate, a dropped boundary row, or an order-unstable page flips
    the hash.  Pages are the bounded driver fetch (40 rows each), like
    every paging query in the corpus."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir

    root = _workdir(sf_dir, "es_sql_cursor")
    cat = Catalog(spark, root)
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat.write_index(orders, "ord", mode="overwrite")

    stmt = (
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM ord "
        "ORDER BY o_totalprice DESC, o_orderkey"
    )
    pages: list[list] = []
    resp = cat.sql_page(stmt, fetch_size=40)
    pages.append(resp["rows"])
    for _ in range(2):
        assert resp["cursor"] is not None
        resp = cat.sql_page(cursor=resp["cursor"])
        pages.append(resp["rows"])
    cat.sql_close_cursor(resp["cursor"]) if resp["cursor"] else None
    rows = [
        tuple(r) + (page_no,)
        for page_no, page in enumerate(pages, start=1)
        for r in page
    ]
    out = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double, page long",
    )
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
        "page",
    ).orderBy(F.col("total").desc(), "o_orderkey")


# Web-Mercator label projection for tile z=1,x=1,y=0 over the per-cell
# centroid (clat/clon) — the same fraction/floor text as the hits layer,
# applied to the aggregated centroid.  The centroid itself is EXACT:
# glat/glon are halves (binary-exact), so their sums are order-independent
# and avg is one deterministic division.
_CMERC = _MERC.replace("glat", "clat")
_LBL_FX = "((clon + 180.0) / 360.0 * 2 - 1)"
_LBL_FY = f"((1.0 - {_CMERC} / pi()) / 2.0 * 2 - 0)"
_GTX1 = "CAST(least(floor((glon + 180.0) / 360.0 * 2), 1) AS BIGINT)"
_GTY1 = f"CAST(greatest(least(floor((1.0 - {_MERC} / pi()) / 2.0 * 2), 1), 0) AS BIGINT)"
_GTX4 = "CAST(least(floor((glon + 180.0) / 360.0 * 16), 15) AS BIGINT)"
_GTY4 = f"CAST(greatest(least(floor((1.0 - {_MERC} / pi()) / 2.0 * 16), 15), 0) AS BIGINT)"


@query(
    "search_mvt_labels",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), f AS (
  SELECT c_custkey, glat, glon,
         {_GTX1} AS gx, {_GTY1} AS gy, {_GTX4} AS gx4, {_GTY4} AS gy4
  FROM pts
), cells AS (
  SELECT '4/' || CAST(gx4 AS VARCHAR) || '/' || CAST(gy4 AS VARCHAR) AS cell,
         glat, glon
  FROM f
  WHERE gx = 1 AND gy = 0
), c AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS doc_count,
         avg(glat) AS clat, avg(glon) AS clon
  FROM cells GROUP BY cell
)
SELECT cell, doc_count,
       CAST(greatest(least(floor({_LBL_FX} * 4096), 4095), 0) AS BIGINT) AS label_x,
       CAST(greatest(least(floor({_LBL_FY} * 4096), 4095), 0) AS BIGINT) AS label_y
FROM c
ORDER BY cell
""",
)
def search_mvt_labels(spark, sf_dir):
    """ES ``_mvt`` ``with_labels`` (8.15+, mvt.mvt_grid): each grid cell
    of tile 1/1/0 carries its label POSITION — the cell centroid
    projected to tile-local integer pixels with the hits layer's exact
    clamp/floor math — so a map client places cell labels without
    re-projecting.  The label projection is a codegen post-projection
    over the aggregated centroid: no second pass, no extra shuffle.  The
    oracle replays centroid -> Mercator -> pixel with the same IEEE
    expression text (the centroid is exact — see the _CMERC note)."""
    from elasticsearch_hadoop_spark.corpus.round8_new import _cust_points
    from elasticsearch_hadoop_spark.mvt import mvt_grid

    c = _cust_points(spark, sf_dir)
    out = mvt_grid(c, "location", 1, 1, 0, grid_precision=3, with_labels=True)
    return out.select("cell", "doc_count", "label_x", "label_y").orderBy("cell")


@query(
    "esql_stats_categorize",
    oracle="""
WITH k AS (
    SELECT CASE WHEN text IS NULL THEN NULL ELSE array_to_string(
               list_filter(
                   string_split_regex(
                       lower(text || ' req-' || doc_id || ' shard' ||
                             (doc_id % 5)),
                       '[^a-z0-9_.\\-]+'),
                   x -> x <> '' AND NOT regexp_matches(x, '\\d')),
               ' ') END AS cat,
           n_chars
    FROM documents
)
SELECT cat, CAST(count(*) AS BIGINT) AS n,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM k
GROUP BY cat
ORDER BY n DESC, cat NULLS FIRST
LIMIT 12
""",
)
def esql_stats_categorize(spark, sf_dir):
    """ES|QL ``STATS .. BY CATEGORIZE(msg)`` (8.16+, esql._stats): group
    log-like messages by their ml category key — the deterministic
    variable-free token sequence shared with the categorize_text agg
    (aggs_dsl.categorize_key; digit-bearing tokens appended per doc must
    drop whole, so categories collapse to the stable sequence).  One
    codegen key projection + one hash aggregation + TakeOrderedAndProject
    for the SORT/LIMIT — the same plan shape as any STATS BY."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents").withColumn(
        "msg",
        F.concat(F.col("text"), F.lit(" req-"), F.col("doc_id"),
                 F.lit(" shard"), (F.col("doc_id") % 5)),
    )
    return esql(
        "FROM docs"
        " | STATS n = COUNT(*), max_chars = MAX(n_chars) BY cat = CATEGORIZE(msg)"
        " | SORT n DESC, cat NULLS FIRST"
        " | LIMIT 12",
        tables={"docs": docs},
    )


@query(
    "esql_bucket_auto",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS m,
       floor(o_totalprice / 50000.0) * 50000.0 AS pb,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS rev
FROM orders
GROUP BY 1, 2
ORDER BY m, pb
""",
)
def esql_bucket_auto(spark, sf_dir):
    """ES|QL ``BUCKET`` target-bucket-count overload (esql._rewrite_bucket
    4-arg path): date bounds spanning 1995-2002 at 100 buckets resolve to
    the calendar-month rung (85 months fit, weeks don't), and numeric
    bounds 1000..500000 at 20 buckets resolve to span 50000 (upstream
    Bucket.pickRounding: precise 24950 -> nextPowerOfTen 100000,
    halfPower 50000 — only {5,10}x10^k spans, the ES docs' salary
    example arithmetic).
    Span resolution happens at COMPILE time from the literal bounds, so
    the runtime plan is the same floor/date_trunc codegen as the explicit
    -span form; the oracle restates the resolved spans directly."""
    from elasticsearch_hadoop_spark.esql import esql

    return esql(
        "FROM orders"
        ' | STATS n = COUNT(*), rev = SUM(o_totalprice)'
        ' BY mb = BUCKET(o_orderdate, 100, "1995-01-01T00:00:00", "2002-01-01T00:00:00"),'
        " pb = BUCKET(o_totalprice, 20, 1000, 500000)"
        ' | EVAL m = DATE_FORMAT("yyyy-MM-dd", mb), rev = ROUND(rev, 2)'
        " | KEEP m, pb, n, rev"
        " | SORT m, pb",
        tables={"orders": tbl(spark, sf_dir, "orders")},
    )


@query(
    "aggs_composite_geotile_page",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), f AS (
  SELECT {_GTX4} AS gx, {_GTY4} AS gy FROM pts
), g AS (
  SELECT '4/' || CAST(gx AS VARCHAR) || '/' || CAST(gy AS VARCHAR) AS cell,
         gx * 536870912 + gy AS ord,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM f GROUP BY gx, gy
), r AS (
  SELECT cell, doc_count, row_number() OVER (ORDER BY ord) AS rn FROM g
)
SELECT CAST(CASE WHEN rn <= 5 THEN 1 ELSE 2 END AS BIGINT) AS page,
       cell, doc_count
FROM r
WHERE rn <= 10
ORDER BY rn
""",
)
def aggs_composite_geotile_page(spark, sf_dir):
    """ES composite agg with a ``geotile_grid`` source, paged two pages
    through the after-cursor in ES's PACKED-NUMERIC tile order
    ((z<<58)|(x<<29)|y — "4/2/y" before "4/10/y"; r8 verdict item 8
    closed the former lexicographic divergence, aggs_dsl composite
    branch).  The cursor resumes on the packed value of the rendered
    "z/x/y" key, so an ES cluster's cursor replays bucket-for-bucket;
    the oracle re-derives the packing as gx*2^29+gy (z constant within a
    page).  Each page stays a TakeOrderedAndProject over the aggregated
    cells."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs
    from elasticsearch_hadoop_spark.corpus.round8_new import _cust_points

    c = _cust_points(spark, sf_dir)

    def body(after=None):
        comp = {
            "size": 5,
            "sources": [
                {"cell": {"geotile_grid": {"field": "location", "precision": 4}}}
            ],
        }
        if after is not None:
            comp["after"] = {"cell": after}
        return {"aggs": {"page": {"composite": comp}}}

    p1 = compile_aggs(c, body())
    last = p1.collect()[-1]["cell"]  # 5-row page: the bounded driver fetch
    p2 = compile_aggs(c, body(after=last))
    out = p1.withColumn("page", F.lit(1).cast("long")).unionByName(
        p2.withColumn("page", F.lit(2).cast("long"))
    )
    return out.select("page", "cell", "doc_count")


@query(
    "search_mvt_sorted",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), f AS (
  SELECT p.c_custkey, c.c_acctbal, glat, glon,
         {_GTX1} AS gx, {_GTY1} AS gy, {_GTX4} AS gx4, {_GTY4} AS gy4
  FROM pts p JOIN customer c USING (c_custkey)
), cells AS (
  SELECT '4/' || CAST(gx4 AS VARCHAR) || '/' || CAST(gy4 AS VARCHAR) AS cell,
         c_acctbal
  FROM f
  WHERE gx = 1 AND gy = 0
), agg AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS doc_count,
         sum(c_acctbal) AS bal_raw
  FROM cells GROUP BY cell
)
SELECT cell, doc_count, round(bal_raw, 2) AS bal_sum
FROM agg
ORDER BY bal_raw DESC, cell
LIMIT 5
""",
)
def search_mvt_sorted(spark, sf_dir):
    """ES ``_mvt`` sub-aggs + cell ordering (mvt.mvt_grid aggs/sort_by/
    size): the 5 heaviest cells of tile 1/1/0 by a per-cell metric
    sub-agg (sum of account balance), compiled through the SAME aggs_dsl
    metric compiler as the standalone geotile_grid agg.  The cut is a
    TakeOrderedAndProject over the aggregated cells — never a global
    sort — and the sub-agg adds no extra pass over the rows.  Cell-key
    tie-break keeps the cut deterministic."""
    from elasticsearch_hadoop_spark.corpus.round8_new import _cust_points
    from elasticsearch_hadoop_spark.mvt import mvt_grid

    c = _cust_points(spark, sf_dir).join(
        tbl(spark, sf_dir, "customer").select("c_custkey", "c_acctbal"),
        "c_custkey",
    )
    out = mvt_grid(
        c, "location", 1, 1, 0, grid_precision=3,
        aggs={"bal_sum": {"sum": {"field": "c_acctbal"}}},
        sort_by="bal_sum", size=5,
    )
    return out.select(
        "cell", "doc_count", F.round("bal_sum", 2).alias("bal_sum")
    )


@query(
    "eql_sample_join",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
)
SELECT v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS step1_ts,
       v.event_id AS step1_event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS step2_ts,
       c.event_id AS step2_event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS step3_ts,
       p.event_id AS step3_event_id
FROM ranked v
JOIN ranked c USING (user_id)
JOIN ranked p USING (user_id)
WHERE v.event_type = 'view' AND v.rn = 1
  AND c.event_type = 'click' AND c.rn = 1
  AND p.event_type = 'purchase' AND p.rn = 1
ORDER BY v.user_id
""",
)
def eql_sample_join(spark, sf_dir):
    """EQL ``sample by user_id`` (8.6+, eql.eql_sample): users with at
    least one view AND click AND purchase, one sample event per slot —
    UNORDERED co-occurrence, unlike a sequence (no chronology, no
    maxspan).  Deterministic slot pick = minimum (ts, event_id) tuple
    per slot (documented deviation from ES's shard-order picks; the
    unique event_id makes the order total).  ONE hash aggregation over
    the join key — conditional struct-mins combine map-side, the single
    shuffle carries a row per key, never the events.  The oracle replays
    each slot as row_number()=1 over (ts, event_id)."""
    from elasticsearch_hadoop_spark.corpus._util import TS_FMT_SPARK
    from elasticsearch_hadoop_spark.eql import eql_sample

    ev = tbl(spark, sf_dir, "events")
    out = eql_sample(
        ev, by="user_id", ts="ts",
        filters=[
            {"term": {"event_type": "view"}},
            {"term": {"event_type": "click"}},
            {"term": {"event_type": "purchase"}},
        ],
        payload=["event_id"],
    )
    cols = [F.col("user_id")]
    for i in (1, 2, 3):
        cols.append(
            F.date_format(F.col(f"step{i}_ts"), TS_FMT_SPARK).alias(f"step{i}_ts")
        )
        cols.append(F.col(f"step{i}_event_id"))
    return out.select(*cols).orderBy("user_id")


@query(
    "search_analyze_edge_ngram",
    oracle="""
WITH s AS (
  SELECT substr(lower(text), 1, 12) AS s FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT substr(s, 1, 2) AS token FROM s WHERE length(s) >= 2
  UNION ALL SELECT substr(s, 1, 3) FROM s WHERE length(s) >= 3
  UNION ALL SELECT substr(s, 1, 4) FROM s WHERE length(s) >= 4
)
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM grams
GROUP BY token
ORDER BY n DESC, token
LIMIT 30
""",
)
def search_analyze_edge_ngram(spark, sf_dir):
    """ES ``_analyze`` with the ``edge_ngram`` tokenizer (default
    no-token_chars form, functions/text.analyze_api): 2..4-char edge
    grams of each document's lowered 12-char prefix, aggregated to the
    30 most frequent — the search-as-you-type index-building primitive.
    The gram emission is one codegen array expression + posexplode; the
    oracle replays each gram length as a substr arm."""
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.substring(F.lower(F.col("text")), 1, 12).alias("s"))
    )
    toks = analyze_api(docs, "s", "edge_ngram", min_gram=2, max_gram=4)
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(30)
    )


@query(
    "writepath_slm_cycle",
    oracle="""
SELECT 'nightly-2024.01.02-1704153600' AS snapshot,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
FROM events WHERE event_id % 3 IN (0, 1)
UNION ALL
SELECT 'nightly-2024.01.03-1704240000',
       CAST(count(*) AS BIGINT), round(sum(value), 4)
FROM events
ORDER BY snapshot
""",
)
def writepath_slm_cycle(spark, sf_dir):
    """SLM policy lifecycle (slm.py): three nightly executions snapshot a
    growing index (1/3 -> 2/3 -> all of events), then the retention tick
    with max_count=2 deletes the oldest snapshot — the surviving two
    read back with exactly the row sets frozen at their execution times
    (a snapshot that leaked later appends, a retention pass that dropped
    the wrong generation, or a broken date-math name all flip the hash).
    Explicit `now` stamps make every snapshot name and retention
    decision deterministic.  Each execution copies only the committed
    row set; retention deletes directories without reading a row."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir
    from elasticsearch_hadoop_spark.slm import (
        execute_slm_policy,
        put_slm_policy,
        slm_retention_tick,
    )

    T0, DAY = 1704067200.0, 86400.0  # 2024-01-01 00:00:00 UTC
    root = _workdir(sf_dir, "slm_cycle")
    repo = f"{root}/repo"
    cat = Catalog(spark, f"{root}/idx")
    ev = tbl(spark, sf_dir, "events").select("event_id", "value")
    put_slm_policy(cat, "nightly", {
        "schedule": "0 30 1 * * ?",
        "name": "<nightly-{now/d}>",
        "repository": repo,
        "config": {"indices": "ev"},
        "retention": {"max_count": 2},
    })
    cat.write_index(ev.filter(F.col("event_id") % 3 == 0), "ev", mode="overwrite")
    execute_slm_policy(cat, "nightly", now=T0)
    cat.write_index(ev.filter(F.col("event_id") % 3 == 1), "ev")
    s2 = execute_slm_policy(cat, "nightly", now=T0 + DAY)["snapshot_name"]
    cat.write_index(ev.filter(F.col("event_id") % 3 == 2), "ev")
    s3 = execute_slm_policy(cat, "nightly", now=T0 + 2 * DAY)["snapshot_name"]
    dropped = slm_retention_tick(cat, "nightly", now=T0 + 3 * DAY)
    assert len(dropped) == 1, dropped

    parts = []
    for snap in (s2, s3):
        df = spark.read.parquet(f"{repo}/{snap}/ev/data")
        parts.append(
            df.agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            ).withColumn("snapshot", F.lit(snap))
        )
    out = parts[0].unionByName(parts[1])
    return out.select("snapshot", "n", "sum_value").orderBy("snapshot")


@query(
    "esql_mv_percentile",
    oracle="""
WITH s AS (
  SELECT vec_id, list_sort(embedding) AS xs, len(embedding) AS n
  FROM embeddings
), m AS (
  SELECT vec_id, xs, n,
         (CAST(xs[CAST(n/2 AS INT)] AS DOUBLE)
          + CAST(xs[CAST(n/2 AS INT) + 1] AS DOUBLE)) / 2.0 AS med,
         (n - 1) * 90.0 / 100.0 AS idx
  FROM s
), p AS (
  SELECT vec_id, med,
         CAST(xs[CAST(floor(idx) AS INT) + 1] AS DOUBLE)
           + (coalesce(CAST(xs[CAST(floor(idx) AS INT) + 2] AS DOUBLE),
                       CAST(xs[CAST(floor(idx) AS INT) + 1] AS DOUBLE))
              - CAST(xs[CAST(floor(idx) AS INT) + 1] AS DOUBLE))
             * (idx - floor(idx)) AS p90,
         (SELECT (d[CAST(m.n/2 AS INT)] + d[CAST(m.n/2 AS INT) + 1]) / 2.0
          FROM (SELECT list_sort(list_transform(m.xs,
                        v -> abs(CAST(v AS DOUBLE) - m.med))) AS d)) AS mad
  FROM m
)
SELECT vec_id, round(med, 6) AS med, round(p90, 6) AS p90,
       round(mad, 6) AS mad
FROM p
ORDER BY vec_id
""",
)
def esql_mv_percentile(spark, sf_dir):
    """ES|QL ``MV_PERCENTILE`` / ``MV_MEDIAN`` / ``MV_MEDIAN_ABSOLUTE_
    DEVIATION`` over the 64-d embedding arrays (esql._rewrite_mv_funcs):
    per-row R-7 interpolation at rank (n-1)*90/100, the even-count
    two-middle median, and the median of absolute deviations — all pure
    array codegen (sort + element arithmetic), no explode, no shuffle.
    The oracle replays the exact formula text per statistic (same
    element casts, same interpolation arithmetic), so a drifting rank
    rule or NULL-handling change flips the hash."""
    from elasticsearch_hadoop_spark.esql import esql

    return esql(
        "FROM embeddings"
        " | EVAL med = MV_MEDIAN(embedding),"
        " p90 = MV_PERCENTILE(embedding, 90),"
        " mad = MV_MEDIAN_ABSOLUTE_DEVIATION(embedding)"
        " | EVAL med = ROUND(med, 6), p90 = ROUND(p90, 6), mad = ROUND(mad, 6)"
        " | KEEP vec_id, med, p90, mad"
        " | SORT vec_id",
        tables={"embeddings": tbl(spark, sf_dir, "embeddings")},
    )


@query(
    "eql_sample_multi",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn
  FROM events
  WHERE event_type IN ('view', 'click')
)
SELECT v.user_id, CAST(v.rn AS INT) AS sample_seq,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS step1_ts,
       v.event_id AS step1_event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS step2_ts,
       c.event_id AS step2_event_id
FROM ranked v
JOIN ranked c ON v.user_id = c.user_id AND v.rn = c.rn
WHERE v.event_type = 'view' AND c.event_type = 'click' AND v.rn <= 2
ORDER BY v.user_id, sample_seq
""",
)
def eql_sample_multi(spark, sf_dir):
    """EQL ``sample`` with ``size=2`` (eql.eql_sample size>1 path):
    sample j pairs each slot's j-th smallest (ts, event_id) tuple, so a
    user yields min(2, fewest slot matches) samples tagged
    ``sample_seq``.  The carry is pre-bounded BEFORE the groupBy with
    ``row_number() OVER (PARTITION BY user_id, slot ORDER BY ts,
    event_id) <= size`` (r9 verdict item 1 — no aggregation buffer ever
    holds more than size structs per key x slot; a hot key spills a
    sort instead of OOMing an executor); the oracle replays sample j as
    the rn=j row of each slot's (ts, event_id) ranking — the very same
    window."""
    from elasticsearch_hadoop_spark.corpus._util import TS_FMT_SPARK
    from elasticsearch_hadoop_spark.eql import eql_sample

    ev = tbl(spark, sf_dir, "events")
    out = eql_sample(
        ev, by="user_id", ts="ts",
        filters=[
            {"term": {"event_type": "view"}},
            {"term": {"event_type": "click"}},
        ],
        payload=["event_id"], size=2,
    )
    cols = [F.col("user_id"), F.col("sample_seq")]
    for i in (1, 2):
        cols.append(
            F.date_format(F.col(f"step{i}_ts"), TS_FMT_SPARK).alias(f"step{i}_ts")
        )
        cols.append(F.col(f"step{i}_event_id"))
    return out.select(*cols).orderBy("user_id", "sample_seq")
