"""Aggs-DSL corpus: ES aggregation-request JSON driving Catalyst
aggregations (aggs_dsl.compile_aggs), hash-gated like every other query.
The oracle states the equivalent flat SQL the compiler must produce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs
from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import TS_FMT_SPARK, tbl


@query(
    "aggs_terms_metrics",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(value), 6) AS avg_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM events
GROUP BY event_type
ORDER BY doc_count DESC, event_type
LIMIT 3
""",
)
def aggs_terms_metrics(spark, sf_dir):
    """terms bucket (size=3, ES default count-desc order) + avg +
    cardinality metrics, from aggs-DSL JSON."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "event_type": {
                    "terms": {"field": "event_type", "size": 3},
                    "aggs": {
                        "avg_value": {"avg": {"field": "value"}},
                        "users": {"cardinality": {"field": "user_id"}},
                    },
                }
            }
        },
    )
    return out.select(
        "event_type", "doc_count", F.round("avg_value", 6).alias("avg_value"), "users"
    )


@query(
    "aggs_date_histogram_nested",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS total
FROM events
WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def aggs_date_histogram_nested(spark, sf_dir):
    """date_histogram(day) > terms(event_type) > sum — a two-level bucket
    chain compiling to ONE hash aggregation on (day, event_type)."""
    ev = tbl(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "day": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {
                        "event_type": {
                            "terms": {"field": "event_type"},
                            "aggs": {"total": {"sum": {"field": "value"}}},
                        }
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
        "event_type",
        "doc_count",
        F.round("total", 6).alias("total"),
    ).orderBy("day", "event_type")


@query(
    "aggs_range_stats",
    oracle="""
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice >= 100000 AND o_totalprice < 300000 THEN 'mid'
            ELSE 'large' END AS price_band,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(min(o_totalprice), 2) AS price_min,
       round(max(o_totalprice), 2) AS price_max,
       round(avg(o_totalprice), 6) AS price_avg
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def aggs_range_stats(spark, sf_dir):
    """range buckets (ES from-inclusive / to-exclusive) + stats metric."""
    o = tbl(spark, sf_dir, "orders")
    out = compile_aggs(
        o,
        {
            "aggs": {
                "price_band": {
                    "range": {
                        "field": "o_totalprice",
                        "ranges": [
                            {"to": 100000, "key": "small"},
                            {"from": 100000, "to": 300000, "key": "mid"},
                            {"from": 300000, "key": "large"},
                        ],
                    },
                    "aggs": {"price": {"stats": {"field": "o_totalprice"}}},
                }
            }
        },
    )
    return out.select(
        "price_band",
        "doc_count",
        F.round("price_min", 2).alias("price_min"),
        F.round("price_max", 2).alias("price_max"),
        F.round("price_avg", 6).alias("price_avg"),
    ).orderBy("price_band")


@query(
    "aggs_histogram_percentiles",
    oracle="""
SELECT CAST(floor(l_quantity / 10) * 10 AS DOUBLE) AS qty_bucket,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS price_50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS price_95
FROM lineitem
GROUP BY 1
ORDER BY 1
""",
)
def aggs_histogram_percentiles(spark, sf_dir):
    """histogram(interval=10) + exact percentiles (single array pass)."""
    li = tbl(spark, sf_dir, "lineitem")
    out = compile_aggs(
        li,
        {
            "aggs": {
                "qty_bucket": {
                    "histogram": {"field": "l_quantity", "interval": 10},
                    "aggs": {
                        "price": {
                            "percentiles": {"field": "l_extendedprice", "percents": [50, 95]}
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "qty_bucket",
        "doc_count",
        F.round("price_50", 6).alias("price_50"),
        F.round("price_95", 6).alias("price_95"),
    ).orderBy("qty_bucket")


@query(
    "aggs_filters_top_hits",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
       CAST(row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
       ) AS INTEGER) AS hit_rank
FROM lineitem
QUALIFY hit_rank <= 2
ORDER BY l_returnflag, hit_rank
""",
)
def aggs_filters_top_hits(spark, sf_dir):
    """top_hits metric under a terms bucket: per-returnflag top-2 line items
    by price, straight from aggs-DSL JSON.  Compiles to a row_number window
    (WindowGroupLimit prunes each map partition to its local top-2 before
    the shuffle — same plan the hand-written window_topk_per_group pins)."""
    li = tbl(spark, sf_dir, "lineitem")
    out = compile_aggs(
        li,
        {
            "aggs": {
                "l_returnflag": {
                    "terms": {"field": "l_returnflag"},
                    "aggs": {
                        "hits": {
                            "top_hits": {
                                "size": 2,
                                "sort": [
                                    {"l_extendedprice": {"order": "desc"}},
                                    {"l_orderkey": {"order": "asc"}},
                                    {"l_linenumber": {"order": "asc"}},
                                ],
                                "_source": [
                                    "l_orderkey",
                                    "l_linenumber",
                                    "l_extendedprice",
                                ],
                            }
                        }
                    },
                }
            }
        },
    )
    return out.orderBy("l_returnflag", "hit_rank")


@query(
    "aggs_filters_buckets",
    oracle="""
SELECT *
FROM (
  SELECT 'finished' AS status, CAST(count(*) AS BIGINT) AS doc_count,
         round(avg(o_totalprice), 6) AS avg_price
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT 'urgent', CAST(count(*) AS BIGINT), round(avg(o_totalprice), 6)
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
ORDER BY status
""",
)
def aggs_filters_buckets(spark, sf_dir):
    """`filters` bucket agg: named query-DSL buckets.  Buckets OVERLAP
    (an urgent finished order is in both) — exact ES semantics via the
    names-array explode, still a single hash aggregation.  The oracle is
    the UNION ALL of the per-bucket aggregates."""
    o = tbl(spark, sf_dir, "orders")
    out = compile_aggs(
        o,
        {
            "aggs": {
                "status": {
                    "filters": {
                        "filters": {
                            "finished": {"term": {"o_orderstatus": "F"}},
                            "urgent": {"term": {"o_orderpriority": "1-URGENT"}},
                        }
                    },
                    "aggs": {"avg_price": {"avg": {"field": "o_totalprice"}}},
                }
            }
        },
    )
    return out.select(
        "status", "doc_count", F.round("avg_price", 6).alias("avg_price")
    ).orderBy("status")


@query(
    "aggs_filter_narrowed",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS total
FROM events
WHERE value >= 10.0
GROUP BY event_type
ORDER BY event_type
""",
)
def aggs_filter_narrowed(spark, sf_dir):
    """`filter` bucket narrowing a nested terms agg (the query-DSL range
    clause compiles through query_dsl -> pushed to the scan)."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "big": {
                    "filter": {"range": {"value": {"gte": 10.0}}},
                    "aggs": {
                        "event_type": {
                            "terms": {"field": "event_type"},
                            "aggs": {"total": {"sum": {"field": "value"}}},
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "event_type", "doc_count", F.round("total", 6).alias("total")
    ).orderBy("event_type")


@query(
    "aggs_pipeline_derivative",
    oracle="""
WITH buckets AS (
  SELECT date_trunc('day', ts) AS day_ts,
         CAST(count(*) AS BIGINT) AS doc_count,
         sum(value) AS rev
  FROM events
  GROUP BY 1
)
SELECT strftime(day_ts, '%Y-%m-%d %H:%M:%S') AS day,
       doc_count,
       round(rev, 6) AS rev,
       round(rev - lag(rev, 1) OVER (ORDER BY day_ts), 6) AS rev_deriv,
       round(sum(rev) OVER (ORDER BY day_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS rev_cum,
       round(avg(rev) OVER (ORDER BY day_ts
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS rev_ma3,
       round(rev / doc_count, 6) AS per_event
FROM buckets
WHERE doc_count >= 10
ORDER BY day
""",
)
def aggs_pipeline_derivative(spark, sf_dir):
    """ES pipeline aggregations over a date_histogram: derivative,
    cumulative_sum, moving_fn (window 3 trailing incl. current),
    bucket_script (per-event revenue), bucket_selector (doc_count >= 10).
    All compile to window functions over the FINISHED bucket rows — the
    raw events are aggregated exactly once; the pipeline pass touches
    only per-day bucket counts (hundreds of rows at any data scale)."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "day": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {
                        "rev": {"sum": {"field": "value"}},
                        "rev_deriv": {"derivative": {"buckets_path": "rev"}},
                        "rev_cum": {"cumulative_sum": {"buckets_path": "rev"}},
                        "rev_ma3": {
                            "moving_fn": {
                                "buckets_path": "rev",
                                "window": 3,
                                "script": "MovingFunctions.unweightedAvg(values)",
                            }
                        },
                        "per_event": {
                            "bucket_script": {
                                "buckets_path": {"r": "rev", "n": "_count"},
                                "script": "params.r / params.n",
                            }
                        },
                        "keep": {
                            "bucket_selector": {
                                "buckets_path": {"n": "_count"},
                                "script": "params.n >= 10",
                            }
                        },
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
        "doc_count",
        F.round("rev", 6).alias("rev"),
        F.round("rev_deriv", 6).alias("rev_deriv"),
        F.round("rev_cum", 6).alias("rev_cum"),
        F.round("rev_ma3", 6).alias("rev_ma3"),
        F.round("per_event", 6).alias("per_event"),
    ).orderBy("day")


@query(
    "aggs_pipeline_sibling",
    oracle="""
WITH buckets AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS doc_count,
         avg(n_chars) AS chars
  FROM documents
  GROUP BY lang
)
SELECT lang, doc_count,
       round(chars, 6) AS chars,
       round(avg(doc_count) OVER (), 6) AS avg_bucket_count,
       round(max(chars) OVER (), 6) AS max_bucket_chars
FROM buckets
ORDER BY lang
""",
)
def aggs_pipeline_sibling(spark, sf_dir):
    """Sibling pipeline aggs (avg_bucket / max_bucket beside the terms
    agg): the cross-bucket value is emitted as a column repeated on every
    bucket row — the flat-relational rendering of ES's sibling output."""
    d = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        d,
        {
            "aggs": {
                "lang": {
                    "terms": {"field": "lang"},
                    "aggs": {"chars": {"avg": {"field": "n_chars"}}},
                },
                "avg_bucket_count": {"avg_bucket": {"buckets_path": "lang>_count"}},
                "max_bucket_chars": {"max_bucket": {"buckets_path": "lang>chars"}},
            }
        },
    )
    return out.select(
        "lang",
        "doc_count",
        F.round("chars", 6).alias("chars"),
        F.round("avg_bucket_count", 6).alias("avg_bucket_count"),
        F.round("max_bucket_chars", 6).alias("max_bucket_chars"),
    ).orderBy("lang")


@query(
    "aggs_composite_page",
    oracle="""
SELECT event_type AS etype,
       strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS total
FROM events
GROUP BY event_type, date_trunc('day', ts)
HAVING (event_type, date_trunc('day', ts)) >
       ('click', TIMESTAMP '2024-01-05 00:00:00')
ORDER BY etype, date_trunc('day', ts)
LIMIT 10
""",
)
def aggs_composite_page(spark, sf_dir):
    """ES composite aggregation: multi-source buckets (terms ×
    date_histogram), key-ascending, resumed strictly after the
    ('click', 2024-01-05) cursor, one 10-bucket page.  The after cursor
    compiles to a lexicographic tuple filter and the page to a
    TakeOrderedAndProject — pagination over billions of buckets never
    global-sorts and each page is one aggregation pass."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "page": {
                    "composite": {
                        "size": 10,
                        "sources": [
                            {"etype": {"terms": {"field": "event_type"}}},
                            {"day": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}},
                        ],
                        "after": {"etype": "click", "day": "2024-01-05 00:00:00"},
                    },
                    "aggs": {"total": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        "etype",
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
        "doc_count",
        F.round("total", 6).alias("total"),
    )


@query(
    "aggs_significant_terms",
    oracle="""
WITH fg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS doc_count
  FROM documents WHERE n_chars > 300 GROUP BY lang
),
fgt AS (SELECT sum(doc_count) AS t FROM fg),
bg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS bg_count
  FROM documents GROUP BY lang
),
bgt AS (SELECT sum(bg_count) AS t FROM bg)
SELECT lang, doc_count, bg_count,
       round((doc_count / fgt.t - bg_count / bgt.t)
             * ((doc_count / fgt.t) / (bg_count / bgt.t)), 6) AS score
FROM fg JOIN bg USING (lang), fgt, bgt
WHERE (doc_count / fgt.t - bg_count / bgt.t)
      * ((doc_count / fgt.t) / (bg_count / bgt.t)) > 0
ORDER BY score DESC, lang
LIMIT 5
""",
)
def aggs_significant_terms(spark, sf_dir):
    """significant_terms with a filter-bucket foreground (long documents)
    vs the whole-table background, JLH-scored — which languages are
    over-represented among long docs.  Two tiny term-stat aggregations +
    a broadcast join; totals by window sum over the stat rows."""
    d = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        d,
        {
            "aggs": {
                "long_docs": {
                    "filter": {"range": {"n_chars": {"gt": 300}}},
                    "aggs": {
                        "lang": {
                            "significant_terms": {"field": "lang", "size": 5}
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "lang", "doc_count", "bg_count", F.round("score", 6).alias("score")
    )


@query(
    "aggs_rare_terms",
    oracle="""
SELECT n_chars, CAST(count(*) AS BIGINT) AS doc_count
FROM documents
GROUP BY n_chars
HAVING count(*) <= 2
ORDER BY doc_count ASC, n_chars
LIMIT 100
""",
)
def aggs_rare_terms(spark, sf_dir):
    """rare_terms: the long tail of document lengths — n_chars values
    carried by at most 2 documents, rarest first (one hash aggregation +
    TakeOrderedAndProject)."""
    d = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        d,
        {
            "aggs": {
                "n_chars": {
                    "rare_terms": {"field": "n_chars", "max_doc_count": 2, "size": 100}
                }
            }
        },
    )
    return out


@query(
    "aggs_extended_stats",
    oracle="""
SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(count(l_quantity) AS BIGINT) AS s_count,
       round(min(l_quantity), 2) AS s_min,
       round(max(l_quantity), 2) AS s_max,
       round(avg(l_quantity), 6) AS s_avg,
       round(sum(l_quantity), 2) AS s_sum,
       round(sum(l_quantity * l_quantity), 2) AS s_sum_of_squares,
       round(var_pop(l_quantity), 4) AS s_variance,
       round(stddev_pop(l_quantity), 4) AS s_std_deviation,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY doc_count DESC, flag
""",
)
def aggs_extended_stats(spark, sf_dir):
    """extended_stats + weighted_avg metrics under a terms bucket — the
    one-pass moments (sum of squares / population variance / stddev) and
    the {"value","weight"} spec shape.  All partial-aggregatable: one hash
    aggregation, no second pass."""
    li = tbl(spark, sf_dir, "lineitem")
    out = compile_aggs(
        li,
        {
            "aggs": {
                "flag": {
                    "terms": {"field": "l_returnflag", "size": 10},
                    "aggs": {
                        "s": {"extended_stats": {"field": "l_quantity"}},
                        "wavg_price": {
                            "weighted_avg": {
                                "value": {"field": "l_extendedprice"},
                                "weight": {"field": "l_quantity"},
                            }
                        },
                    },
                }
            }
        },
    )
    return out.select(
        "flag",
        "doc_count",
        "s_count",
        F.round("s_min", 2).alias("s_min"),
        F.round("s_max", 2).alias("s_max"),
        F.round("s_avg", 6).alias("s_avg"),
        F.round("s_sum", 2).alias("s_sum"),
        F.round("s_sum_of_squares", 2).alias("s_sum_of_squares"),
        F.round("s_variance", 4).alias("s_variance"),
        F.round("s_std_deviation", 4).alias("s_std_deviation"),
        F.round("wavg_price", 4).alias("wavg_price"),
    )


@query(
    "aggs_date_range",
    oracle="""
SELECT CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00' THEN 'early'
            WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
                 AND ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'mid'
            ELSE 'late' END AS phase,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS total
FROM events
GROUP BY phase
ORDER BY phase
""",
)
def aggs_date_range(spark, sf_dir):
    """date_range bucket agg: timestamp literals parsed into half-open
    [from, to) buckets (ES semantics), a metric per bucket — compiles to
    one CASE key + hash aggregation."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "phase": {
                    "date_range": {
                        "field": "ts",
                        "ranges": [
                            {"to": "2024-01-08 00:00:00", "key": "early"},
                            {
                                "from": "2024-01-08 00:00:00",
                                "to": "2024-01-16 00:00:00",
                                "key": "mid",
                            },
                            {"from": "2024-01-16 00:00:00", "key": "late"},
                        ],
                    },
                    "aggs": {"total": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        "phase", "doc_count", F.round("total", 4).alias("total")
    ).orderBy("phase")


_GEOTILE_Z = 3
_GEOTILE_N = 1 << _GEOTILE_Z
_MERC_SQL = "ln(tan(radians(glat)) + 1.0/cos(radians(glat)))"


@query(
    "aggs_geotile_grid",
    oracle=f"""
WITH pts AS (
  SELECT c_acctbal,
         greatest(-85.05112878, least(85.05112878,
             CAST((c_custkey % 180) - 89.5 AS DOUBLE))) AS glat,
         CAST(((c_custkey * 7) % 360) - 179.5 AS DOUBLE) AS glon
  FROM customer
), tiled AS (
  SELECT c_acctbal,
         concat('{_GEOTILE_Z}', '/',
                CAST(CAST(least(floor((glon + 180.0) / 360.0 * {_GEOTILE_N}),
                                {_GEOTILE_N - 1}) AS BIGINT) AS VARCHAR), '/',
                CAST(CAST(greatest(least(floor((1.0 - {_MERC_SQL} / pi()) / 2.0 * {_GEOTILE_N}),
                                         {_GEOTILE_N - 1}), 0) AS BIGINT) AS VARCHAR)) AS tile
  FROM pts
)
SELECT tile, CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(c_acctbal), 2) AS sum_bal
FROM tiled
GROUP BY tile
ORDER BY tile
""",
)
def aggs_geotile_grid(spark, sf_dir):
    """geotile_grid bucket agg: Web-Mercator z/x/y tile keys at zoom 3
    over a geo_point struct column (lat/lon derived from c_custkey, the
    geo-corpus convention) — pure codegen tile math + one hash
    aggregation; at scale the tile key doubles as a geo-locality
    partition column."""
    c = tbl(spark, sf_dir, "customer")
    pts = c.select(
        "c_acctbal",
        F.struct(
            ((F.col("c_custkey") % 180) - 89.5).alias("lat"),
            (((F.col("c_custkey") * 7) % 360) - 179.5).alias("lon"),
        ).alias("location"),
    )
    out = compile_aggs(
        pts,
        {
            "aggs": {
                "tile": {
                    "geotile_grid": {"field": "location", "precision": _GEOTILE_Z},
                    "aggs": {"sum_bal": {"sum": {"field": "c_acctbal"}}},
                }
            }
        },
    )
    # 2-dp sum of 2-dp values — same tie-free rounding rationale as the
    # geohash query below
    return out.select(
        F.col("tile"), "doc_count", F.round("sum_bal", 2).alias("sum_bal")
    ).orderBy("tile")


def _geohash_oracle_p2() -> str:
    """DuckDB twin of the p=2 geohash bucket: same quantization, same
    lon-first bit interleave, same base32 alphabet — generated from the
    identical bit layout the Column implementation uses."""
    lon_terms = " + ".join(
        f"(CASE WHEN (gx & {1 << (4 - i)}) > 0 THEN {1 << (9 - 2 * i)} ELSE 0 END)"
        for i in range(5)
    )
    lat_terms = " + ".join(
        f"(CASE WHEN (gy & {1 << (4 - i)}) > 0 THEN {1 << (8 - 2 * i)} ELSE 0 END)"
        for i in range(5)
    )
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    return f"""
WITH pts AS (
  SELECT c_acctbal,
         CAST((c_custkey % 180) - 89.5 AS DOUBLE) AS glat,
         CAST(((c_custkey * 7) % 360) - 179.5 AS DOUBLE) AS glon
  FROM customer
), cells AS (
  SELECT c_acctbal,
         least(CAST(floor((glon + 180.0) / 360.0 * 32) AS BIGINT), 31) AS gx,
         least(CAST(floor((glat + 90.0) / 180.0 * 32) AS BIGINT), 31) AS gy
  FROM pts
), vals AS (
  SELECT c_acctbal, ({lon_terms} + {lat_terms}) AS v FROM cells
)
SELECT concat(substr('{alpha}', CAST((v >> 5) & 31 AS INT) + 1, 1),
              substr('{alpha}', CAST(v & 31 AS INT) + 1, 1)) AS cell,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(c_acctbal), 2) AS sum_bal
FROM vals
GROUP BY cell
ORDER BY cell
"""


@query("aggs_geohash_grid", oracle=_geohash_oracle_p2())
def aggs_geohash_grid(spark, sf_dir):
    """geohash_grid bucket agg: classic base32 geohash cells at precision 2
    over the geo-corpus struct(lat, lon) points — integer bit-interleave as
    pure Column math (verified against the canonical test vectors, e.g.
    (57.64911, 10.40744) -> 'u4pruydqqvj'), one hash aggregation."""
    c = tbl(spark, sf_dir, "customer")
    pts = c.select(
        "c_acctbal",
        F.struct(
            ((F.col("c_custkey") % 180) - 89.5).alias("lat"),
            (((F.col("c_custkey") * 7) % 360) - 179.5).alias("lon"),
        ).alias("location"),
    )
    out = compile_aggs(
        pts,
        {
            "aggs": {
                "cell": {
                    "geohash_grid": {"field": "location", "precision": 2},
                    "aggs": {"sum_bal": {"sum": {"field": "c_acctbal"}}},
                }
            }
        },
    )
    # sum of 2-dp values rounded at 2 dp: no half-ulp rounding ties (an
    # avg at 4 dp hit one at sf0.01 — 5383.13625 rounds differently per
    # engine's summation order)
    return out.select("cell", "doc_count", F.round("sum_bal", 2).alias("sum_bal")).orderBy(
        "cell"
    )


@query(
    "aggs_terms_custom_order",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_orderpriority
ORDER BY sum(o_totalprice) ASC, o_orderpriority
LIMIT 3
""",
)
def aggs_terms_custom_order(spark, sf_dir):
    """terms with a custom bucket order: the 3 priorities with the LOWEST
    revenue (order by sub-metric asc — ES `"order": {"total": "asc"}`),
    proving size-truncation happens under the requested order, not the
    doc_count default."""
    o = tbl(spark, sf_dir, "orders")
    out = compile_aggs(
        o,
        {
            "aggs": {
                "o_orderpriority": {
                    "terms": {
                        "field": "o_orderpriority",
                        "size": 3,
                        "order": {"total": "asc"},
                    },
                    "aggs": {"total": {"sum": {"field": "o_totalprice"}}},
                }
            }
        },
    )
    return out.select(
        "o_orderpriority", "doc_count", F.round("total", 2).alias("total")
    )


# ------------------------------------------------------------- round 4:
# the aggs-DSL surfaces added this round — percentile_ranks, multi_terms,
# adjacency_matrix, serial_diff + bucket_sort (aggs_dsl.py round-4 block).


@query(
    "aggs_percentile_ranks",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(100.0 * avg(CASE WHEN value <= 0.25 THEN 1.0 ELSE 0.0 END), 6)
           AS pr_0_25,
       round(100.0 * avg(CASE WHEN value <= 0.5 THEN 1.0 ELSE 0.0 END), 6)
           AS pr_0_5,
       round(100.0 * avg(CASE WHEN value <= 0.9 THEN 1.0 ELSE 0.0 END), 6)
           AS pr_0_9
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def aggs_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks (inverse percentiles): per event_type, the % of
    docs with value <= each probe point — the exact CDF (ES's TDigest
    approximates the same quantity; aggs_dsl._metric percentile_ranks).
    Single-pass conditional averages, partial-aggregatable like any other
    metric — no sort, no percentile state."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "event_type": {
                    "terms": {"field": "event_type"},
                    "aggs": {
                        "pr": {
                            "percentile_ranks": {
                                "field": "value",
                                "values": [0.25, 0.5, 0.9],
                            }
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "event_type",
        "doc_count",
        F.round("pr_0_25", 6).alias("pr_0_25"),
        F.round("pr_0_5", 6).alias("pr_0_5"),
        F.round("pr_0_9", 6).alias("pr_0_9"),
    ).orderBy("event_type")


@query(
    "aggs_multi_terms",
    oracle="""
SELECT concat(lang, '|', source) AS pair,
       CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY pair
ORDER BY doc_count DESC, pair
LIMIT 15
""",
)
def aggs_multi_terms(spark, sf_dir):
    """ES multi_terms: one bucket per (lang, source) VALUE TUPLE with the
    "|"-joined key_as_string ES emits, default doc_count-desc order, size
    truncation under that order (aggs_dsl._bucket_key multi_terms).  One
    hash aggregation + TakeOrderedAndProject — identical plan shape to
    single-field terms."""
    docs = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        docs,
        {
            "aggs": {
                "pair": {
                    "multi_terms": {
                        "terms": [{"field": "lang"}, {"field": "source"}],
                        "size": 15,
                    },
                    "aggs": {"chars": {"sum": {"field": "n_chars"}}},
                }
            }
        },
    )
    return out.select(
        "pair", "doc_count", F.col("chars").cast("long").alias("chars")
    ).orderBy(F.col("doc_count").desc(), "pair")


@query(
    "aggs_adjacency_matrix",
    oracle="""
WITH cells AS (
  SELECT 'click' AS key, CAST(count(*) AS BIGINT) AS doc_count,
         round(sum(value), 4) AS sum_value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'err', CAST(count(*) AS BIGINT), round(sum(value), 4)
  FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT 'hi', CAST(count(*) AS BIGINT), round(sum(value), 4)
  FROM events WHERE value >= 0.5
  UNION ALL
  SELECT 'click&err', CAST(count(*) AS BIGINT), round(sum(value), 4)
  FROM events WHERE event_type = 'click' AND event_type = 'error'
  UNION ALL
  SELECT 'click&hi', CAST(count(*) AS BIGINT), round(sum(value), 4)
  FROM events WHERE event_type = 'click' AND value >= 0.5
  UNION ALL
  SELECT 'err&hi', CAST(count(*) AS BIGINT), round(sum(value), 4)
  FROM events WHERE event_type = 'error' AND value >= 0.5
)
SELECT key, doc_count, sum_value FROM cells
WHERE doc_count > 0
ORDER BY key
""",
)
def aggs_adjacency_matrix(spark, sf_dir):
    """ES adjacency_matrix: one bucket per named filter plus one per
    pairwise intersection ("a&b"), empty cells omitted — compiled to a
    SINGLE scan (per-row label array -> explode -> groupBy;
    aggs_dsl compile_aggs adjacency_matrix branch), where ES runs K + K²/2
    sub-aggregations.  The disjoint click/err pair proves empty
    intersections vanish rather than rendering zero rows."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "key": {
                    "adjacency_matrix": {
                        "filters": {
                            "click": {"term": {"event_type": "click"}},
                            "err": {"term": {"event_type": "error"}},
                            "hi": {"range": {"value": {"gte": 0.5}}},
                        }
                    },
                    "aggs": {"sum_value": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        "key", "doc_count", F.round("sum_value", 4).alias("sum_value")
    ).orderBy("key")


@query(
    "aggs_serial_diff_bucket_sort",
    oracle="""
WITH b AS (
  SELECT date_trunc('day', ts) AS day_ts,
         CAST(count(*) AS BIGINT) AS doc_count,
         sum(value) AS rev
  FROM events
  GROUP BY 1
), d AS (
  SELECT *, rev - lag(rev, 7) OVER (ORDER BY day_ts) AS rev_wow FROM b
), r AS (
  SELECT *, row_number() OVER (ORDER BY rev DESC, day_ts) AS rn FROM d
)
SELECT strftime(day_ts, '%Y-%m-%d %H:%M:%S') AS day,
       doc_count,
       round(rev, 6) AS rev,
       round(rev_wow, 6) AS rev_wow
FROM r WHERE rn <= 10
ORDER BY day
""",
)
def aggs_serial_diff_bucket_sort(spark, sf_dir):
    """ES serial_diff (lag-7 week-over-week differencing over daily
    buckets) + bucket_sort (top-10 revenue days, key-ascending
    presentation).  serial_diff is a lag window over the FINISHED bucket
    rows; bucket_sort is a row_number truncation of the same tiny frame —
    a WindowGroupLimit over buckets, never a sort of fact rows.  The sort
    carries the day key as tiebreak so the top-10 cut is deterministic."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "day": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {
                        "rev": {"sum": {"field": "value"}},
                        "rev_wow": {
                            "serial_diff": {"buckets_path": "rev", "lag": 7}
                        },
                        "top": {
                            "bucket_sort": {
                                "sort": [{"rev": {"order": "desc"}}, {"day": "asc"}],
                                "size": 10,
                            }
                        },
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
        "doc_count",
        F.round("rev", 6).alias("rev"),
        F.round("rev_wow", 6).alias("rev_wow"),
    ).orderBy("day")


def _auto_dh_oracle(target: int) -> str:
    from elasticsearch_hadoop_spark.aggs_dsl import AUTO_DH_LADDER

    rungs = "\n    ".join(
        f"WHEN hi//{r} - lo//{r} + 1 <= {target} THEN {r}" for r in AUTO_DH_LADDER
    )
    return f"""
WITH span AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
  FROM events
), iv AS (
  SELECT CASE
    {rungs}
    ELSE {AUTO_DH_LADDER[-1]} END AS i
  FROM span
)
SELECT strftime(epoch_ms(CAST(floor(epoch(ts) / i) AS BIGINT) * i * 1000),
                '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS sum_value
FROM events, iv
GROUP BY 1
ORDER BY 1
"""


@query("aggs_auto_date_histogram", oracle=_auto_dh_oracle(20))
def aggs_auto_date_histogram(spark, sf_dir):
    """ES auto_date_histogram: the engine picks the smallest
    rounding-ladder interval whose bucket count fits the target (20 here),
    then buckets like a fixed_interval date_histogram
    (aggs_dsl AUTO_DH_LADDER — fixed rungs; calendar rungs documented out
    of scope).  The min/max probe is ONE two-scalar aggregate; the oracle
    replays the rung choice with identical epoch-floor arithmetic, so a
    wrong rung — not just wrong counts — flips the hash."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "bucket": {
                    "auto_date_histogram": {"field": "ts", "buckets": 20},
                    "aggs": {"sum_value": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "doc_count",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("bucket")


@query(
    "aggs_boxplot_mad",
    oracle="""
WITH med AS (
  SELECT l_returnflag, median(l_extendedprice) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(min(l_quantity), 6) AS box_min,
       round(quantile_cont(l_quantity, 0.25), 6) AS box_q1,
       round(quantile_cont(l_quantity, 0.50), 6) AS box_q2,
       round(quantile_cont(l_quantity, 0.75), 6) AS box_q3,
       round(max(l_quantity), 6) AS box_max,
       round(median(abs(l_extendedprice - med.m)), 6) AS mad
FROM lineitem l JOIN med USING (l_returnflag)
GROUP BY l.l_returnflag, med.m
ORDER BY l.l_returnflag
""",
)
def aggs_boxplot_mad(spark, sf_dir):
    """ES boxplot + median_absolute_deviation metrics under a terms
    bucket.  boxplot's three quartiles share ONE array-argument exact
    percentile (one sort per group); MAD is two-phase — the bucket median
    attaches via a window over the SAME key the aggregation shuffles on,
    so Catalyst reuses the exchange (one physical shuffle end to end)."""
    li = tbl(spark, sf_dir, "lineitem")
    out = compile_aggs(
        li,
        {
            "aggs": {
                "l_returnflag": {
                    "terms": {"field": "l_returnflag", "order": {"_key": "asc"}},
                    "aggs": {
                        "box": {"boxplot": {"field": "l_quantity"}},
                        "mad": {
                            "median_absolute_deviation": {"field": "l_extendedprice"}
                        },
                    },
                }
            }
        },
    )
    return out.select(
        "l_returnflag",
        "doc_count",
        F.round("box_min", 6).alias("box_min"),
        F.round("box_q1", 6).alias("box_q1"),
        F.round("box_q2", 6).alias("box_q2"),
        F.round("box_q3", 6).alias("box_q3"),
        F.round("box_max", 6).alias("box_max"),
        F.round("mad", 6).alias("mad"),
    ).orderBy("l_returnflag")


@query(
    "aggs_diversified_sampler",
    oracle="""
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (
             PARTITION BY event_type
             ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rn
  FROM events
),
samp AS (
  SELECT event_type, value, event_id FROM ranked WHERE rn <= 40
  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 150
)
SELECT event_type, CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(value), 6) AS avg_value
FROM samp
GROUP BY event_type
ORDER BY event_type
""",
)
def aggs_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler: sub-aggs over a deduped deterministic
    sample — at most max_docs_per_value=40 events per event_type
    (row_number over the value, a WindowGroupLimit), capped at
    shard_size=150 under the md5(seed) hash order (TakeOrderedAndProject —
    per-partition heaps, never a global sort).  The scoreless engine's
    documented replacement for ES's per-shard top-by-score sampling."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "sample": {
                    "diversified_sampler": {
                        "field": "event_type",
                        "max_docs_per_value": 40,
                        "shard_size": 150,
                        "seed_field": "event_id",
                    },
                    "aggs": {
                        "event_type": {
                            "terms": {"field": "event_type", "order": {"_key": "asc"}},
                            "aggs": {"avg_value": {"avg": {"field": "value"}}},
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "event_type", "doc_count", F.round("avg_value", 6).alias("avg_value")
    ).orderBy("event_type")


@query(
    "aggs_sampler_string_stats",
    oracle="""
WITH samp AS (
  SELECT lang, text FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 200
)
SELECT lang, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(count(text) AS BIGINT) AS ts_count,
       CAST(min(length(text)) AS BIGINT) AS ts_min_length,
       CAST(max(length(text)) AS BIGINT) AS ts_max_length,
       round(avg(length(text)), 6) AS ts_avg_length
FROM samp
GROUP BY lang
ORDER BY lang
""",
)
def aggs_sampler_string_stats(spark, sf_dir):
    """ES sampler bucket (hash-ordered deterministic 200-doc sample, one
    TakeOrderedAndProject) feeding a terms bucket with a string_stats
    metric (count + length min/max/avg) — the cost-bounding pattern for
    expensive sub-aggs over a huge corpus."""
    docs = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        docs,
        {
            "aggs": {
                "sample": {
                    "sampler": {"shard_size": 200, "seed_field": "doc_id"},
                    "aggs": {
                        "lang": {
                            "terms": {"field": "lang", "order": {"_key": "asc"}},
                            "aggs": {"ts": {"string_stats": {"field": "text"}}},
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "lang",
        "doc_count",
        "ts_count",
        F.col("ts_min_length").cast("bigint").alias("ts_min_length"),
        F.col("ts_max_length").cast("bigint").alias("ts_max_length"),
        F.round("ts_avg_length", 6).alias("ts_avg_length"),
    ).orderBy("lang")


@query(
    "aggs_histogram_empty_buckets",
    oracle="""
WITH buckets AS (
  SELECT floor(value / 25.0::DOUBLE) AS idx,
         CAST(count(*) AS BIGINT) AS doc_count,
         avg(value) AS avg_v
  FROM events GROUP BY 1
),
bounds AS (
  SELECT least(floor(min(value) / 25.0::DOUBLE), floor(-50.0::DOUBLE / 25.0::DOUBLE)) AS lo,
         greatest(floor(max(value) / 25.0::DOUBLE), floor(700.0::DOUBLE / 25.0::DOUBLE)) AS hi
  FROM events
),
ladder AS (
  SELECT unnest(generate_series(CAST(lo AS BIGINT), CAST(hi AS BIGINT))) AS idx
  FROM bounds
),
dense AS (
  SELECT l.idx, coalesce(b.doc_count, 0) AS doc_count, b.avg_v
  FROM ladder l LEFT JOIN buckets b USING (idx)
)
SELECT round((idx * 25.0::DOUBLE)::DOUBLE, 6) AS val_bucket,
       doc_count,
       round(avg_v, 6) AS avg_v,
       CAST(doc_count - lag(doc_count) OVER (ORDER BY idx) AS BIGINT) AS dd
FROM dense
ORDER BY val_bucket
""",
)
def aggs_histogram_empty_buckets(spark, sf_dir):
    """histogram with min_doc_count=0 + extended_bounds (-50..700): the
    zero-doc buckets materialize from a spark.range ladder over the
    integer bucket-index space LEFT-joined to the aggregated buckets —
    bit-exact key equality (same index*interval arithmetic both sides),
    bounds = data range ∪ extended_bounds via one two-scalar aggregate.
    The derivative pipeline then runs over the DENSIFIED frame (the point
    of min_doc_count=0: gaps would otherwise corrupt the lag)."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "val_bucket": {
                    "histogram": {
                        "field": "value",
                        "interval": 25.0,
                        "min_doc_count": 0,
                        "extended_bounds": {"min": -50.0, "max": 700.0},
                    },
                    "aggs": {
                        "avg_v": {"avg": {"field": "value"}},
                        "dd": {"derivative": {"buckets_path": "_count"}},
                    },
                }
            }
        },
    )
    return out.select(
        "val_bucket",
        "doc_count",
        F.round("avg_v", 6).alias("avg_v"),
        F.col("dd").cast("bigint").alias("dd"),
    ).orderBy("val_bucket")


@query(
    "aggs_stats_bucket",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
         CAST(count(*) AS BIGINT) AS doc_count,
         sum(value) AS total
  FROM events GROUP BY 1
)
SELECT day, doc_count, round(total, 6) AS total,
       CAST(count(total) OVER () AS BIGINT) AS st_count,
       round(min(total) OVER (), 6) AS st_min,
       round(max(total) OVER (), 6) AS st_max,
       round(avg(total) OVER (), 6) AS st_avg,
       round(sum(total) OVER (), 6) AS st_sum,
       round(quantile_cont(total, 0.50) OVER (), 6) AS pb_50,
       round(quantile_cont(total, 0.95) OVER (), 6) AS pb_95
FROM daily
ORDER BY day
""",
)
def aggs_stats_bucket(spark, sf_dir):
    """Sibling pipelines stats_bucket + percentiles_bucket: cross-bucket
    count/min/max/avg/sum and exact interpolated percentiles of a daily
    sum, flattened onto every bucket row (the flat rendering of ES's
    sibling output).  The windows run over the POST-AGGREGATION bucket
    frame — a handful of rows — never the fact table."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "day": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {"total": {"sum": {"field": "value"}}},
                },
                "st": {"stats_bucket": {"buckets_path": "day>total"}},
                "pb": {
                    "percentiles_bucket": {
                        "buckets_path": "day>total",
                        "percents": [50, 95],
                    }
                },
            }
        },
    )
    return out.select(
        F.date_format("day", TS_FMT_SPARK).alias("day"),
        "doc_count",
        F.round("total", 6).alias("total"),
        "st_count",
        F.round("st_min", 6).alias("st_min"),
        F.round("st_max", 6).alias("st_max"),
        F.round("st_avg", 6).alias("st_avg"),
        F.round("st_sum", 6).alias("st_sum"),
        F.round("pb_50", 6).alias("pb_50"),
        F.round("pb_95", 6).alias("pb_95"),
    ).orderBy("day")


@query(
    "aggs_terms_include_exclude",
    oracle="""
SELECT source, CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(n_chars), 6) AS avg_chars
FROM documents
WHERE regexp_matches(source, '^(?:src1.*)$')
  AND source NOT IN ('src12', 'src15')
GROUP BY source
ORDER BY doc_count DESC, source
""",
)
def aggs_terms_include_exclude(spark, sf_dir):
    """terms include (anchored regex, like ES) + exclude (exact-value
    list): both compile to plain filters on the key expression BEFORE
    counting, so they push down with the scan — no post-aggregation
    bucket pruning."""
    docs = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        docs,
        {
            "aggs": {
                "source": {
                    "terms": {
                        "field": "source",
                        "include": "src1.*",
                        "exclude": ["src12", "src15"],
                    },
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            }
        },
    )
    return out.select(
        "source", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
    ).orderBy(F.col("doc_count").desc(), "source")


@query(
    "aggs_ip_range",
    oracle="""
WITH ips AS (
  SELECT concat_ws('.', '10',
                   CAST(user_id % 4 AS VARCHAR),
                   CAST(event_id % 256 AS VARCHAR),
                   CAST(user_id % 256 AS VARCHAR)) AS ip,
         value
  FROM events
), nums AS (
  SELECT CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipnum,
         value
  FROM ips
), b AS (
  SELECT unnest(list_filter([
           CASE WHEN ipnum < 167837696 THEN 'low' END,
           CASE WHEN ipnum >= 167837696 AND ipnum < 167968768 THEN 'mid' END,
           CASE WHEN ipnum >= 167903232 AND ipnum < 168034304
                THEN '10.2.0.0/15' END
         ], x -> x IS NOT NULL)) AS bucket,
         value
  FROM nums
)
SELECT bucket, CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS total
FROM b GROUP BY bucket ORDER BY bucket
""",
)
def aggs_ip_range(spark, sf_dir):
    """`ip_range` bucket agg: from/to ranges + a CIDR mask over a derived
    IPv4 column.  The mask (10.2.0.0/15) OVERLAPS the mid range — docs in
    the overlap land in BOTH buckets (the filters-style label explode);
    the address parses to a 32-bit int entirely in codegen
    (aggs_dsl._ipv4_to_long), mirrored digit-for-digit by the oracle."""
    ev = tbl(spark, sf_dir, "events")
    with_ip = ev.withColumn(
        "ip",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("user_id") % 4).cast("string"),
            (F.col("event_id") % 256).cast("string"),
            (F.col("user_id") % 256).cast("string"),
        ),
    )
    out = compile_aggs(
        with_ip,
        {
            "aggs": {
                "bucket": {
                    "ip_range": {
                        "field": "ip",
                        "ranges": [
                            {"key": "low", "to": "10.1.0.0"},
                            {"key": "mid", "from": "10.1.0.0", "to": "10.3.0.0"},
                            {"mask": "10.2.0.0/15"},
                        ],
                    },
                    "aggs": {"total": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        "bucket", "doc_count", F.round("total", 6).alias("total")
    ).orderBy("bucket")


@query(
    "aggs_top_metrics",
    oracle="""
WITH ranked AS (
  SELECT event_type, value, ts,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, value DESC) AS rn
  FROM events
), counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS doc_count,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_sort
  FROM events GROUP BY event_type
)
SELECT c.event_type, c.doc_count,
       round(r.value, 6) AS latest_value, c.latest_sort
FROM counts c JOIN ranked r
  ON r.event_type = c.event_type AND r.rn = 1
ORDER BY c.doc_count DESC, c.event_type
""",
)
def aggs_top_metrics(spark, sf_dir):
    """`top_metrics` (size=1): per event_type, the value carried by the
    most recent event.  Compiles to max_by over a (sort, metric) struct —
    single-pass, partial-aggregatable, deterministic tie-break on the
    metric itself (documented; ES's tie is shard-order).  The oracle
    replays the pick as a row_number window with the same tie-break."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "event_type": {
                    "terms": {"field": "event_type"},
                    "aggs": {
                        "latest": {
                            "top_metrics": {
                                "metrics": [{"field": "value"}],
                                "sort": {"ts": "desc"},
                            }
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "event_type",
        "doc_count",
        F.round("latest_value", 6).alias("latest_value"),
        F.date_format("latest_sort", TS_FMT_SPARK).alias("latest_sort"),
    )


@query(
    "aggs_t_test",
    oracle="""
SELECT
  round((avg(l_quantity) - avg(l_extendedprice))
        / sqrt(var_samp(l_quantity) / count(l_quantity)
               + var_samp(l_extendedprice) / count(l_extendedprice)), 4)
    AS welch_t,
  round(avg(l_quantity - l_extendedprice)
        / (stddev_samp(l_quantity - l_extendedprice) / sqrt(count(*))), 4)
    AS paired_t,
  round((avg(l_quantity) - avg(l_extendedprice))
        / sqrt((((count(l_quantity) - 1) * var_samp(l_quantity)
                 + (count(l_extendedprice) - 1) * var_samp(l_extendedprice))
                / (count(l_quantity) + count(l_extendedprice) - 2))
               * (1.0 / count(l_quantity) + 1.0 / count(l_extendedprice))), 4)
    AS pooled_t,
  CAST(count(*) AS BIGINT) AS doc_count
FROM lineitem
""",
)
def aggs_t_test(spark, sf_dir):
    """`t_test` metric in all three types (heteroscedastic/Welch — the ES
    default — paired, homoscedastic/pooled).  Emits the t STATISTIC (ES
    returns a p-value; the Student-t CDF is not Column math — documented
    deviation, the statistic is the mergeable part).  Single-pass moment
    aggregates, no shuffle beyond the one global agg."""
    li = tbl(spark, sf_dir, "lineitem")
    out = compile_aggs(
        li,
        {
            "aggs": {
                "welch_t": {
                    "t_test": {
                        "a": {"field": "l_quantity"},
                        "b": {"field": "l_extendedprice"},
                    }
                },
                "paired_t": {
                    "t_test": {
                        "a": {"field": "l_quantity"},
                        "b": {"field": "l_extendedprice"},
                        "type": "paired",
                    }
                },
                "pooled_t": {
                    "t_test": {
                        "a": {"field": "l_quantity"},
                        "b": {"field": "l_extendedprice"},
                        "type": "homoscedastic",
                    }
                },
            }
        },
    )
    return out.select(
        F.round("welch_t", 4).alias("welch_t"),
        F.round("paired_t", 4).alias("paired_t"),
        F.round("pooled_t", 4).alias("pooled_t"),
        "doc_count",
    )


@query(
    "aggs_matrix_stats",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS ms_count,
       round(avg(l_quantity), 6) AS ms_l_quantity_mean,
       round(var_samp(l_quantity), 6) AS ms_l_quantity_variance,
       round(avg(l_discount), 6) AS ms_l_discount_mean,
       round(var_samp(l_discount), 6) AS ms_l_discount_variance,
       round(avg(l_tax), 6) AS ms_l_tax_mean,
       round(var_samp(l_tax), 6) AS ms_l_tax_variance,
       round(covar_samp(l_quantity, l_discount), 6)
         AS ms_l_quantity_l_discount_covariance,
       round(corr(l_quantity, l_discount), 6)
         AS ms_l_quantity_l_discount_correlation,
       round(covar_samp(l_quantity, l_tax), 6)
         AS ms_l_quantity_l_tax_covariance,
       round(corr(l_quantity, l_tax), 6) AS ms_l_quantity_l_tax_correlation,
       round(covar_samp(l_discount, l_tax), 6)
         AS ms_l_discount_l_tax_covariance,
       round(corr(l_discount, l_tax), 6) AS ms_l_discount_l_tax_correlation,
       CAST(count(*) AS BIGINT) AS doc_count
FROM lineitem
""",
)
def aggs_matrix_stats(spark, sf_dir):
    """`matrix_stats` over three numeric fields: per-field mean/variance +
    pairwise covariance/correlation, row-wise complete observations (ES
    drops docs missing any field — mirrored by the complete-gate).  All
    one-pass partial-aggregatable moments."""
    li = tbl(spark, sf_dir, "lineitem")
    out = compile_aggs(
        li,
        {
            "aggs": {
                "ms": {
                    "matrix_stats": {
                        "fields": ["l_quantity", "l_discount", "l_tax"]
                    }
                }
            }
        },
    )
    rounded = [
        F.round(c, 6).alias(c) if c != "ms_count" else F.col(c)
        for c in out.columns
        if c != "doc_count"
    ]
    return out.select(*rounded, "doc_count")


@query(
    "aggs_geo_bounds_centroid",
    oracle="""
WITH pts AS (
  SELECT c_mktsegment,
         (c_custkey % 180) - 89.5::DOUBLE AS lat,
         ((c_custkey * 7) % 360) - 179.5::DOUBLE AS lon
  FROM customer
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS doc_count,
       round(max(lat), 6) AS box_top, round(min(lat), 6) AS box_bottom,
       round(min(lon), 6) AS box_left, round(max(lon), 6) AS box_right,
       round(avg(lat), 6) AS cen_lat, round(avg(lon), 6) AS cen_lon,
       CAST(count(*) AS BIGINT) AS cen_count
FROM pts
GROUP BY c_mktsegment
ORDER BY doc_count DESC, c_mktsegment
""",
)
def aggs_geo_bounds_centroid(spark, sf_dir):
    """`geo_bounds` (tightest box; wrap_longitude unsupported — plain
    min/max, documented) + `geo_centroid` (coordinate mean + point count)
    over a struct(lat, lon) geo_point column, per market segment."""
    c = tbl(spark, sf_dir, "customer")
    pts = c.select(
        "c_mktsegment",
        F.struct(
            ((F.col("c_custkey") % 180) - 89.5).alias("lat"),
            (((F.col("c_custkey") * 7) % 360) - 179.5).alias("lon"),
        ).alias("loc"),
    )
    out = compile_aggs(
        pts,
        {
            "aggs": {
                "c_mktsegment": {
                    "terms": {"field": "c_mktsegment"},
                    "aggs": {
                        "box": {"geo_bounds": {"field": "loc"}},
                        "cen": {"geo_centroid": {"field": "loc"}},
                    },
                }
            }
        },
    )
    return out.select(
        "c_mktsegment",
        "doc_count",
        F.round("box_top", 6).alias("box_top"),
        F.round("box_bottom", 6).alias("box_bottom"),
        F.round("box_left", 6).alias("box_left"),
        F.round("box_right", 6).alias("box_right"),
        F.round("cen_lat", 6).alias("cen_lat"),
        F.round("cen_lon", 6).alias("cen_lon"),
        "cen_count",
    )


@query(
    "aggs_nested_items",
    oracle="""
SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(l_quantity), 6) AS qty_avg
FROM lineitem
GROUP BY l_returnflag
ORDER BY doc_count DESC, flag
""",
)
def aggs_nested_items(spark, sf_dir):
    """`nested` bucket agg: sub-aggs run over the array ELEMENTS of the
    path (per-order item docs rolled up from lineitem — the ES nested-doc
    shape), so doc_count is the nested-doc count, exactly like ES.  The
    explode rebinds the path column to the element; `items.flag` resolves
    against it."""
    li = tbl(spark, sf_dir, "lineitem")
    docs = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_returnflag").alias("flag"),
                F.col("l_quantity").alias("qty"),
            )
        ).alias("items")
    )
    out = compile_aggs(
        docs,
        {
            "aggs": {
                "items_docs": {
                    "nested": {"path": "items"},
                    "aggs": {
                        "flag": {
                            "terms": {"field": "items.flag"},
                            "aggs": {"qty_avg": {"avg": {"field": "items.qty"}}},
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "flag", "doc_count", F.round("qty_avg", 6).alias("qty_avg")
    )


@query(
    "aggs_global_escape",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(value), 6) AS avg_all
FROM events
""",
)
def aggs_global_escape(spark, sf_dir):
    """`global` bucket: sub-aggs escape the search query and see the whole
    index.  The caller hands the pre-query frame in as base_df (explicit,
    never a silent no-op): the outer frame is filtered to clicks, but
    doc_count/avg_all cover ALL events."""
    ev = tbl(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    out = compile_aggs(
        clicks,
        {
            "aggs": {
                "all_docs": {
                    "global": {},
                    "aggs": {"avg_all": {"avg": {"field": "value"}}},
                }
            }
        },
        base_df=ev,
    )
    return out.select("doc_count", F.round("avg_all", 6).alias("avg_all"))


@query(
    "aggs_normalize",
    oracle="""
WITH buckets AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
         CAST(count(*) AS BIGINT) AS doc_count,
         sum(value) AS total
  FROM events GROUP BY 1
)
SELECT day, doc_count,
       round(total, 6) AS total,
       round(total / sum(total) OVER (), 6) AS pct,
       round((total - avg(total) OVER ()) / stddev_pop(total) OVER (), 6) AS z
FROM buckets
ORDER BY day
""",
)
def aggs_normalize(spark, sf_dir):
    """`normalize` pipeline agg: percent_of_sum and z-score of a bucket
    metric across its sibling buckets — an unordered window over the
    bucket frame (never the fact rows).  z-score uses the POPULATION
    stddev: the bucket set is the whole population."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "day": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {
                        "total": {"sum": {"field": "value"}},
                        "pct": {
                            "normalize": {
                                "buckets_path": "total",
                                "method": "percent_of_sum",
                            }
                        },
                        "z": {
                            "normalize": {
                                "buckets_path": "total",
                                "method": "z-score",
                            }
                        },
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("day", TS_FMT_SPARK).alias("day"),
        "doc_count",
        F.round("total", 6).alias("total"),
        F.round("pct", 6).alias("pct"),
        F.round("z", 6).alias("z"),
    ).orderBy("day")


@query(
    "aggs_rate",
    oracle="""
SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 43200) AS BIGINT) * 43200),
                '%Y-%m-%d %H:%M:%S') AS half_day,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value) * (86400.0 / 43200.0), 6) AS value_per_day,
       round(count(*) * (3600.0 / 43200.0), 6) AS events_per_hour
FROM events
GROUP BY 1
ORDER BY half_day
""",
)
def aggs_rate(spark, sf_dir):
    """`rate` metric inside a fixed_interval date_histogram: the bucket
    total (sum of a field, or doc_count) scaled to a per-`unit` rate by
    unit_seconds / interval_seconds.  Calendar intervals are rejected (no
    constant width) — documented."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "half_day": {
                    "date_histogram": {"field": "ts", "fixed_interval": "12h"},
                    "aggs": {
                        "value_per_day": {"rate": {"field": "value", "unit": "day"}},
                        "events_per_hour": {"rate": {"unit": "hour"}},
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("half_day", TS_FMT_SPARK).alias("half_day"),
        "doc_count",
        F.round("value_per_day", 6).alias("value_per_day"),
        F.round(F.col("events_per_hour").cast("double"), 6).alias("events_per_hour"),
    ).orderBy("half_day")


@query(
    "aggs_composite_date_after",
    oracle="""
WITH buckets AS (
  SELECT date_trunc('day', ts) AS day_ts, event_type,
         CAST(count(*) AS BIGINT) AS doc_count,
         round(sum(value), 6) AS total
  FROM events
  GROUP BY 1, 2
)
SELECT strftime(day_ts, '%Y-%m-%d %H:%M:%S') AS day, event_type, doc_count, total
FROM buckets
WHERE (day_ts > TIMESTAMP '2024-01-03 00:00:00')
   OR (day_ts = TIMESTAMP '2024-01-03 00:00:00' AND event_type > 'error')
ORDER BY day_ts, event_type
LIMIT 7
""",
)
def aggs_composite_date_after(spark, sf_dir):
    """`composite` with a date_histogram source + `after` resume cursor
    (the keyset-pagination shape ES uses for billions of buckets): key-
    ascending order, strictly-after lexicographic tuple filter, one page —
    a TakeOrderedAndProject, never a full bucket sort."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "page": {
                    "composite": {
                        "size": 7,
                        "sources": [
                            {
                                "day": {
                                    "date_histogram": {
                                        "field": "ts",
                                        "calendar_interval": "day",
                                    }
                                }
                            },
                            {"event_type": {"terms": {"field": "event_type"}}},
                        ],
                        "after": {
                            "day": "2024-01-03 00:00:00",
                            "event_type": "error",
                        },
                    },
                    "aggs": {"total": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        F.date_format("day", TS_FMT_SPARK).alias("day"),
        "event_type",
        "doc_count",
        F.round("total", 6).alias("total"),
    ).orderBy("day", "event_type")


@query(
    "aggs_significant_text",
    oracle="""
WITH toks AS (
    SELECT DISTINCT doc_id, tok
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
          FROM documents)
    WHERE tok <> ''
),
fg_docs AS (SELECT doc_id FROM documents WHERE lang = 'en'),
fg AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS doc_count
    FROM toks WHERE doc_id IN (SELECT doc_id FROM fg_docs) GROUP BY tok
),
bg AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS bg_count FROM toks GROUP BY tok
),
fgt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM fg_docs),
bgt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM documents)
SELECT tok, doc_count, bg_count,
       round((doc_count / fgt.t - bg_count / bgt.t)
             * ((doc_count / fgt.t) / (bg_count / bgt.t)), 6) AS score
FROM fg JOIN bg USING (tok), fgt, bgt
WHERE (doc_count / fgt.t - bg_count / bgt.t)
      * ((doc_count / fgt.t) / (bg_count / bgt.t)) > 0
ORDER BY score DESC, tok
LIMIT 10
""",
)
def aggs_significant_text(spark, sf_dir):
    """significant_text: JLH-scored tokens over-represented in English
    docs vs the whole corpus.  Per ES, each doc counts once per distinct
    term (array_distinct before explode) and totals are DOCUMENT counts —
    broadcast scalar frames, never a window over token rows."""
    d = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        d,
        {
            "aggs": {
                "english": {
                    "filter": {"term": {"lang": "en"}},
                    "aggs": {
                        "tok": {"significant_text": {"field": "text", "size": 10}}
                    },
                }
            }
        },
    )
    return out.select(
        "tok", "doc_count", "bg_count", F.round("score", 6).alias("score")
    )


@query(
    "aggs_cumulative_cardinality",
    oracle="""
WITH b AS (
    SELECT date_trunc('day', ts) AS day,
           CAST(count(*) AS BIGINT) AS doc_count,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq
    FROM events GROUP BY 1
),
f AS (
    SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1
),
n AS (SELECT day, count(*) AS nw FROM f GROUP BY 1)
SELECT strftime(b.day, '%Y-%m-%d') AS day, b.doc_count, b.uniq,
       CAST(sum(coalesce(n.nw, 0)) OVER (
            ORDER BY b.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM b LEFT JOIN n USING (day)
ORDER BY day
""",
)
def aggs_cumulative_cardinality(spark, sf_dir):
    """cumulative_cardinality over a daily date_histogram: distinct users
    seen so far.  Exact first-occurrence implementation — each user's
    first day (one shuffle on user), first-appearances per day (tiny
    shuffle), cumulative sum over bucket rows — never a distinct-count
    per growing prefix.  ES's HLL-merge is the approximate twin
    (operators/sketches.py)."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "daily": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {
                        "uniq": {"cardinality": {"field": "user_id"}},
                        "cum_users": {
                            "cumulative_cardinality": {"buckets_path": "uniq"}
                        },
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("daily", "yyyy-MM-dd").alias("day"),
        "doc_count",
        "uniq",
        "cum_users",
    ).orderBy("day")


@query(
    "aggs_variable_width_histogram",
    oracle="""
WITH bnds AS (
    SELECT quantile_cont(o_totalprice,
        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
    FROM orders
)
SELECT len(list_filter(bs, b -> o_totalprice > b)) AS price_bucket,
       round(min(o_totalprice), 2) AS price_min,
       round(max(o_totalprice), 2) AS price_max,
       round(avg(o_totalprice), 6) AS price_centroid,
       CAST(count(*) AS BIGINT) AS doc_count
FROM orders, bnds
GROUP BY 1
ORDER BY price_bucket
""",
)
def aggs_variable_width_histogram(spark, sf_dir):
    """variable_width_histogram (deterministic twin: equal-frequency
    clusters at exact quantile boundaries — ES's streaming clusters are
    shard-order dependent, documented deviation).  One distributed
    percentile aggregate broadcast as a 1-row frame, bucket assignment a
    codegen fold over the boundary array, one hash agg — never an NTILE
    global sort."""
    o = tbl(spark, sf_dir, "orders")
    out = compile_aggs(
        o,
        {
            "aggs": {
                "price": {
                    "variable_width_histogram": {
                        "field": "o_totalprice",
                        "buckets": 8,
                    }
                }
            }
        },
    )
    return out.select(
        "price_bucket",
        F.round("price_min", 2).alias("price_min"),
        F.round("price_max", 2).alias("price_max"),
        F.round("price_centroid", 6).alias("price_centroid"),
        "doc_count",
    ).orderBy("price_bucket")


@query(
    "aggs_filters_other_bucket",
    oracle="""
SELECT CASE WHEN event_type = 'click' THEN 'clicks'
            WHEN event_type = 'purchase' THEN 'purchases'
            ELSE 'rest' END AS bucket,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1
ORDER BY bucket
""",
)
def aggs_filters_other_bucket(spark, sf_dir):
    """`filters` with other_bucket_key: docs matching no named filter land
    in the catch-all bucket — the none-matched predicate folds into the
    same single-scan explode as the named buckets (no second pass)."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "bucket": {
                    "filters": {
                        "filters": {
                            "clicks": {"term": {"event_type": "click"}},
                            "purchases": {"term": {"event_type": "purchase"}},
                        },
                        "other_bucket_key": "rest",
                    },
                    "aggs": {"avg_value": {"avg": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        "bucket", "doc_count", F.round("avg_value", 6).alias("avg_value")
    ).orderBy("bucket")


@query(
    "aggs_date_histogram_offset",
    oracle="""
SELECT strftime(to_timestamp(
         ((CAST(floor(date_part('epoch', ts)) AS BIGINT) - 10800) // 21600)
         * 21600 + 10800), '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS total
FROM events
GROUP BY 1
ORDER BY bucket
""",
)
def aggs_date_histogram_offset(spark, sf_dir):
    """date_histogram fixed_interval 6h with offset +3h: boundaries at
    03/09/15/21 — the offset is constant epoch arithmetic inside the same
    codegen bucket key, one hash aggregate as ever."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "bucket": {
                    "date_histogram": {
                        "field": "ts",
                        "fixed_interval": "6h",
                        "offset": "+3h",
                    },
                    "aggs": {"total": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "doc_count",
        F.round("total", 6).alias("total"),
    ).orderBy("bucket")


@query(
    "aggs_ip_prefix",
    oracle="""
WITH ips AS (
  SELECT concat_ws('.', '10',
                   CAST(user_id % 4 AS VARCHAR),
                   CAST(event_id % 256 AS VARCHAR),
                   CAST(user_id % 256 AS VARCHAR)) AS ip,
         value
  FROM events
), nums AS (
  SELECT CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipnum,
         value
  FROM ips
), masked AS (
  SELECT ((ipnum >> 10) << 10) AS net, value FROM nums
)
SELECT concat(CAST((net >> 24) & 255 AS VARCHAR), '.',
              CAST((net >> 16) & 255 AS VARCHAR), '.',
              CAST((net >> 8) & 255 AS VARCHAR), '.',
              CAST(net & 255 AS VARCHAR), '/22') AS subnet,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS total
FROM masked
GROUP BY net
ORDER BY subnet
""",
)
def aggs_ip_prefix(spark, sf_dir):
    """`ip_prefix` bucket agg: /22 network buckets over the derived IPv4
    column (the ip_range fixture convention) with append_prefix_length —
    the mask is shiftright/shiftleft codegen, mirrored bit-for-bit by the
    oracle's >>/<< arithmetic."""
    ev = tbl(spark, sf_dir, "events")
    with_ip = ev.withColumn(
        "ip",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("user_id") % 4).cast("string"),
            (F.col("event_id") % 256).cast("string"),
            (F.col("user_id") % 256).cast("string"),
        ),
    )
    out = compile_aggs(
        with_ip,
        {
            "aggs": {
                "subnet": {
                    "ip_prefix": {
                        "field": "ip",
                        "prefix_length": 22,
                        "append_prefix_length": True,
                    },
                    "aggs": {"total": {"sum": {"field": "value"}}},
                }
            }
        },
    )
    return out.select(
        "subnet", "doc_count", F.round("total", 6).alias("total")
    ).orderBy("subnet")


@query(
    "aggs_moving_percentiles",
    oracle="""
WITH buckets AS (
  SELECT date_trunc('day', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS doc_count,
         sum(value) AS total
  FROM events
  GROUP BY 1
)
SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, doc_count,
       round(total, 6) AS total,
       round(quantile_cont(total, 0.5) OVER w, 6) AS mp_50,
       round(quantile_cont(total, 0.9) OVER w, 6) AS mp_90
FROM buckets
WINDOW w AS (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY bucket
""",
)
def aggs_moving_percentiles(spark, sf_dir):
    """`moving_percentiles` pipeline agg: p50/p90 of the daily sum over a
    3-bucket trailing window (same INCLUDING-current convention as
    moving_fn, documented) — a window over the finished bucket frame,
    never the fact rows."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "bucket": {
                    "date_histogram": {"field": "ts", "calendar_interval": "day"},
                    "aggs": {
                        "total": {"sum": {"field": "value"}},
                        "mp": {
                            "moving_percentiles": {
                                "buckets_path": "total",
                                "window": 3,
                                "percents": [50, 90],
                            }
                        },
                    },
                }
            }
        },
    )
    return out.select(
        F.date_format("bucket", TS_FMT_SPARK).alias("bucket"),
        "doc_count",
        F.round("total", 6).alias("total"),
        F.round("mp_50", 6).alias("mp_50"),
        F.round("mp_90", 6).alias("mp_90"),
    ).orderBy("bucket")


@query(
    "aggs_geo_line",
    oracle="""
WITH pts AS (
  SELECT c_mktsegment,
         c_custkey,
         CAST((c_custkey % 180) - 89.5 AS DOUBLE) AS glat,
         CAST(((c_custkey * 7) % 360) - 179.5 AS DOUBLE) AS glon
  FROM customer
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS doc_count,
       to_json(list_slice(list([glon, glat] ORDER BY c_custkey, glon, glat),
                          1, 5)) AS track
FROM pts
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def aggs_geo_line(spark, sf_dir):
    """`geo_line` metric agg: per-segment GeoJSON-style [lon, lat] path of
    the first 5 points ordered by c_custkey (the sort field) — array_sort
    over collected (sort, lon, lat) structs, so the result is
    deterministic despite collect_list's partition-order
    nondeterminism."""
    c = tbl(spark, sf_dir, "customer")
    pts = c.select(
        "c_mktsegment",
        "c_custkey",
        F.struct(
            ((F.col("c_custkey") % 180) - 89.5).alias("lat"),
            (((F.col("c_custkey") * 7) % 360) - 179.5).alias("lon"),
        ).alias("location"),
    )
    out = compile_aggs(
        pts,
        {
            "aggs": {
                "c_mktsegment": {
                    "terms": {"field": "c_mktsegment"},
                    "aggs": {
                        "track": {
                            "geo_line": {
                                "point": {"field": "location"},
                                "sort": {"field": "c_custkey"},
                                "size": 5,
                            }
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "c_mktsegment", "doc_count", F.to_json("track").alias("track")
    ).orderBy("c_mktsegment")


@query(
    "aggs_scripted_metric",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(o_totalprice * 0.1 + 1), 6) AS scripted_revenue
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def aggs_scripted_metric(spark, sf_dir):
    """`scripted_metric` in the distributable accumulate subset: init
    'state.t = 0', map 'state.t += doc[o_totalprice].value * 0.1 + 1',
    summing combine/reduce — compiles to a partial-aggregatable SUM (one
    shuffle, map-side combine), the part of scripted_metric that
    actually scales."""
    o = tbl(spark, sf_dir, "orders")
    out = compile_aggs(
        o,
        {
            "aggs": {
                "o_orderpriority": {
                    "terms": {"field": "o_orderpriority"},
                    "aggs": {
                        "scripted_revenue": {
                            "scripted_metric": {
                                "init_script": "state.t = 0",
                                "map_script": (
                                    "state.t += doc['o_totalprice'].value"
                                    " * 0.1 + 1"
                                ),
                                "combine_script": "return state.t",
                                "reduce_script": (
                                    "double s = 0; for (t in states)"
                                    " { s += t } return s"
                                ),
                            }
                        }
                    },
                }
            }
        },
    )
    return out.select(
        "o_orderpriority",
        "doc_count",
        F.round("scripted_revenue", 6).alias("scripted_revenue"),
    ).orderBy("o_orderpriority")


@query(
    "aggs_frequent_item_sets",
    oracle="""
WITH docs AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> length(x) > 0),
             t -> t IN ('merge', 'sort', 'window', 'join', 'hash')
         ))) AS items
  FROM documents
),
total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
singles AS (
  SELECT doc_id, [item] AS iset
  FROM (SELECT doc_id, unnest(items) AS item FROM docs)
),
pos AS (SELECT doc_id, unnest(items) AS item FROM docs),
pairs AS (
  SELECT a.doc_id, [a.item, b.item] AS iset
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND a.item < b.item
),
sets AS (SELECT * FROM singles UNION ALL SELECT * FROM pairs),
agg AS (
  SELECT array_to_string(iset, '|') AS sets, CAST(len(iset) AS INT) AS set_size,
         CAST(count(*) AS BIGINT) AS doc_count,
         round(count(*) / (SELECT n FROM total), 6) AS support
  FROM sets GROUP BY iset
)
SELECT sets, set_size, doc_count, support
FROM agg
WHERE support >= 0.3
ORDER BY doc_count DESC, sets
LIMIT 10
""",
)
def aggs_frequent_item_sets(spark, sf_dir):
    """ES `frequent_item_sets` (size-<=2 subset): co-occurring query-shape
    tags mined from the documents corpus — per-doc pair generation in
    nested-transform Column math (no self-join on doc id), one exploded
    hash aggregation, support from a single driver-side scalar."""
    docs = tbl(spark, sf_dir, "documents")
    from elasticsearch_hadoop_spark.functions.text import standard_analyze

    tagged = docs.select(
        F.array_intersect(
            F.array_sort(F.array_distinct(standard_analyze(F.col("text")))),
            F.lit(["hash", "join", "merge", "sort", "window"]),
        ).alias("items")
    )
    out = compile_aggs(
        tagged,
        {"aggs": {"sets": {"frequent_item_sets": {
            "fields": [{"field": "items"}],
            "minimum_support": 0.3,
            "size": 10,
        }}}},
    )
    return out.select(
        F.array_join("sets", "|").alias("sets"),
        "set_size",
        "doc_count",
        F.round("support", 6).alias("support"),
    ).orderBy(F.col("doc_count").desc(), F.col("sets").asc())


@query(
    "aggs_bucket_correlation",
    oracle="""
WITH b AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS doc_count,
         sum(value) AS total
  FROM events GROUP BY event_type
),
exp_map AS (
  SELECT event_type, total,
         CASE row_number() OVER (ORDER BY event_type)
           WHEN 1 THEN 10.0 WHEN 2 THEN 50.0 WHEN 3 THEN 20.0
           WHEN 4 THEN 40.0 WHEN 5 THEN 30.0 END AS expv
  FROM b
),
c AS (SELECT corr(total, expv) AS corr_v FROM exp_map)
SELECT b.event_type, b.doc_count, round(b.total, 6) AS total,
       round((SELECT corr_v FROM c), 6) AS corr
FROM b
ORDER BY b.event_type
""",
)
def aggs_bucket_correlation(spark, sf_dir):
    """`bucket_correlation` sibling pipeline: Pearson correlation between
    the per-event-type totals and a caller-provided indicator series
    (zipped by bucket order), repeated on every bucket row — a window
    over the finished 5-bucket frame, never the fact rows."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {"aggs": {
            "event_type": {
                "terms": {"field": "event_type"},
                "aggs": {"total": {"sum": {"field": "value"}}},
            },
            "corr": {"bucket_correlation": {
                "buckets_path": "event_type>total",
                "function": {"count_correlation": {"indicator": {
                    "expectations": [10.0, 50.0, 20.0, 40.0, 30.0],
                    "doc_count": 5,
                }}},
            }},
        }},
    )
    return out.select(
        "event_type",
        "doc_count",
        F.round("total", 6).alias("total"),
        F.round("corr", 6).alias("corr"),
    ).orderBy("event_type")


@query(
    "aggs_change_point",
    oracle="""
WITH b AS (
  SELECT date_trunc('day', ts) AS bucket,
         sum(value + CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                          THEN 50.0::DOUBLE ELSE 0.0::DOUBLE END) AS total
  FROM events GROUP BY 1
),
s AS (
  SELECT bucket, total,
         row_number() OVER w AS rn,
         sum(total) OVER w AS ps,
         sum(total * total) OVER w AS pss,
         count(*) OVER () AS n,
         sum(total) OVER () AS ts_,
         sum(total * total) OVER () AS tss,
         lead(bucket) OVER w AS nxt
  FROM b WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
),
t AS (
  SELECT *,
         CASE WHEN rn < n THEN
           abs(ps / rn - (ts_ - ps) / (n - rn))
           / nullif(sqrt(greatest(pss / rn - (ps / rn) * (ps / rn), 0) / rn
                  + greatest((tss - pss) / (n - rn)
                             - ((ts_ - ps) / (n - rn)) * ((ts_ - ps) / (n - rn)),
                             0) / (n - rn)), 0)
         END AS tt
  FROM s
),
w AS (
  SELECT nxt, tt FROM t ORDER BY tt DESC NULLS LAST, bucket LIMIT 1
)
SELECT strftime(b.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       round(b.total, 6) AS total,
       strftime((SELECT nxt FROM w), '%Y-%m-%d %H:%M:%S') AS cp_key,
       round((SELECT tt FROM w), 6) AS cp_score
FROM b ORDER BY bucket
""",
)
def aggs_change_point(spark, sf_dir):
    """`change_point` sibling pipeline (step_change detector subset): the
    daily revenue series carries an injected +50/event level shift from
    Jan 16; every split of the ordered bucket series is scored by the
    Welch t-statistic via prefix sums (ONE window pass, no per-split
    rescan) and the winning split's first-after bucket + |t| repeat on
    each row."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "value",
        F.col("value")
        + F.when(
            F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"), 50.0
        ).otherwise(0.0),
    )
    out = compile_aggs(
        ev,
        {"aggs": {
            "bucket": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"total": {"sum": {"field": "value"}}},
            },
            "cp": {"change_point": {"buckets_path": "bucket>total"}},
        }},
    )
    return out.select(
        F.date_format("bucket", TS_FMT_SPARK).alias("bucket"),
        F.round("total", 6).alias("total"),
        F.date_format("cp_key", TS_FMT_SPARK).alias("cp_key"),
        F.round("cp_score", 6).alias("cp_score"),
    ).orderBy("bucket")


@query(
    "aggs_composite_date_page",
    oracle="""
WITH b AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         CAST(count(*) AS BIGINT) AS doc_count,
         round(sum(value), 6) AS total
  FROM events
  GROUP BY 1, 2
)
SELECT strftime(day, '%Y-%m-%d %H:%M:%S') AS day, event_type,
       doc_count, total
FROM b
WHERE (day, event_type) > (TIMESTAMP '2024-01-03 00:00:00', 'purchase')
ORDER BY day, event_type
LIMIT 8
""",
)
def aggs_composite_date_page(spark, sf_dir):
    """`composite` paging with a date_histogram source (the STATUS.md
    gap): (day, event_type) buckets resumed strictly after the
    ('2024-01-03', 'purchase') cursor, one 8-bucket page — the after
    tuple compiles to the lexicographic keyset filter and the page is a
    TakeOrderedAndProject, never a full sort."""
    ev = tbl(spark, sf_dir, "events")
    out = compile_aggs(
        ev,
        {"aggs": {
            "page": {
                "composite": {
                    "size": 8,
                    "sources": [
                        {"day": {"date_histogram": {
                            "field": "ts", "calendar_interval": "day",
                        }}},
                        {"event_type": {"terms": {"field": "event_type"}}},
                    ],
                    "after": {"day": "2024-01-03 00:00:00",
                              "event_type": "purchase"},
                },
                "aggs": {"total": {"sum": {"field": "value"}}},
            }
        }},
    )
    return out.select(
        F.date_format("day", TS_FMT_SPARK).alias("day"),
        "event_type",
        "doc_count",
        F.round("total", 6).alias("total"),
    ).orderBy("day", "event_type")


@query(
    "aggs_reverse_nested",
    oracle="""
SELECT l_returnflag AS flag,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS doc_count
FROM lineitem
GROUP BY l_returnflag
ORDER BY flag
""",
)
def aggs_reverse_nested(spark, sf_dir):
    """`reverse_nested`: nested line-item docs bucket by their flag, then
    re-widen to PARENT orders — how many ORDERS carry each flag (each
    parent counted once per element bucket, ES's comments-per-tag shape).
    The dedup key is (parent id, materialized element-bucket key);
    requires the parent_id_col contract."""
    li = tbl(spark, sf_dir, "lineitem")
    docs = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_returnflag").alias("flag"))
        ).alias("items")
    )
    out = compile_aggs(
        docs,
        {"aggs": {"items_docs": {
            "nested": {"path": "items"},
            "aggs": {"flag": {
                "terms": {"field": "items.flag"},
                "aggs": {"orders": {"reverse_nested": {}, "aggs": {}}},
            }},
        }}},
        parent_id_col="l_orderkey",
    )
    return out.select("flag", "doc_count").orderBy("flag")


def _pc_frame(spark, sf_dir):
    """The join-field frame (orders parents + lineitem children) the
    children/parent bucket aggs switch context over — same data model as
    corpus/joins._join_field_frame, scoped here so the two corpora stay
    independent."""
    o = tbl(spark, sf_dir, "orders").select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("_id"),
        F.struct(
            F.lit("order").alias("name"),
            F.lit(None).cast("string").alias("parent"),
        ).alias("join_field"),
        F.col("o_orderpriority").alias("priority"),
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
        F.lit(None).cast("string").alias("priority"),
        F.col("l_quantity").alias("quantity"),
    )
    return o.unionByName(l)


@query(
    "aggs_children_stats",
    oracle="""
SELECT CAST(floor(l.l_quantity / 10) * 10 AS DOUBLE) AS qty_bucket,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(l.l_quantity), 6) AS avg_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
ORDER BY qty_bucket
""",
)
def aggs_children_stats(spark, sf_dir):
    """`children` bucket agg (ES join field): from 1-URGENT parent
    orders, switch context to their `line` children (one semi-join on
    the join key — the filtered parent side broadcasts), then histogram
    the child quantity with an avg metric.  The join/id columns are the
    documented mapping-hint defaults."""
    df = _pc_frame(spark, sf_dir)
    urgent = df.filter(
        (F.col("join_field.name") == "order") & (F.col("priority") == "1-URGENT")
    )
    out = compile_aggs(
        urgent,
        {"lines": {
            "children": {"type": "line"},
            "aggs": {"qty": {
                "histogram": {"field": "quantity", "interval": 10},
                "aggs": {"avg_qty": {"avg": {"field": "quantity"}}},
            }},
        }},
        base_df=df,
    )
    return out.select(
        F.col("qty").alias("qty_bucket"),
        "doc_count",
        F.round("avg_qty", 6).alias("avg_qty"),
    ).orderBy("qty_bucket")


@query(
    "aggs_parent_terms",
    oracle="""
WITH heavy AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 49
)
SELECT o.o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS doc_count
FROM orders o JOIN heavy h ON o.o_orderkey = h.l_orderkey
GROUP BY 1
ORDER BY doc_count DESC, priority
""",
)
def aggs_parent_terms(spark, sf_dir):
    """`parent` bucket agg: from heavy line children (quantity >= 49)
    back to their parent orders (semi-join dedups multiple heavy lines
    per order, like ES's one-parent-per-ordinal), then terms by
    priority — ES default order (doc_count desc, key asc)."""
    df = _pc_frame(spark, sf_dir)
    heavy = df.filter(
        (F.col("join_field.name") == "line") & (F.col("quantity") >= 49)
    )
    out = compile_aggs(
        heavy,
        {"orders": {
            "parent": {"type": "order"},
            "aggs": {"by_priority": {"terms": {"field": "priority"}}},
        }},
        base_df=df,
    )
    return out.select(
        F.col("by_priority").alias("priority"), "doc_count"
    ).orderBy(F.col("doc_count").desc(), "priority")
