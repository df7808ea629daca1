"""Search-surface corpus: runtime fields (painless-lite scripts),
search_after keyset pagination, and field collapsing — the non-scoring
ES search-body features (runtime_fields.py, search.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import TS_FMT_DUCK, TS_FMT_SPARK, tbl
from elasticsearch_hadoop_spark.runtime_fields import apply_runtime_mappings
from elasticsearch_hadoop_spark.search import collapse, search_after


@query(
    "runtime_fields_script",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * (1 - l_discount) * 1.19), 2) AS taxed_revenue,
       CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def runtime_fields_script(spark, sf_dir):
    """ES runtime_mappings: two painless-lite scripts (arithmetic emit +
    ternary) compile to codegen Columns and aggregate like any physical
    column — computed fields without reindexing, zero Python in the path."""
    li = tbl(spark, sf_dir, "lineitem")
    enriched = apply_runtime_mappings(
        li,
        {
            "taxed_net": {
                "type": "double",
                "script": {
                    "source": "emit(doc['l_extendedprice'].value"
                    " * (1 - doc['l_discount'].value) * 1.19)"
                },
            },
            "is_bulk": {
                "type": "long",
                "script": "emit(doc['l_quantity'].value >= 25 ? 1 : 0)",
            },
        },
    )
    return (
        enriched.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("taxed_net"), 2).alias("taxed_revenue"),
            F.sum("is_bulk").cast("bigint").alias("n_bulk"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "search_after_page",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
FROM orders
WHERE (o_totalprice < 450000.0)
   OR (o_totalprice = 450000.0 AND o_orderkey > 0)
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
)
def search_after_page(spark, sf_dir):
    """search_after keyset pagination: the page strictly after the cursor
    (450000.0, 0) under (o_totalprice desc, o_orderkey asc).  The cursor
    filter is sargable on o_totalprice and the page is a
    TakeOrderedAndProject — deep pagination without OFFSET's
    scan-and-discard."""
    o = tbl(spark, sf_dir, "orders")
    page = search_after(
        o,
        sort=[{"o_totalprice": "desc"}, {"o_orderkey": "asc"}],
        after=(450000.0, 0),
        size=20,
    )
    return page.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority"
    )


@query(
    "search_collapse",
    oracle=f"""
SELECT user_id, event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s, hit_rank
FROM (
  SELECT user_id, event_id, ts,
         CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id ASC
         ) AS INT) AS hit_rank
  FROM events
)
WHERE hit_rank <= 2
ORDER BY user_id, hit_rank
""",
)
def search_collapse(spark, sf_dir):
    """Field collapsing: the 2 most recent events per user (collapse on
    user_id, inner_hits=2, sorted ts desc) — plans as WindowGroupLimit,
    per-partition top-k before the single shuffle on the collapse key."""
    ev = tbl(spark, sf_dir, "events")
    top = collapse(
        ev, "user_id", sort=[{"ts": "desc"}, {"event_id": "asc"}], inner_hits=2
    )
    return top.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
        F.col("hit_rank").cast("int").alias("hit_rank"),
    ).orderBy("user_id", "hit_rank")


@query(
    "search_highlight",
    oracle=r"""
SELECT doc_id,
       md5(regexp_replace(text, '(?i)\b(hash|join)\b', '<em>\1</em>', 'g'))
           AS hl_md5
FROM documents
WHERE regexp_matches(text, '(?i)\b(hash|join)\b')
ORDER BY doc_id
""",
)
def search_highlight(spark, sf_dir):
    """ES highlight (number_of_fragments: 0): every case-insensitive
    word-boundary occurrence of the analyzed query terms wrapped in
    <em> tags, whole field returned, matching documents only
    (search.highlight).  The (?i)+\\b pattern is RE2/Java-portable, so
    the oracle replays the exact replacement; md5 keeps the hashed
    payload small."""
    from elasticsearch_hadoop_spark.search import highlight

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    out = highlight(docs, "text", "Hash JOIN")
    return out.select(
        "doc_id", F.md5("highlight").alias("hl_md5")
    ).orderBy("doc_id")


@query(
    "search_terms_enum",
    oracle="""
SELECT term FROM (
  SELECT DISTINCT source AS term FROM documents WHERE source LIKE 'src1%'
)
ORDER BY term
LIMIT 10
""",
)
def search_terms_enum(spark, sf_dir):
    """ES _terms_enum: sorted distinct field values under a prefix, size
    truncated (search.terms_enum) — the autocomplete endpoint.  The
    src1* prefix matches 11 fixture sources, so the size-10 limit is
    genuinely exercised."""
    from elasticsearch_hadoop_spark.search import terms_enum

    docs = tbl(spark, sf_dir, "documents")
    return terms_enum(docs, "source", prefix="src1", size=10)
