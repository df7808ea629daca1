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


@query(
    "search_suggest_term",
    oracle="""
WITH vocab AS (
  SELECT t.term, CAST(count(*) AS BIGINT) AS freq
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> length(x) > 0)) AS term
    FROM documents
  ) t
  GROUP BY t.term
),
req(input) AS (VALUES ('querry'), ('tabel'), ('streem')),
cand AS (
  SELECT req.input, vocab.term,
         CAST(levenshtein(req.input, vocab.term) AS INT) AS distance, vocab.freq
  FROM vocab, req
  WHERE levenshtein(req.input, vocab.term) BETWEEN 1 AND 2
),
ranked AS (
  SELECT input, term, distance, freq,
         CAST(row_number() OVER (
             PARTITION BY input ORDER BY distance, freq DESC, term
         ) AS INT) AS suggest_rank
  FROM cand
)
SELECT input, term, distance, freq, suggest_rank
FROM ranked WHERE suggest_rank <= 3
ORDER BY input, suggest_rank
""",
)
def search_suggest_term(spark, sf_dir):
    """ES term suggester: spell-correct three misspelled inputs against
    the corpus vocabulary — candidates within Levenshtein distance 2,
    ranked (distance, freq desc, term), top 3 per input.  The vocabulary
    is one explode + hash agg; the inputs broadcast against it; ranking
    is a WindowGroupLimit (search.suggest_terms)."""
    from elasticsearch_hadoop_spark.search import suggest_terms

    docs = tbl(spark, sf_dir, "documents")
    out = suggest_terms(
        docs, "text", ["querry", "tabel", "streem"], max_edits=2, size=3
    )
    return out.select(
        "input",
        "term",
        F.col("distance").cast("int").alias("distance"),
        "freq",
        "suggest_rank",
    ).orderBy("input", "suggest_rank")


@query(
    "search_mget",
    oracle="""
WITH req(req_ord, o_orderkey) AS (VALUES (0, 7), (1, 999999999), (2, 1), (3, 32))
SELECT req.req_ord, req.o_orderkey,
       o.o_orderkey IS NOT NULL AS found,
       o.o_orderstatus,
       round(o.o_totalprice, 2) AS o_totalprice
FROM req LEFT JOIN orders o ON req.o_orderkey = o.o_orderkey
ORDER BY req.req_ord
""",
)
def search_mget(spark, sf_dir):
    """ES _mget: four ids (one deliberately absent) in request order with
    found flags; the id set compiles to a sargable isin that prunes
    parquet row groups before the tiny request-frame join
    (search.mget)."""
    from elasticsearch_hadoop_spark.search import mget

    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    out = mget(o, [7, 999999999, 1, 32], id_col="o_orderkey")
    return out.select(
        "req_ord", "o_orderkey", "found", "o_orderstatus", "o_totalprice"
    ).orderBy("req_ord")


@query(
    "search_msearch",
    oracle=f"""
SELECT * FROM (
  SELECT 0 AS request, event_id, event_type, round(value, 6) AS value
  FROM events WHERE event_type = 'click'
  ORDER BY value DESC, event_id LIMIT 5
)
UNION ALL
SELECT * FROM (
  SELECT 1 AS request, event_id, event_type, round(value, 6) AS value
  FROM events WHERE value >= 4.0 AND value < 4.5
  ORDER BY value DESC, event_id LIMIT 5
)
UNION ALL
SELECT * FROM (
  SELECT 2 AS request, event_id, event_type, round(value, 6) AS value
  FROM events WHERE event_type IN ('view', 'purchase') AND value < 0.5
  ORDER BY value DESC, event_id LIMIT 5
)
ORDER BY request, event_id
""",
)
def search_msearch(spark, sf_dir):
    """ES _msearch: three bodies (term, range, bool/terms+range) over one
    index in one call — per-request pushdown-compiled filters, each with
    its own sort+size (TakeOrderedAndProject), union tagged with the
    request ordinal (search.msearch)."""
    from elasticsearch_hadoop_spark.search import msearch

    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )
    out = msearch(
        ev,
        [
            {
                "query": {"term": {"event_type": "click"}},
                "sort": [{"value": "desc"}, {"event_id": "asc"}],
                "size": 5,
            },
            {
                "query": {"range": {"value": {"gte": 4.0, "lt": 4.5}}},
                "sort": [{"value": "desc"}, {"event_id": "asc"}],
                "size": 5,
            },
            {
                "query": {
                    "bool": {
                        "filter": [
                            {"terms": {"event_type": ["view", "purchase"]}},
                            {"range": {"value": {"lt": 0.5}}},
                        ]
                    }
                },
                "sort": [{"value": "desc"}, {"event_id": "asc"}],
                "size": 5,
            },
        ],
    )
    return out.orderBy("request", "event_id")


@query(
    "search_template_page",
    oracle="""
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice >= 250000.0
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def search_template_page(spark, sf_dir):
    """ES search template: {{#toJson}} list splice, an inline {{var}}
    substitution, and a {{size}}{{^size}}20{{/size}} default render into
    a JSON body that compiles like any hand-written query — templating is
    a text-level concern, the plan underneath is unchanged (sargable
    range + TakeOrderedAndProject page)."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query
    from elasticsearch_hadoop_spark.search import render_search_template

    o = tbl(spark, sf_dir, "orders")
    template = (
        '{"query": {"bool": {"must": ['
        '{"terms": {"o_orderpriority": {{#toJson}}prios{{/toJson}}}},'
        '{"range": {"o_totalprice": {"gte": "{{min_price}}"}}}'
        ']}}, "size": "{{size}}{{^size}}20{{/size}}"}'
    )
    body = render_search_template(
        template, {"prios": ["1-URGENT", "2-HIGH"], "min_price": 250000.0}
    )
    size = int(body["size"])
    return (
        o.filter(compile_query(body["query"]))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(size)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
