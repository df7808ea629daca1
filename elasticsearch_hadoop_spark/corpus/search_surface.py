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


@query(
    "search_suggest_completion",
    oracle="""
WITH hits AS (
  SELECT p_name AS text, CAST(count(*) AS BIGINT) AS weight,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM part
  WHERE lower(p_name) LIKE 's%'
  GROUP BY p_name
),
fuzzy AS (
  SELECT p_name AS text, CAST(count(*) AS BIGINT) AS doc_count
  FROM part
  WHERE levenshtein(substr(lower(p_name), 1, 5), 'smoll') <= 1
  GROUP BY p_name
),
ranked AS (
  SELECT text, weight, doc_count,
         CAST(row_number() OVER (ORDER BY weight DESC, text) AS INT)
           AS suggest_rank
  FROM hits
)
SELECT r.text, r.weight, r.doc_count, r.suggest_rank,
       f.text IS NOT NULL AS fuzzy_smoll
FROM ranked r LEFT JOIN fuzzy f ON r.text = f.text
WHERE r.suggest_rank <= 5
ORDER BY r.suggest_rank
""",
)
def search_suggest_completion(spark, sf_dir):
    """ES completion suggester: part names starting with "s", ranked by
    doc-frequency weight then text, top 5 (exact-prefix arm is a sargable
    startswith + one hash agg + TakeOrderedAndProject), with a fuzzy-arm
    boolean ("smoll"~1 inside the 5-char prefix) joined on."""
    from elasticsearch_hadoop_spark.search import suggest_completion

    part = tbl(spark, sf_dir, "part")
    out = suggest_completion(part, "p_name", "s", size=5)
    fz = (
        suggest_completion(part, "p_name", "smoll", size=1000, fuzzy=True,
                           max_edits=1)
        .select(F.col("text").alias("__ft"))
    )
    return (
        out.join(fz, out["text"] == fz["__ft"], "left")
        .select(
            "text", "weight", "doc_count", "suggest_rank",
            F.col("__ft").isNotNull().alias("fuzzy_smoll"),
        )
        .orderBy("suggest_rank")
    )


@query(
    "search_suggest_phrase",
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
tot AS (SELECT sum(freq) AS total FROM vocab),
req(pos, token) AS (VALUES (0, 'mrege'), (1, 'sort'), (2, 'windw')),
cand AS (
  SELECT req.pos, req.token, vocab.term, vocab.freq,
         levenshtein(req.token, vocab.term) AS distance
  FROM vocab, req
  WHERE levenshtein(req.token, vocab.term) <= 2
),
best AS (
  SELECT pos, token, term, freq
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY pos ORDER BY distance, freq DESC, term
    ) AS rn FROM cand
  ) WHERE rn = 1
),
chosen AS (
  SELECT req.pos, req.token,
         coalesce(best.term, req.token) AS chosen,
         coalesce(CAST(best.freq AS DOUBLE), 0.5) AS p_count
  FROM req LEFT JOIN best ON req.pos = best.pos AND req.token = best.token
)
SELECT string_agg(chosen, ' ' ORDER BY pos) AS suggestion,
       round(sum(log10(p_count / (SELECT total FROM tot))), 6) AS score,
       CAST(sum(CASE WHEN chosen <> token THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrections
FROM chosen
""",
)
def search_suggest_phrase(spark, sf_dir):
    """ES phrase suggester (deterministic unigram subset): per-token best
    candidate within 2 edits (distance, freq desc, term) over ONE
    vocabulary aggregation, reassembled by position with a unigram
    log10-probability score and OOV 0.5-count smoothing."""
    from elasticsearch_hadoop_spark.search import suggest_phrase

    docs = tbl(spark, sf_dir, "documents")
    out = suggest_phrase(docs, "text", "mrege sort windw", max_edits=2)
    return out.select(
        "suggestion",
        F.round("score", 6).alias("score"),
        F.col("n_corrections").cast("long").alias("n_corrections"),
    )


@query(
    "search_scroll_sliced",
    oracle="""
WITH sliced AS (
  SELECT CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) % 4 AS slice_id,
         o_totalprice
  FROM orders
)
SELECT CAST(slice_id AS INT) AS slice_id,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(o_totalprice), 2) AS total
FROM sliced
GROUP BY slice_id
ORDER BY slice_id
""",
)
def search_scroll_sliced(spark, sf_dir):
    """ES sliced scroll: the 4 disjoint hash slices the reference uses
    for partition-parallel scans (one sliced scroll per Spark partition,
    A1) — each slice is a pure md5-hash Column predicate; the per-slice
    counts/sums prove disjoint full coverage."""
    from elasticsearch_hadoop_spark.search import scroll_slice

    o = tbl(spark, sf_dir, "orders")
    parts = [
        o.filter(scroll_slice(o, s, 4, "o_orderkey")).select(
            F.lit(s).alias("slice_id"), "o_totalprice"
        )
        for s in range(4)
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return (
        un.groupBy("slice_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("slice_id")
    )


@query(
    "search_analyze_api",
    oracle="""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 20
),
toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> length(t) > 0)) AS token,
         generate_subscripts(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             t -> length(t) > 0), 1) - 1 AS position
  FROM docs
)
SELECT doc_id, CAST(position AS INT) AS position, token
FROM toks
WHERE position < 5
ORDER BY doc_id, position
""",
)
def search_analyze_api(spark, sf_dir):
    """ES `_analyze` endpoint: token + stream position per doc through
    the standard analyzer (posexplode over the analyzed array — one
    narrow projection, the response shape of POST /_analyze)."""
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select(
        "doc_id", "text"
    )
    out = analyze_api(docs, "text", "standard")
    return (
        out.filter(F.col("position") < 5)
        .select("doc_id", "position", "token")
        .orderBy("doc_id", "position")
    )


@query(
    "search_rank_eval",
    oracle="""
WITH an AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
reqs(request, t1, t2) AS (VALUES ('q_merge', 'merge', 'window'),
                                 ('q_hash', 'hash', 'join')),
scored AS (
  SELECT r.request, a.doc_id,
         (CASE WHEN list_contains(a.toks, r.t1) THEN 1 ELSE 0 END
          + CASE WHEN list_contains(a.toks, r.t2) THEN 1 ELSE 0 END) AS overlap
  FROM an a CROSS JOIN reqs r
),
ranked AS (
  SELECT request, doc_id, overlap,
         row_number() OVER (PARTITION BY request
                            ORDER BY overlap DESC, doc_id) AS rnk
  FROM scored QUALIFY rnk <= 10
),
ratings AS (
  SELECT request, doc_id, overlap AS rating
  FROM scored WHERE doc_id < 100 AND overlap > 0
),
joined AS (
  SELECT rk.request, rk.rnk,
         coalesce(rt.rating, 0) AS r
  FROM ranked rk LEFT JOIN ratings rt
    ON rk.request = rt.request AND rk.doc_id = rt.doc_id
),
per_req AS (
  SELECT request,
         sum(CASE WHEN r >= 1 THEN 1 ELSE 0 END)
           / CAST(count(*) AS DOUBLE) AS precision_k,
         sum(CASE WHEN r >= 1 THEN 1 ELSE 0 END) AS n_rel_ret,
         coalesce(1.0 / min(CASE WHEN r >= 1 THEN rnk END), 0.0) AS mrr,
         sum((pow(2.0, r) - 1) / log2(rnk + 1.0)) AS dcg
  FROM joined GROUP BY request
),
ideal AS (
  SELECT request,
         sum((pow(2.0, rating) - 1) / log2(irank + 1.0)) AS idcg
  FROM (
    SELECT request, rating,
           row_number() OVER (PARTITION BY request
                              ORDER BY rating DESC, doc_id) AS irank
    FROM ratings QUALIFY irank <= 10
  ) GROUP BY request
),
tot AS (
  SELECT request, CAST(count(*) AS BIGINT) AS n_rel
  FROM ratings WHERE rating >= 1 GROUP BY request
)
SELECT p.request,
       round(p.precision_k, 6) AS precision_k,
       round(CASE WHEN t.n_rel > 0 THEN p.n_rel_ret / CAST(t.n_rel AS DOUBLE)
                  ELSE 0.0 END, 6) AS recall_k,
       round(p.mrr, 6) AS mrr,
       round(p.dcg, 6) AS dcg,
       round(CASE WHEN i.idcg > 0 THEN p.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg
FROM per_req p
LEFT JOIN ideal i ON p.request = i.request
LEFT JOIN tot t ON p.request = t.request
ORDER BY p.request
""",
)
def search_rank_eval(spark, sf_dir):
    """ES `_rank_eval`: two requests ranked by query-term overlap, judged
    by a doc_id<100 pool with graded (0..2) relevance — precision@10,
    recall@10, MRR, DCG and NDCG per request (search.rank_eval; the
    metric math never rescans the corpus)."""
    from elasticsearch_hadoop_spark.functions.text import standard_analyze
    from elasticsearch_hadoop_spark.search import rank_eval
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", standard_analyze(F.col("text")).alias("toks")
    )
    reqs = [("q_merge", "merge", "window"), ("q_hash", "hash", "join")]
    req_df = spark.createDataFrame(reqs, "request string, t1 string, t2 string")
    scored = docs.crossJoin(F.broadcast(req_df)).select(
        "request",
        "doc_id",
        (
            F.array_contains("toks", F.col("t1")).cast("int")
            + F.array_contains("toks", F.col("t2")).cast("int")
        ).alias("overlap"),
    )
    w = Window.partitionBy("request").orderBy(
        F.col("overlap").desc(), F.col("doc_id").asc()
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("request", F.col("doc_id").alias("_id"), "rank")
    )
    ratings = scored.filter(
        (F.col("doc_id") < 100) & (F.col("overlap") > 0)
    ).select("request", F.col("doc_id").alias("_id"), F.col("overlap").alias("rating"))
    out = rank_eval(ranked, ratings, k=10)
    return out.select(
        "request",
        F.round("precision_k", 6).alias("precision_k"),
        F.round("recall_k", 6).alias("recall_k"),
        F.round("mrr", 6).alias("mrr"),
        F.round("dcg", 6).alias("dcg"),
        F.round("ndcg", 6).alias("ndcg"),
    ).orderBy("request")


@query(
    "search_sparse_vector",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         len(list_filter(toks, t -> t = 'merge')) * 2.0::DOUBLE
         + len(list_filter(toks, t -> t = 'sort')) * 1.0::DOUBLE
         + len(list_filter(toks, t -> t = 'window')) * 1.5::DOUBLE AS score
  FROM an
)
SELECT doc_id, lang, round(score, 6) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 20
""",
)
def search_sparse_vector(spark, sf_dir):
    """ES `sparse_vector` (ELSER-style learned sparse retrieval): each
    doc carries a map<string,double> token-weight field (here its term
    frequencies); the query expansion {merge:2, sort:1, window:1.5}
    scores docs by the sparse dot product — a fixed unrolled codegen sum
    over the query's tokens, predicate = any-token-overlap
    (query_dsl sparse_vector + functions.similarity.sparse_dot)."""
    from elasticsearch_hadoop_spark.functions.similarity import sparse_dot
    from elasticsearch_hadoop_spark.functions.text import (
        let_bind,
        standard_analyze,
    )
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    docs = tbl(spark, sf_dir, "documents")

    # let-bind the analyzed array: the per-distinct-token frequency scan
    # below reads the lambda variable, not a re-inlined regex split
    def _tf_map(toks):
        return F.map_from_entries(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.struct(
                    t.alias("key"),
                    F.size(F.filter(toks, lambda x: x == t))
                    .cast("double")
                    .alias("value"),
                ),
            )
        )

    tw = let_bind(standard_analyze(F.col("text")), _tf_map)
    qw = {"merge": 2.0, "sort": 1.0, "window": 1.5}
    with_tw = docs.select("doc_id", "lang", tw.alias("tw"))
    pred = compile_query(
        {"sparse_vector": {"field": "tw", "query_vector": qw}}
    )
    out = (
        with_tw.filter(pred)
        .select(
            "doc_id",
            "lang",
            F.round(sparse_dot(F.col("tw"), qw), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    return out


@query(
    "search_linear_fuse",
    oracle="""
WITH sa AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0))
           AS s,
         row_number() OVER (ORDER BY list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC,
             vec_id) AS rnk
  FROM embeddings QUALIFY rnk <= 20
),
sb AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 1))
           AS s,
         row_number() OVER (ORDER BY list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 1)) DESC,
             vec_id) AS rnk
  FROM embeddings QUALIFY rnk <= 20
),
na AS (
  SELECT vec_id,
         CASE WHEN max(s) OVER () > min(s) OVER ()
              THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
              ELSE 1.0 END * 1.0 AS c
  FROM sa
),
nb AS (
  SELECT vec_id,
         CASE WHEN max(s) OVER () > min(s) OVER ()
              THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
              ELSE 1.0 END * 2.0 AS c
  FROM sb
),
un AS (SELECT * FROM na UNION ALL SELECT * FROM nb),
fused AS (
  SELECT vec_id, round(sum(c), 6) AS linear_score,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM un GROUP BY vec_id
)
SELECT vec_id, linear_score, n_lists,
       CAST(row_number() OVER (ORDER BY linear_score DESC, vec_id) AS INT)
         AS fused_rank
FROM fused QUALIFY fused_rank <= 10
ORDER BY fused_rank
""",
)
def search_linear_fuse(spark, sf_dir):
    """ES linear retriever: weighted (1x, 2x) sum of min-max-normalized
    scores across two top-20 cosine rankings — per-list normalization is
    one window over the tiny ranked frame; contributions union, one
    hash agg, TakeOrderedAndProject (search.linear_fuse)."""
    from pyspark.sql import Window

    from elasticsearch_hadoop_spark.functions.similarity import cosine_similarity
    from elasticsearch_hadoop_spark.search import linear_fuse

    e = tbl(spark, sf_dir, "embeddings")

    def ranked(vid):
        row = e.filter(F.col("vec_id") == vid).select("embedding").first()
        q = F.array(*[F.lit(float(x)) for x in row[0]]).cast("array<double>")
        cos = cosine_similarity(F.col("embedding").cast("array<double>"), q)
        w = Window.orderBy(F.col("_score").desc(), F.col("vec_id").asc())
        return (
            e.select("vec_id", cos.alias("_score"))
            .withColumn("__rnk", F.row_number().over(w))
            .filter(F.col("__rnk") <= 20)
            .drop("__rnk")
        )

    out = linear_fuse([ranked(0), ranked(1)], "vec_id", weights=[1.0, 2.0])
    return out.select(
        "vec_id",
        F.round("linear_score", 6).alias("linear_score"),
        "n_lists",
        "fused_rank",
    ).orderBy("fused_rank")


@query(
    "esql_stats_by",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS total,
       round(quantile_cont(value, 0.9), 6) AS p90,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM events
WHERE value > 1.0
GROUP BY event_type
ORDER BY total DESC, event_type
""",
)
def esql_stats_by(spark, sf_dir):
    """ES|QL: WHERE | STATS ... BY | SORT compiled to the DataFrame
    algebra (esql.py) — the filter pushes to the scan, STATS is one
    partial+final hash aggregation, exactly the plan the same SQL gets
    (there is no second engine; Catalyst is ES|QL's executor here)."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events")
    out = esql(
        """
        FROM events
        | WHERE value > 1.0
        | STATS n = COUNT(*), total = SUM(value), p90 = PERCENTILE(value, 90),
                users = COUNT_DISTINCT(user_id) BY event_type
        | SORT total DESC, event_type
        """,
        tables={"events": ev},
    )
    return out.select(
        "event_type",
        "n",
        F.round("total", 6).alias("total"),
        F.round("p90", 6).alias("p90"),
        "users",
    )


@query(
    "esql_eval_pipeline",
    oracle="""
SELECT doc_id,
       upper(lang) AS lang_up,
       round(n_chars / 1024.0::DOUBLE, 6) AS kb,
       CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END AS bucket
FROM documents
WHERE lang <> 'de'
ORDER BY n_chars DESC, doc_id
LIMIT 25
""",
)
def esql_eval_pipeline(spark, sf_dir):
    """ES|QL: EVAL chains (later names see earlier ones), CASE
    expressions, KEEP projection, SORT+LIMIT fusing to
    TakeOrderedAndProject."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents")
    out = esql(
        """
        FROM documents
        | WHERE lang != "de"
        | EVAL lang_up = TO_UPPER(lang), kb = n_chars / 1024.0,
               bucket = CASE WHEN n_chars >= 200 THEN "long" ELSE "short" END
        | KEEP doc_id, lang_up, kb, bucket, n_chars
        | SORT n_chars DESC, doc_id
        | LIMIT 25
        """,
        tables={"documents": docs},
    )
    return out.select(
        "doc_id", "lang_up", F.round("kb", 6).alias("kb"), "bucket"
    )


@query(
    "search_termvectors",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> length(x) > 0)) AS term,
         generate_subscripts(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0), 1) - 1 AS position
  FROM documents WHERE doc_id < 10
)
SELECT doc_id, term,
       CAST(count(*) AS BIGINT) AS term_freq,
       array_to_string(list_sort(list(position)), ',') AS positions
FROM toks
GROUP BY doc_id, term
ORDER BY doc_id, term
""",
)
def search_termvectors(spark, sf_dir):
    """ES `_termvectors`: per-doc term statistics (term_freq + sorted
    position list) over the analyzed field — one posexplode + a hash
    aggregation on (doc, term), the GET _termvectors response shape."""
    from elasticsearch_hadoop_spark.search import termvectors

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    out = termvectors(docs, "text", "doc_id")
    return out.select(
        "doc_id",
        "term",
        "term_freq",
        F.array_join(F.col("positions").cast("array<string>"), ",").alias(
            "positions"
        ),
    ).orderBy("doc_id", "term")


@query(
    "esql_bucket_filtered_stats",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         AS purchases,
       round(sum(CASE WHEN value > 5.0 THEN value END), 6) AS big_total
FROM events
GROUP BY 1
ORDER BY day
""",
)
def esql_bucket_filtered_stats(spark, sf_dir):
    """ES|QL BUCKET() date grouping + per-aggregate WHERE filters (8.16):
    daily buckets with a filtered purchase count and a filtered sum —
    every filtered aggregate compiles to agg(when(cond, x)) inside the
    SAME single partial+final hash aggregation (no extra scans)."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events")
    out = esql(
        """
        FROM events
        | STATS n = COUNT(*),
                purchases = COUNT(*) WHERE event_type == "purchase",
                big_total = SUM(value) WHERE value > 5.0
          BY day = BUCKET(ts, "1 day")
        | SORT day
        """,
        tables={"events": ev},
    )
    return out.select(
        F.date_format("day", TS_FMT_SPARK).alias("day"),
        "n",
        "purchases",
        F.round("big_total", 6).alias("big_total"),
    ).orderBy("day")


@query(
    "esql_grok_dissect",
    oracle="""
WITH lines AS (
  SELECT event_id,
         concat(upper(event_type), ' /api/u',
                CAST(user_id AS VARCHAR), ' ',
                CAST(event_id % 5 AS VARCHAR), ' ',
                CAST(round(value, 2) AS VARCHAR)) AS line
  FROM events
),
parsed AS (
  SELECT event_id,
         regexp_extract(line, '(\\w+) (\\S+) ([+-]?\\d+) ([+-]?\\d+(?:\\.\\d+)?)', 1) AS verb,
         regexp_extract(line, '(\\w+) (\\S+) ([+-]?\\d+) ([+-]?\\d+(?:\\.\\d+)?)', 2) AS path,
         CAST(regexp_extract(line, '(\\w+) (\\S+) ([+-]?\\d+) ([+-]?\\d+(?:\\.\\d+)?)', 3) AS INT) AS code,
         CAST(regexp_extract(line, '(\\w+) (\\S+) ([+-]?\\d+) ([+-]?\\d+(?:\\.\\d+)?)', 4) AS DOUBLE) AS dur
  FROM lines
)
SELECT verb, CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN code >= 3 THEN 1 END) AS BIGINT) AS errors,
       round(sum(dur), 6) AS total_dur
FROM parsed
GROUP BY verb
ORDER BY verb
""",
)
def esql_grok_dissect(spark, sf_dir):
    """ES|QL GROK end-to-end: synthesized access-log lines parsed with
    %{WORD}/%{NOTSPACE}/%{INT:...:int}/%{NUMBER:...:double} (one
    regexp_extract chain, typed casts), then filtered-stats by verb —
    the log-wrangling pipeline ES|QL exists for, planned by Catalyst."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.upper("event_type"),
            F.lit(" /api/u"),
            F.col("user_id").cast("string"),
            F.lit(" "),
            (F.col("event_id") % 5).cast("string"),
            F.lit(" "),
            F.round("value", 2).cast("string"),
        ).alias("line"),
    )
    out = esql(
        """
        FROM logs
        | GROK line "%{WORD:verb} %{NOTSPACE:path} %{INT:code:int} %{NUMBER:dur:double}"
        | STATS n = COUNT(*),
                errors = COUNT(*) WHERE code >= 3,
                total_dur = SUM(dur)
          BY verb
        | SORT verb
        """,
        tables={"logs": ev},
    )
    return out.select(
        "verb", "n", "errors", F.round("total_dur", 6).alias("total_dur")
    ).orderBy("verb")


@query(
    "search_scored_page",
    oracle="""
WITH scored AS (
  SELECT doc_id, source,
         log10(1 + n_chars * 0.001::DOUBLE)
         + CASE WHEN source LIKE 'src1%' THEN 2.0::DOUBLE ELSE 0.0::DOUBLE END
         + (n_chars % 7) * 0.1::DOUBLE AS s
  FROM documents
  WHERE lang = 'en'
)
SELECT doc_id, source, round(s, 6) AS score
FROM scored
WHERE s >= 0.5::DOUBLE
ORDER BY s DESC, doc_id
LIMIT 12 OFFSET 3
""",
)
def search_scored_page(spark, sf_dir):
    """`_search` with a MATERIALIZED `_score` column (the engine's
    analogue of the reference's `_metadata._score` — ScrollReader.java†
    attaches the hit score to row metadata): a `function_score` query
    combining the deterministic trio (field_value_factor log1p,
    filter-gated weight, painless-lite script_score), top-level
    `min_score`, bare `"_score"` sort (DESC by ES default, id tiebreak
    auto-appended), and a from+size page.  Scoring is one codegen
    projection; the page plans as TakeOrderedAndProject of from+size
    rows, row_number only over that tiny set."""
    from elasticsearch_hadoop_spark.search import search

    docs = tbl(spark, sf_dir, "documents")
    body = {
        "query": {
            "function_score": {
                "query": {"term": {"lang": "en"}},
                "functions": [
                    {
                        "field_value_factor": {
                            "field": "n_chars",
                            "factor": 0.001,
                            "modifier": "log1p",
                        }
                    },
                    {"weight": 2.0, "filter": {"prefix": {"source": "src1"}}},
                    {"script_score": {"script": "emit(doc['n_chars'].value % 7 * 0.1)"}},
                ],
                "score_mode": "sum",
            }
        },
        "min_score": 0.5,
        "sort": ["_score"],
        "size": 12,
        "from": 3,
    }
    hits = search(docs, body, id_col="doc_id")
    return hits.select("doc_id", "source", F.round("_score", 6).alias("score"))


@query(
    "runtime_fields_string_methods",
    oracle="""
WITH rt AS (
  SELECT CAST(substr(source, 4) AS BIGINT) AS src_num,
         CASE WHEN contains(lower(text), 'spark window') THEN 1 ELSE 0 END AS sparky
  FROM documents
  WHERE lang = 'en'
)
SELECT src_num, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sparky) AS BIGINT) AS n_sparky
FROM rt
GROUP BY src_num
ORDER BY src_num
""",
)
def runtime_fields_string_methods(spark, sf_dir):
    """Runtime fields scripted with the round-7 painless String methods:
    `substring` (0-based, translated exactly to SQL's 1-based substr)
    parses the numeric tail of `source`, and a chained
    `toLowerCase().contains(...)` flags phrase hits — both one codegen
    projection riding the scan (runtime fields never materialize), then
    an aggregate per parsed source number."""
    from elasticsearch_hadoop_spark.runtime_fields import apply_runtime_mappings

    docs = tbl(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    rt = apply_runtime_mappings(docs, {
        "src_num": {"type": "long",
                    "script": "emit(doc['source'].value.substring(3))"},
        "sparky": {"type": "boolean",
                   "script": {"source":
                       "emit(doc['text'].value.toLowerCase().contains('spark window'))"}},
    })
    return (
        rt.groupBy("src_num")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("sparky").cast("long")).alias("n_sparky"),
        )
        .orderBy("src_num")
    )


@query(
    "esql_fulltext_where",
    oracle="""
WITH an AS (
  SELECT doc_id, lang, n_chars,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
)
SELECT doc_id, lang
FROM an
WHERE (list_contains(toks, 'vector') OR list_contains(toks, 'merge'))
  AND (lang = 'en' OR n_chars < 150)
ORDER BY doc_id
""",
)
def esql_fulltext_where(spark, sf_dir):
    """ES|QL full-text WHERE (8.17+): `MATCH(text, "vector merge")` —
    compiled through the query-DSL's exact token-overlap match subset —
    AND a QSTR query-string leaf, combined with ordinary expression
    predicates by the boolean splitter.  Everything stays one codegen
    predicate on the scan."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents")
    out = esql(
        'FROM d | WHERE MATCH(text, "vector merge") AND '
        '(QSTR("lang:en") OR n_chars < 150) | SORT doc_id | KEEP doc_id, lang',
        tables={"d": docs},
    )
    return out
