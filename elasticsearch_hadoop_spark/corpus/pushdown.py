"""Pushdown-predicate corpus: the reference's §2.B filter algebra, both as
native Column predicates and through the ES query-DSL compiler
(elasticsearch_hadoop_spark/query_dsl.py — parity with
DefaultSource.scala#translateFilter†).

Every predicate here is Catalyst-pushable: `.explain()` shows them in
PushedFilters on the parquet scan (asserted in tests/test_plans.py) —
the Spark-native equivalent of the reference shipping query DSL to ES.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.query_dsl import compile_query


@query(
    "pushdown_predicates",
    oracle="""
SELECT o_orderkey
FROM orders
WHERE o_orderstatus = 'O'
  AND o_totalprice > 100000 AND o_totalprice <= 400000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_custkey IS NOT NULL
  AND NOT (o_orderkey % 10 = 0)
ORDER BY o_orderkey
""",
)
def pushdown_predicates(spark, sf_dir):
    """§2.B algebra as native Columns: EqualTo, range, In, IsNotNull, Not,
    And — all land in the parquet scan's PushedFilters."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_totalprice") > 100000)
            & (F.col("o_totalprice") <= 400000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_custkey").isNotNull()
            & ~((F.col("o_orderkey") % 10) == 0)
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@query(
    "pushdown_string_predicates",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE starts_with(p_brand, 'Brand#1')
  AND p_type LIKE '%AND%'
  AND p_name LIKE '%t'
  AND regexp_matches(p_name, '^[a-z]+ ')
ORDER BY p_partkey
""",
)
def pushdown_string_predicates(spark, sf_dir):
    """StringStartsWith / Contains / EndsWith / rlike (§2.B string rows).
    Constants chosen to match real fixture rows at every sf (contains
    'AND' hits STANDARD; names end in 't' for ~10% of parts) — a 0-row
    result would make the oracle hash-match vacuous."""
    p = tbl(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_brand").startswith("Brand#1")
            & F.col("p_type").contains("AND")
            & F.col("p_name").endswith("t")
            & F.col("p_name").rlike("^[a-z]+ ")
        )
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@query(
    "query_dsl_bool",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_orderstatus = 'F'
  AND o_totalprice >= 50000 AND o_totalprice < 300000
  AND (o_orderpriority = '5-LOW' OR o_orderpriority = '4-NOT SPECIFIED')
  AND NOT o_custkey IN (1, 2, 3)
ORDER BY o_orderkey
""",
)
def query_dsl_bool(spark, sf_dir):
    """ES bool query (must/should/must_not + term/terms/range) compiled to
    a Column predicate by query_dsl.compile_query — the §2.B planner run in
    reverse (engine-side instead of ES-side)."""
    dsl = {
        "bool": {
            "must": [
                {"term": {"o_orderstatus": "F"}},
                {"range": {"o_totalprice": {"gte": 50000, "lt": 300000}}},
            ],
            "should": [
                {"term": {"o_orderpriority": "5-LOW"}},
                {"term": {"o_orderpriority": "4-NOT SPECIFIED"}},
            ],
            "minimum_should_match": 1,
            "must_not": [{"terms": {"o_custkey": [1, 2, 3]}}],
        }
    }
    o = tbl(spark, sf_dir, "orders")
    return (
        o.filter(compile_query(dsl))
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "query_dsl_match",
    oracle="""
WITH analyzed AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
)
SELECT doc_id, lang
FROM analyzed
WHERE list_has_any(toks, ['merge', 'window'])
ORDER BY doc_id
""",
)
def query_dsl_match(spark, sf_dir):
    """ES `match` (OR operator): tokenized overlap — the documented exact
    subset of analyzed match (SURVEY.md §2.C semantic-gap note)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.filter(compile_query({"match": {"text": "merge window"}}))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "query_dsl_match_and_phrase",
    oracle="""
WITH analyzed AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
)
SELECT doc_id,
       (list_contains(toks, 'merge') AND list_contains(toks, 'sort')) AS match_and,
       (strpos(concat(' ', array_to_string(toks, ' '), ' '), ' fast key ') > 0) AS has_phrase
FROM analyzed
ORDER BY doc_id
""",
)
def query_dsl_match_and_phrase(spark, sf_dir):
    """match operator=and (token containment) + match_phrase (analyzed
    adjacency) as boolean columns."""
    d = tbl(spark, sf_dir, "documents")
    match_and = compile_query({"match": {"text": {"query": "merge sort", "operator": "and"}}})
    phrase = compile_query({"match_phrase": {"text": "fast key"}})
    return d.select(
        "doc_id", match_and.alias("match_and"), phrase.alias("has_phrase")
    ).orderBy("doc_id")


@query(
    "query_dsl_wildcard_prefix",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_mktsegment LIKE 'BUIL%'
   OR regexp_matches(c_name, '^Customer#0.*1.2$')
ORDER BY c_custkey
""",
)
def query_dsl_wildcard_prefix(spark, sf_dir):
    """prefix + wildcard clauses (compiled to startswith / anchored rlike)."""
    d = tbl(spark, sf_dir, "customer")
    dsl = {
        "bool": {
            "should": [
                {"prefix": {"c_mktsegment": "BUIL"}},
                {"wildcard": {"c_name": "Customer#0*1?2"}},
            ]
        }
    }
    return d.filter(compile_query(dsl)).select("c_custkey", "c_mktsegment").orderBy("c_custkey")


@query(
    "query_dsl_uri",
    oracle="""
SELECT n_nationkey, n_name
FROM nation
WHERE n_name = 'NATION_3' OR n_name = 'NATION_17'
ORDER BY n_nationkey
""",
)
def query_dsl_uri(spark, sf_dir):
    """`?q=field:value` URI-lite subset (reference: raw es.query URI form,
    SURVEY.md §2.B last row).  Values exist in the fixture (NATION_0..24)
    so the check matches real rows, not the empty set."""
    n = tbl(spark, sf_dir, "nation")
    return (
        n.filter(compile_query("n_name:NATION_3 OR n_name:NATION_17"))
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@query(
    "query_dsl_fuzzy",
    oracle="""
SELECT p_partkey, p_brand
FROM part
WHERE levenshtein(p_brand, 'Brand#1') <= 1
ORDER BY p_partkey
""",
)
def query_dsl_fuzzy(spark, sf_dir):
    """`fuzzy` (edit-distance, ES AUTO fuzziness rule) wrapped in
    `constant_score` (scoring wrapper -> inner filter verbatim; `_score`
    is out of scope).  levenshtein is JVM-native — whole-stage codegen."""
    p = tbl(spark, sf_dir, "part")
    dsl = {
        "constant_score": {
            "filter": {"fuzzy": {"p_brand": {"value": "Brand#1", "fuzziness": 1}}}
        }
    }
    return p.filter(compile_query(dsl)).select("p_partkey", "p_brand").orderBy("p_partkey")


@query(
    "query_dsl_nested",
    oracle="""
WITH docs AS (
  SELECT l_orderkey,
         list(struct_pack(flag := l_returnflag, qty := l_quantity)) AS items
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, CAST(len(items) AS INT) AS n_items
FROM docs
WHERE len(list_filter(items, x -> x.flag = 'R' AND x.qty >= 45)) > 0
ORDER BY l_orderkey
""",
)
def query_dsl_nested(spark, sf_dir):
    """`nested` clause over an array-of-struct column (built here by
    rolling lineitem up into per-order item docs — the ES nested-doc
    shape, §1.2 `nested` -> ArrayType(StructType)).  Both inner predicates
    must hit the SAME element; a flattened translation would over-match.
    Compiles to higher-order exists — element-wise in codegen, no
    explode."""
    li = tbl(spark, sf_dir, "lineitem")
    docs = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("qty"))
        ).alias("items")
    )
    dsl = {
        "nested": {
            "path": "items",
            "query": {
                "bool": {
                    "must": [
                        {"term": {"items.flag": "R"}},
                        {"range": {"items.qty": {"gte": 45}}},
                    ]
                }
            },
        }
    }
    return (
        docs.filter(compile_query(dsl))
        .select("l_orderkey", F.size("items").alias("n_items"))
        .orderBy("l_orderkey")
    )


@query(
    "query_dsl_more_like_this",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> length(x) > 0)) AS toks
  FROM documents
)
SELECT doc_id, lang, CAST(len(list_intersect(toks, ['hash', 'join', 'query'])) AS INT)
           AS n_shared
FROM an
WHERE len(list_intersect(toks, ['hash', 'join', 'query'])) >= 2
ORDER BY doc_id
""",
)
def query_dsl_more_like_this(spark, sf_dir):
    """`more_like_this` (deterministic scoreless subset): query terms =
    like-text tokens with tf >= min_term_freq (hash/join/query here,
    each twice), match = sharing >= minimum_should_match of them.  Term
    selection is compile-time; the predicate is one array_intersect size
    test over the analyzed field — codegen, no joins."""
    docs = tbl(spark, sf_dir, "documents")
    dsl = {
        "more_like_this": {
            "fields": ["text"],
            "like": "hash join hash join query query scan",
            "min_term_freq": 2,
            "minimum_should_match": 2,
        }
    }
    from elasticsearch_hadoop_spark.functions.text import analyze_tokens

    shared = F.size(
        F.array_intersect(
            F.array_distinct(analyze_tokens(F.col("text"))),
            F.array(F.lit("hash"), F.lit("join"), F.lit("query")),
        )
    )
    return (
        docs.filter(compile_query(dsl))
        .select("doc_id", "lang", shared.alias("n_shared"))
        .orderBy("doc_id")
    )


@query(
    "query_dsl_function_score",
    oracle="""
WITH scored AS (
  SELECT o_orderkey,
         log10(o_totalprice * 0.001 + 1)
         + CASE WHEN o_orderpriority = '1-URGENT' THEN 5.0 ELSE 0.0 END AS s
  FROM orders
)
SELECT o_orderkey, round(s, 6) AS score
FROM scored
WHERE s >= 7.0
ORDER BY s DESC, o_orderkey
LIMIT 15
""",
)
def query_dsl_function_score(spark, sf_dir):
    """`function_score` with deterministic functions: field_value_factor
    (log1p modifier — base-10 per ES) summed with a filter-gated weight,
    min_score gate, top-15 by (score desc, key).  Scoring is one codegen
    projection over the scan; the ranked page is a
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    from elasticsearch_hadoop_spark.query_dsl import function_score

    o = tbl(spark, sf_dir, "orders")
    body = {
        "query": {"match_all": {}},
        "functions": [
            {
                "field_value_factor": {
                    "field": "o_totalprice",
                    "factor": 0.001,
                    "modifier": "log1p",
                }
            },
            {"weight": 5.0, "filter": {"term": {"o_orderpriority": "1-URGENT"}}},
        ],
        "score_mode": "sum",
        "min_score": 7.0,
    }
    scored = function_score(o, body)
    return (
        scored.orderBy(F.col("score").desc(), "o_orderkey")
        .limit(15)
        .select("o_orderkey", F.round("score", 6).alias("score"))
    )


@query(
    "query_dsl_decay_score",
    oracle="""
WITH scored AS (
  SELECT event_id, event_type, round(value, 6) AS value,
         exp(-(greatest(abs(value - 2.5) - 0.25, 0.0)
               * greatest(abs(value - 2.5) - 0.25, 0.0))
             / 3.2460638420001677) AS s
  FROM events
)
SELECT event_id, event_type, value, round(s, 6) AS score
FROM scored
WHERE s >= 0.6
ORDER BY event_id
""",
)
def query_dsl_decay_score(spark, sf_dir):
    """`function_score` gauss decay (ES closed form: exp(-d^2/(2*sigma^2)),
    sigma^2 = -scale^2/(2*ln(decay))) over a numeric field, min_score
    gating the hits.  One codegen projection + a sargable-free filter;
    deterministic, so the oracle replays the exact arithmetic (the
    2*sigma^2 literal is the same IEEE double both sides)."""
    from elasticsearch_hadoop_spark.query_dsl import function_score

    ev = tbl(spark, sf_dir, "events")
    body = {
        "query": {"match_all": {}},
        "gauss": {
            "value": {"origin": 2.5, "scale": 1.5, "offset": 0.25, "decay": 0.5}
        },
        "min_score": 0.6,
    }
    scored = function_score(ev, body)
    return scored.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("score", 6).alias("score"),
    ).orderBy("event_id")


@query(
    "query_dsl_phrase_slop",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, lang,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'hash') AS p1,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'join') AS p2
  FROM an
)
SELECT doc_id, lang
FROM pos
WHERE len(list_filter(p1,
        a -> len(list_filter(p2, b -> b > a AND b - a - 1 <= 2)) > 0)) > 0
ORDER BY doc_id
""",
)
def query_dsl_phrase_slop(spark, sf_dir):
    """`match_phrase` with slop=2 (the documented in-order subset:
    "hash" then "join" within a 2-token gap).  Per-term position arrays +
    a nested exists over them — pure codegen Column math, no explode; the
    slop=0 fast path stays the containment test."""
    docs = tbl(spark, sf_dir, "documents")
    dsl = {"match_phrase": {"text": {"query": "hash join", "slop": 2}}}
    return (
        docs.filter(compile_query(dsl)).select("doc_id", "lang").orderBy("doc_id")
    )


@query(
    "query_dsl_distance_feature",
    oracle="""
SELECT event_id,
       round(value, 6) AS value,
       round(3600.0::DOUBLE / (3600.0::DOUBLE
                 + abs(floor(epoch(ts)) - 1704153600))
             + CASE WHEN value > 0 THEN value / (value + 2.0::DOUBLE)
                    ELSE 0.0 END, 6) AS score
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 22:00:00'
  AND ts < TIMESTAMP '2024-01-02 02:00:00'
ORDER BY event_id
""",
)
def query_dsl_distance_feature(spark, sf_dir):
    """`distance_feature` (date proximity: boost*pivot/(pivot+dist), pivot
    "1h") summed with a `rank_feature` saturation (x/(x+pivot)) via
    function_score, over a sargable time-window base query.  Proximity
    ranking as one codegen projection — epoch distances are integer-exact,
    so the oracle replays the arithmetic."""
    from elasticsearch_hadoop_spark.query_dsl import function_score

    ev = tbl(spark, sf_dir, "events")
    body = {
        "query": {
            "range": {
                "ts": {
                    "gte": "2024-01-01 22:00:00",
                    "lt": "2024-01-02 02:00:00",
                }
            }
        },
        "functions": [
            {
                "distance_feature": {
                    "field": "ts",
                    "origin": "2024-01-02 00:00:00",
                    "pivot": "1h",
                }
            },
            {"rank_feature": {"field": "value", "saturation": {"pivot": 2.0}}},
        ],
        "score_mode": "sum",
    }
    scored = function_score(ev, body)
    return scored.select(
        "event_id",
        F.round("value", 6).alias("value"),
        F.round("score", 6).alias("score"),
    ).orderBy("event_id")


@query(
    "query_dsl_multi_match",
    oracle="""
WITH analyzed AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS ttoks,
         list_filter(string_split_regex(lower(lang), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS ltoks,
         list_filter(string_split_regex(lower(source), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS stoks
  FROM documents
)
SELECT doc_id,
       (list_has_any(ttoks, ['vector', 'dup'])
        OR list_has_any(stoks, ['vector', 'dup'])) AS best_any,
       (len(list_filter(['en', 'merge'],
                        q -> list_contains(ttoks || ltoks, q))) = 2) AS cross_and,
       (strpos(concat(' ', array_to_string(ttoks, ' '), ' '), ' fast key ') > 0)
         AS phrase_any
FROM analyzed
ORDER BY doc_id
""",
)
def query_dsl_multi_match(spark, sf_dir):
    """ES `multi_match` in its three predicate shapes: best_fields (OR of
    per-field match), cross_fields operator=and (term-centric — every
    query token in at least one field, the first/last-name pattern), and
    phrase (OR of per-field match_phrase).  All compile to token-array
    Column math in codegen (query_dsl._multi_match)."""
    d = tbl(spark, sf_dir, "documents")
    best = compile_query(
        {"multi_match": {"query": "vector dup", "fields": ["text", "source^2"]}}
    )
    cross = compile_query(
        {
            "multi_match": {
                "query": "en merge",
                "fields": ["text", "lang"],
                "type": "cross_fields",
                "operator": "and",
            }
        }
    )
    phrase = compile_query(
        {"multi_match": {"query": "fast key", "fields": ["text"], "type": "phrase"}}
    )
    return d.select(
        "doc_id",
        best.alias("best_any"),
        cross.alias("cross_and"),
        phrase.alias("phrase_any"),
    ).orderBy("doc_id")


@query(
    "query_dsl_dis_max_boosting",
    oracle="""
SELECT c_custkey, c_mktsegment,
       (c_acctbal >= 0) AS positive_balance
FROM customer
WHERE c_mktsegment LIKE 'BUIL%' OR c_mktsegment = 'MACHINERY'
ORDER BY c_custkey
""",
)
def query_dsl_dis_max_boosting(spark, sf_dir):
    """`dis_max` (predicate = disjunction of sub-queries; max-score /
    tie_breaker are score-only) as the row filter, plus a `boosting`
    clause as a boolean column (positive query is the predicate; negative
    only demotes scores and never excludes — documented subset)."""
    c = tbl(spark, sf_dir, "customer")
    dis = compile_query(
        {
            "dis_max": {
                "queries": [
                    {"prefix": {"c_mktsegment": "BUIL"}},
                    {"term": {"c_mktsegment": "MACHINERY"}},
                ],
                "tie_breaker": 0.3,
            }
        }
    )
    boost = compile_query(
        {
            "boosting": {
                "positive": {"range": {"c_acctbal": {"gte": 0}}},
                "negative": {"term": {"c_nationkey": 3}},
                "negative_boost": 0.2,
            }
        }
    )
    return (
        c.filter(dis)
        .select("c_custkey", "c_mktsegment", boost.alias("positive_balance"))
        .orderBy("c_custkey")
    )


@query(
    "query_dsl_terms_set",
    oracle="""
WITH docs AS (
  SELECT l_orderkey,
         list_distinct(list(l_returnflag)) AS flags,
         count(*) AS n_lines
  FROM lineitem GROUP BY l_orderkey
), thresh AS (
  SELECT *, CASE WHEN n_lines > 3 THEN 2 ELSE 1 END AS required FROM docs
)
SELECT l_orderkey, required, n_lines
FROM thresh
WHERE len(list_filter(['R', 'A'], q -> list_contains(flags, q))) >= required
ORDER BY l_orderkey
""",
)
def query_dsl_terms_set(spark, sf_dir):
    """`terms_set` with the ES-native per-document threshold
    (`minimum_should_match_field`): per-order docs carry an array of
    distinct return flags plus their own required-match count; the clause
    counts distinct supplied terms present via array_intersect — one
    hash-agg shuffle to build the docs, then pure codegen."""
    li = tbl(spark, sf_dir, "lineitem")
    docs = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_distinct(F.collect_list("l_returnflag")).alias("flags"),
            F.count("*").alias("n_lines"),
        )
        .withColumn(
            "required", F.when(F.col("n_lines") > 3, F.lit(2)).otherwise(F.lit(1))
        )
    )
    pred = compile_query(
        {
            "terms_set": {
                "flags": {
                    "terms": ["R", "A"],
                    "minimum_should_match_field": "required",
                }
            }
        }
    )
    return (
        docs.filter(pred)
        .select("l_orderkey", "required", "n_lines")
        .orderBy("l_orderkey")
    )


@query(
    "query_dsl_sqs_phrase_prefix",
    oracle="""
WITH analyzed AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
)
SELECT doc_id,
       (len(list_filter(range(1, len(toks)),
                        i -> toks[i] = 'table'
                             AND starts_with(toks[i + 1], 'sc'))) > 0) AS mpp,
       ((strpos(concat(' ', array_to_string(toks, ' '), ' '), ' hash scan ') > 0
         OR len(list_filter(toks, t -> starts_with(t, 'merg'))) > 0)
        AND NOT list_contains(toks, 'window')) AS sqs
FROM analyzed
ORDER BY doc_id
""",
)
def query_dsl_sqs_phrase_prefix(spark, sf_dir):
    """`match_phrase_prefix` ("table sc" matches "table scan": in-order
    adjacency with the last token as a prefix — positional F.get exists,
    no explode) and `simple_query_string` ('"hash scan" | merg* -window',
    default_operator=and: quoted phrase, OR connector, trailing-* prefix,
    - negation)."""
    d = tbl(spark, sf_dir, "documents")
    mpp = compile_query({"match_phrase_prefix": {"text": "table sc"}})
    sqs = compile_query(
        {
            "simple_query_string": {
                "query": '"hash scan" | merg* -window',
                "fields": ["text"],
                "default_operator": "and",
            }
        }
    )
    return d.select("doc_id", mpp.alias("mpp"), sqs.alias("sqs")).orderBy("doc_id")


@query(
    "query_dsl_query_string",
    oracle="""
SELECT doc_id, lang, n_chars
FROM documents
WHERE lang IN ('en', 'fr')
  AND contains(
        ' ' || array_to_string(
            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> length(x) > 0), ' ') || ' ',
        ' hash join ')
  AND n_chars >= 300 AND n_chars < 900
  AND source <> 'src7'
ORDER BY doc_id
""",
)
def query_dsl_query_string(spark, sf_dir):
    """Full Lucene `query_string` syntax in one clause: field-scoped
    group, quoted phrase, mixed-bound range [300 TO 900}, AND/NOT — the
    parser compiles every leaf through the existing typed handlers, so
    range bounds stay sargable and the phrase uses the analyzed
    containment fast path."""
    docs = tbl(spark, sf_dir, "documents")
    dsl = {
        "query_string": {
            "query": '(lang:en OR lang:fr) AND text:"hash join" '
            "AND n_chars:[300 TO 900} AND NOT source:src7"
        }
    }
    return (
        docs.filter(compile_query(dsl))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "query_dsl_intervals",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, lang,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'table') AS p1,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'scan') AS p2,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'merge') AS p3
  FROM an
)
SELECT doc_id, lang
FROM pos
WHERE len(list_filter(p1,
        a -> len(list_filter(p2, b -> b > a AND b - a - 1 <= 2)) > 0)) > 0
   OR len(p3) >= 3
ORDER BY doc_id
""",
)
def query_dsl_intervals(spark, sf_dir):
    """`intervals`: any_of( all_of(ordered "table" -> "scan", max_gaps 2),
    match "merge merge merge" unordered ) — positional interval algebra
    as per-term position arrays + nested exists, the same codegen shape
    as sloppy phrases (multiplicity: three 'merge' tokens need positions
    >= 3 only when distinct -- unordered match requires each term
    present; repeated terms share one position array, so the oracle
    counts occurrences)."""
    docs = tbl(spark, sf_dir, "documents")
    dsl = {
        "intervals": {
            "text": {
                "any_of": {
                    "intervals": [
                        {
                            "all_of": {
                                "ordered": True,
                                "max_gaps": 2,
                                "intervals": [
                                    {"match": {"query": "table"}},
                                    {"match": {"query": "scan"}},
                                ],
                            }
                        },
                        {"match": {"query": "merge merge merge"}},
                    ]
                }
            }
        }
    }
    return (
        docs.filter(compile_query(dsl))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "query_dsl_combined_fields",
    oracle="""
WITH an AS (
  SELECT doc_id, lang, n_chars,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
)
SELECT doc_id, lang, n_chars
FROM an
WHERE (list_contains(toks, 'hash') OR lang = 'hash')
  AND (list_contains(toks, 'join') OR lang = 'join')
  AND (list_contains(toks, 'en') OR lang = 'en')
ORDER BY doc_id
""",
)
def query_dsl_combined_fields(spark, sf_dir):
    """`combined_fields` (operator and): term-centric — every query token
    must appear in at least ONE of the combined fields; 'en' is satisfied
    by the lang field, 'hash'/'join' by the text tokens.  Predicate-wise
    the cross_fields blend, one codegen pass, no joins."""
    docs = tbl(spark, sf_dir, "documents")
    dsl = {
        "combined_fields": {
            "query": "hash join en",
            "fields": ["text", "lang"],
            "operator": "and",
        }
    }
    return (
        docs.filter(compile_query(dsl))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "query_dsl_span_near",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, lang,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'batch') AS p1,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'stream') AS p2,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'spark') AS p3,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'window') AS p4
  FROM an
)
SELECT doc_id, lang,
       len(list_filter(p1,
           a -> len(list_filter(p2, b -> b > a AND b - a - 1 <= 2)) > 0)) > 0
         AS near_ordered,
       len(list_filter(p3,
           a -> len(list_filter(p4,
                b -> b != a AND abs(b - a) - 1 <= 3)) > 0)) > 0
         AS near_unordered
FROM pos
WHERE len(list_filter(p1,
           a -> len(list_filter(p2, b -> b > a AND b - a - 1 <= 2)) > 0)) > 0
   OR len(list_filter(p3,
           a -> len(list_filter(p4,
                b -> b != a AND abs(b - a) - 1 <= 3)) > 0)) > 0
ORDER BY doc_id
""",
)
def query_dsl_span_near(spark, sf_dir):
    """Lucene `span_near` over analyzed token positions: in_order
    ("batch" then "stream", total gap <= 2) and unordered (the 2-clause
    subset: "spark" and "window" within 3 either way).  Spans are
    array<struct<s,e>> built by index-filter Column math — the whole
    family stays in codegen (no explode); the oracle replays the same
    position arithmetic 1-based."""
    docs = tbl(spark, sf_dir, "documents")
    ordered = compile_query({"span_near": {
        "clauses": [
            {"span_term": {"text": "batch"}},
            {"span_term": {"text": "stream"}},
        ],
        "slop": 2, "in_order": True,
    }})
    unordered = compile_query({"span_near": {
        "clauses": [
            {"span_term": {"text": "spark"}},
            {"span_term": {"text": "window"}},
        ],
        "slop": 3, "in_order": False,
    }})
    # Both span flags are filtered on AND projected out, and Catalyst
    # pushes the filter below the projection, re-inlining each clause's
    # analyzer into the Filter — 4 tokenizations per row (2 clauses x
    # filter+project; see plans/r14/query_dsl_span_near_before.txt).  A
    # one-element explode is a pushdown BARRIER (a predicate on generated
    # attributes cannot move below its Generate), so both flags compute
    # exactly once per row.  Measured: 1.25 s -> 0.92 s at sf0.1, plan
    # analyzer count 4 -> 2.  Row set and schema are untouched (the array
    # has exactly one element per row).
    return (
        docs.select(
            "doc_id", "lang",
            F.explode(
                F.array(F.struct(ordered.alias("o"), unordered.alias("u")))
            ).alias("__f"),
        )
        .filter(F.col("__f.o") | F.col("__f.u"))
        .select(
            "doc_id", "lang",
            F.col("__f.o").alias("near_ordered"),
            F.col("__f.u").alias("near_unordered"),
        )
        .orderBy("doc_id")
    )


@query(
    "query_dsl_span_first_not_or",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, lang,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'the') AS pthe,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'join') AS pj,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'merge') AS pm,
         list_filter(generate_series(1, len(toks)),
                     i -> toks[i] = 'vector' OR toks[i] = 'hash') AS por
  FROM an
)
SELECT doc_id, lang,
       len(list_filter(pthe, a -> a <= 3)) > 0 AS the_early,
       len(list_filter(pj,
           a -> len(list_filter(pm, b -> b > a - 2 AND b < a + 2)) = 0)) > 0
         AS join_clear,
       len(por) > 0 AS has_either
FROM pos
WHERE len(pthe) > 0 OR len(pj) > 0 OR len(por) > 0
ORDER BY doc_id
""",
)
def query_dsl_span_first_not_or(spark, sf_dir):
    """`span_first` ("the" ending within the first 3 positions),
    `span_not` ("join" with no "merge" within 1 position either side,
    pre/post windows) and `span_or` ("vector" | "hash") as boolean
    columns over the same position machinery."""
    docs = tbl(spark, sf_dir, "documents")
    the_early = compile_query({"span_first": {
        "match": {"span_term": {"text": "the"}}, "end": 3,
    }})
    join_clear = compile_query({"span_not": {
        "include": {"span_term": {"text": "join"}},
        "exclude": {"span_term": {"text": "merge"}},
        "pre": 1, "post": 1,
    }})
    has_either = compile_query({"span_or": {"clauses": [
        {"span_term": {"text": "vector"}},
        {"span_term": {"text": "hash"}},
    ]}})
    any_term = compile_query({"span_or": {"clauses": [
        {"span_term": {"text": "the"}},
        {"span_term": {"text": "join"}},
        {"span_term": {"text": "vector"}},
        {"span_term": {"text": "hash"}},
    ]}})
    return (
        docs.select(
            "doc_id", "lang",
            the_early.alias("the_early"),
            join_clear.alias("join_clear"),
            has_either.alias("has_either"),
        )
        .filter(any_term)
        .orderBy("doc_id")
    )


@query(
    "query_dsl_span_near_nway",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, lang,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'merge') AS p1,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'hash') AS p2,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'vector') AS p3
  FROM an
)
SELECT doc_id, lang
FROM pos
WHERE len(list_filter(p1, a ->
        len(list_filter(p2, b -> b != a AND
          len(list_filter(p3, c -> c != a AND c != b
              AND greatest(a, b, c) - least(a, b, c) - 2 <= 6)) > 0)) > 0)) > 0
ORDER BY doc_id
""",
)
def query_dsl_span_near_nway(spark, sf_dir):
    """Lucene `span_near` unordered THREE-way (the round-7
    generalization past the 2-clause subset): 'merge', 'hash' and
    'vector' at pairwise-distinct positions with the bounding window's
    gap <= 6, any order.  The compiled fold carries the chosen spans so
    later spans may fill holes inside the window (no premature slop
    pruning); the oracle enumerates the same triple product with
    1-based position lambdas."""
    docs = tbl(spark, sf_dir, "documents")
    pred = compile_query({"span_near": {
        "clauses": [
            {"span_term": {"text": "merge"}},
            {"span_term": {"text": "hash"}},
            {"span_term": {"text": "vector"}},
        ],
        "slop": 6, "in_order": False,
    }})
    return docs.filter(pred).select("doc_id", "lang").orderBy("doc_id")
