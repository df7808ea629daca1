"""Ingest-pipeline corpus: ES processor chains (ingest.py) compiled to
Column transforms, hash-checked against hand-written SQL oracles.

The reference connector ships documents to a *server-side* pipeline
(`es.ingest.pipeline`); here the same pipeline JSON runs inside Spark, so
each query declares a realistic processor chain and verifies the combined
result end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.ingest import compile_pipeline


@query(
    "ingest_pipeline_docs",
    oracle="""
SELECT doc_id,
       upper(lang) AS lang_uc,
       source || '.example.com' AS domain,
       '/docs/' || doc_id AS path,
       round(n_chars / 1000.0::DOUBLE, 6) AS kchars,
       md5(source || chr(0) || lang) AS fp
FROM documents
WHERE n_chars >= 200
ORDER BY doc_id
""",
)
def ingest_pipeline_docs(spark, sf_dir):
    """set (mustache template) -> uri_parts -> copy_from dotted paths ->
    script arithmetic -> uppercase -> fingerprint -> conditional drop, all
    whole-stage codegen; the URL is synthesized from document fields and
    re-parsed, proving template + parse_url agree."""
    docs = tbl(spark, sf_dir, "documents")
    pipe = compile_pipeline(
        {
            "processors": [
                {
                    "set": {
                        "field": "url",
                        "value": "https://{{source}}.example.com/docs/{{doc_id}}?lang={{lang}}",
                    }
                },
                {"uri_parts": {"field": "url", "target_field": "url_parts"}},
                {"set": {"field": "domain", "copy_from": "url_parts.domain"}},
                {"set": {"field": "path", "copy_from": "url_parts.path"}},
                {"uppercase": {"field": "lang", "target_field": "lang_uc"}},
                {"script": {"source": "ctx.kchars = ctx.n_chars / 1000.0"}},
                {
                    "fingerprint": {
                        "fields": ["source", "lang"],
                        "target_field": "fp",
                        "method": "MD5",
                    }
                },
                {"drop": {"if": "ctx.n_chars < 200"}},
            ]
        }
    )
    return (
        pipe(docs)
        .select(
            "doc_id",
            "lang_uc",
            "domain",
            "path",
            F.round("kchars", 6).alias("kchars"),
            "fp",
        )
        .orderBy("doc_id")
    )


@query(
    "ingest_pipeline_dissect",
    oracle="""
SELECT CAST(regexp_extract(o_orderpriority, '^(.*?)-(.*)$', 1) AS INT) AS prio_code,
       regexp_extract(o_orderpriority, '^(.*?)-(.*)$', 2) AS prio_word,
       count(*) AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price,
       strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_day
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY 1, 2
ORDER BY prio_code
""",
)
def ingest_pipeline_dissect(spark, sf_dir):
    """dissect %{key} patterns -> convert -> mustache set -> date processor
    (first-match-wins formats, the first deliberately non-matching) ->
    conditional drop; the parsed pieces then drive a normal aggregate."""
    orders = tbl(spark, sf_dir, "orders")
    pipe = compile_pipeline(
        [
            {"dissect": {"field": "o_orderpriority", "pattern": "%{prio_num}-%{prio_word}"}},
            {
                "convert": {
                    "field": "prio_num",
                    "type": "integer",
                    "target_field": "prio_code",
                }
            },
            {"set": {"field": "od_str", "value": "{{o_orderdate}}"}},
            {
                "date": {
                    "field": "od_str",
                    "formats": ["MM/dd/yyyy", "yyyy-MM-dd HH:mm:ss"],
                    "target_field": "@timestamp",
                }
            },
            {"drop": {"if": "ctx.o_orderstatus == 'P'"}},
        ]
    )
    return (
        pipe(orders)
        .groupBy("prio_code", "prio_word")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.date_format(F.max(F.col("@timestamp")), "yyyy-MM-dd").alias("last_order_day"),
        )
        .orderBy("prio_code")
    )


@query(
    "ingest_pipeline_events",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(floor(value / 10.0::DOUBLE) AS BIGINT) AS value_bucket,
       'e:' || event_type || ',k:' || json_extract_string(props, '$.k') AS tags,
       CAST(CAST(floor(value / 10.0::DOUBLE) AS BIGINT) AS VARCHAR) AS vb_echo
FROM events
WHERE event_id < 3000 AND event_type <> 'error'
ORDER BY event_id
""",
)
def ingest_pipeline_events(spark, sf_dir):
    """json -> map copy_from -> convert -> script floor() -> append
    (array build) -> join -> set template -> kv round trip -> drop; the
    props JSON never leaves the JVM (from_json / str_to_map)."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    pipe = compile_pipeline(
        [
            {"json": {"field": "props", "target_field": "props_map"}},
            {"set": {"field": "k_str", "copy_from": "props_map.k"}},
            {"convert": {"field": "k_str", "type": "long", "target_field": "k"}},
            {"script": {"source": "ctx.value_bucket = Math.floor(ctx.value / 10.0)"}},
            {"append": {"field": "tag_list", "value": "e:{{event_type}}"}},
            {"append": {"field": "tag_list", "value": "k:{{k}}"}},
            {"join": {"field": "tag_list", "separator": ",", "target_field": "tags"}},
            {"set": {"field": "kv_line", "value": "vb={{value_bucket}}"}},
            {"kv": {"field": "kv_line", "field_split": "&", "value_split": "="}},
            {"set": {"field": "vb_echo", "copy_from": "kv_line.vb"}},
            {"drop": {"if": "ctx.event_type == 'error'"}},
        ]
    )
    return (
        pipe(ev)
        .select("event_id", "k", "value_bucket", "tags", "vb_echo")
        .orderBy("event_id")
    )


@query(
    "ingest_enrich_events",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type,
       c.c_mktsegment AS segment,
       round(c.c_acctbal, 2) AS acctbal
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
""",
)
def ingest_enrich_events(spark, sf_dir):
    """ES enrich processor: the event stream enriched against a
    customer-profile policy frame (the .enrich-* system-index analogue)
    — a broadcast left join keyed on the match field, matched doc under
    target_field (ingest.compile_pipeline enrich_policies)."""
    from elasticsearch_hadoop_spark.ingest import compile_pipeline

    ev = tbl(spark, sf_dir, "events")
    policy = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    run = compile_pipeline(
        [{"enrich": {
            "policy_name": "cust_profile",
            "field": "user_id",
            "match_field": "c_custkey",
            "target_field": "profile",
        }}],
        enrich_policies={"cust_profile": policy},
    )
    out = run(ev)
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("profile.c_mktsegment").alias("segment"),
        F.round(F.col("profile.c_acctbal"), 2).alias("acctbal"),
    ).orderBy("event_id")
