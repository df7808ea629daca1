"""Round-11 net-new graded surface: ES|QL ``TOP`` inside a TS STATS
(the time-series aggregation path gained the bounded-carry TOP this
round), the ``bucket_count_ks_test`` ML sibling pipeline aggregation,
and field collapsing with a real ``inner_hits`` sub-request (its own
sort and size, independent of the main sort).

Same contract as every corpus module: the Spark query and the DuckDB
oracle sit side by side with identical aliases and rounding, so the
driver's column-sorted value hash compares them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import TS_US_FMT_DUCK, TS_US_FMT_SPARK, tbl


@query(
    "esql_ts_stats_top",
    oracle="""
WITH s AS (
  SELECT event_type, user_id, date_trunc('day', ts) AS tb,
         count(value) AS c, max(value) AS mx
  FROM events
  GROUP BY 1, 2, 3
)
SELECT strftime(tb, '%Y-%m-%d') AS day,
       round(max(mx), 6)::DOUBLE AS hi,
       array_to_string(list(c ORDER BY c DESC)[1:3], '|') AS top_counts
FROM s
GROUP BY tb
ORDER BY day
""",
)
def esql_ts_stats_top(spark, sf_dir):
    """ES|QL ``TOP`` inside ``TS ... | STATS`` (esql._stats_ts, new round
    11): per day, the 3 highest per-series sample counts — the outer TOP
    combines PER-SERIES values ((event_type, user_id) is the dimension
    tuple), not rows, which is the whole point of the TS command — next
    to a MAX(MAX_OVER_TIME()) scalar that exercises the mixed shape (the
    bounded TOP frame joins back onto the plain outer aggregate).  The
    TOP runs through the same _agg_with_tops machinery as plain STATS:
    the plan shows WindowGroupLimit Partial+Final over the per-series
    frame, so at TSDS cardinalities (millions of series) a hot day's
    past-limit series drop map-side and never reach an aggregation
    buffer.  Counts render as '|'-joined strings (integer rendering is
    engine-identical; the driver's hash needs scalar columns); the top-3
    multiset is deterministic under ties (equal values either way)."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id", "ts", "value")
    out = esql(
        "TS ev | STATS hi = MAX(MAX_OVER_TIME(value)),"
        ' top_counts = TOP(COUNT_OVER_TIME(value), 3, "desc")'
        ' BY tb = BUCKET(ts, "1 day")',
        tables={"ev": ev},
        time_series={
            "ev": {"dimensions": ["event_type", "user_id"], "timestamp": "ts"}
        },
    )
    return out.select(
        F.date_format("tb", "yyyy-MM-dd").alias("day"),
        F.round("hi", 6).alias("hi"),
        F.array_join(
            F.transform(F.col("top_counts"), lambda x: x.cast("string")), "|"
        ).alias("top_counts"),
    ).orderBy("day")


@query(
    "aggs_bucket_count_ks_test",
    oracle="""
WITH b AS (
  SELECT o_orderpriority AS pri, count(*)::DOUBLE AS c
  FROM orders
  GROUP BY 1
), w AS (
  SELECT pri, c,
         sum(c) OVER () AS total,
         count(*) OVER () AS nb,
         sum(c) OVER (ORDER BY pri) AS cum,
         row_number() OVER (ORDER BY pri) AS rn
  FROM b
), d AS (
  SELECT greatest(max(cum / total - rn::DOUBLE / nb), 0) AS dl,
         greatest(max(rn::DOUBLE / nb - cum / total), 0) AS dg,
         any_value(total) AS n
  FROM w
), p AS (
  SELECT exp(-2 * n * dl * dl) AS p_less,
         exp(-2 * n * dg * dg) AS p_greater,
         CASE WHEN n * greatest(dl, dg) * greatest(dl, dg) <= 0.001
              THEN 1.0
              ELSE least(greatest(2 * (
                SELECT sum(CASE WHEN j % 2 = 1 THEN 1 ELSE -1 END
                           * exp(-2 * j * j * n
                                 * greatest(dl, dg) * greatest(dl, dg)))
                FROM range(1, 101) t(j)
              ), 0), 1) END AS p_two
  FROM d
)
SELECT w.pri,
       CAST(w.c AS BIGINT) AS doc_count,
       round(p.p_less, 6) AS ks_less,
       round(p.p_greater, 6) AS ks_greater,
       round(p.p_two, 6) AS ks_two_sided
FROM w, p
ORDER BY pri
""",
)
def aggs_bucket_count_ks_test(spark, sf_dir):
    """ES ``bucket_count_ks_test`` ML sibling pipeline (aggs_dsl, new
    round 11): a Kolmogorov–Smirnov test of the priority terms buckets'
    doc counts against the uniform expectation — the drift detector for
    "do these buckets still follow the expected distribution".  ECDF and
    reference CDF build from ONE prefix-sum window pass over the
    finished 5-row bucket frame (never fact rows); one-sided p-values
    are exp(-2·n·d²), the two-sided the 100-term Kolmogorov asymptotic
    series — all Column math, replayed exactly by the oracle (integer
    doc counts make every CDF point FP-identical on both engines; the
    series terms decay past 1e-300 long before term 100, so the
    truncation is exact at 6 dp)."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    orders = tbl(spark, sf_dir, "orders")
    out = compile_aggs(
        orders,
        {
            "pri": {
                "terms": {
                    "field": "o_orderpriority",
                    "size": 10,
                    "order": {"_key": "asc"},
                }
            },
            "ks": {
                "bucket_count_ks_test": {
                    "buckets_path": "pri>_count",
                    "alternative": ["less", "greater", "two_sided"],
                }
            },
        },
    )
    return out.select(
        "pri",
        "doc_count",
        F.round("ks_less", 6).alias("ks_less"),
        F.round("ks_greater", 6).alias("ks_greater"),
        F.round("ks_two_sided", 6).alias("ks_two_sided"),
    ).orderBy("pri")


@query(
    "search_bm25_topk",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
), stats AS (
  -- docCount semantics (Lucene): only documents with at least one
  -- analyzed term enter N and avgdl — NULL or empty-analyzed fields
  -- leave no postings or norm behind
  SELECT count(CASE WHEN len(toks) > 0 THEN 1 END)::DOUBLE AS n,
         sum(len(toks))::DOUBLE AS sdl,
         sum(list_contains(toks, 'hash')::INT)::DOUBLE AS df1,
         sum(list_contains(toks, 'join')::INT)::DOUBLE AS df2
  FROM tok
), scored AS (
  SELECT doc_id,
         len(toks)::DOUBLE AS dl,
         len(list_filter(toks, x -> x = 'hash'))::DOUBLE AS tf1,
         len(list_filter(toks, x -> x = 'join'))::DOUBLE AS tf2
  FROM tok
), withnorm AS (
  SELECT doc_id, tf1, tf2,
         1.2 * (0.25 + (0.75 * dl) / (sdl / n)) AS nrm,
         ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) AS idf1,
         ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) AS idf2
  FROM scored, stats
)
SELECT doc_id,
       round(idf1 * ((tf1 * 2.2) / (tf1 + nrm))
             + idf2 * ((tf2 * 2.2) / (tf2 + nrm)), 6) AS score
FROM withnorm
WHERE idf1 * ((tf1 * 2.2) / (tf1 + nrm))
      + idf2 * ((tf2 * 2.2) / (tf2 + nrm)) > 0
ORDER BY idf1 * ((tf1 * 2.2) / (tf1 + nrm))
         + idf2 * ((tf2 * 2.2) / (tf2 + nrm)) DESC, doc_id
LIMIT 10
""",
)
def search_bm25_topk(spark, sf_dir):
    """Deterministic BM25 relevance (search.bm25_topk, new round 11 —
    closes the engine's last documented relevance gap): the 10 best
    documents for the analyzed query "hash join" by Lucene's exact BM25
    formula (k1=1.2, b=0.75), score ties broken by doc_id.  Every input
    to the float math is an exact integer (N, Σdl as a long, df, tf,
    dl), so idf/norm/score are bit-identical doubles on both engines —
    the oracle replays the formula with the same parenthesization and
    the same term order.  One tiny stats aggregation broadcast back +
    one scoring pass ending in TakeOrderedAndProject; the documented
    deviation from Lucene is the absence of SmallFloat norm quantization
    (a lossy index-size optimization, not a semantics choice)."""
    from elasticsearch_hadoop_spark.search import bm25_topk

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    out = bm25_topk(docs, "text", "Hash JOIN", k=10, tiebreak=["doc_id"])
    return out.select("doc_id", F.round("_score", 6).alias("score"))


@query(
    "esql_match_score_topk",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
), stats AS (
  -- docCount semantics: docs with at least one analyzed term (Lucene)
  SELECT count(CASE WHEN len(toks) > 0 THEN 1 END)::DOUBLE AS n,
         sum(len(toks))::DOUBLE AS sdl,
         sum(list_contains(toks, 'hash')::INT)::DOUBLE AS df1,
         sum(list_contains(toks, 'join')::INT)::DOUBLE AS df2
  FROM tok
), scored AS (
  SELECT doc_id, lang,
         len(toks)::DOUBLE AS dl,
         len(list_filter(toks, x -> x = 'hash'))::DOUBLE AS tf1,
         len(list_filter(toks, x -> x = 'join'))::DOUBLE AS tf2
  FROM tok
), withnorm AS (
  SELECT doc_id, lang, tf1, tf2,
         1.2 * (0.25 + (0.75 * dl) / (sdl / n)) AS nrm,
         ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) AS idf1,
         ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) AS idf2
  FROM scored, stats
), s AS (
  SELECT doc_id, lang,
         (CASE WHEN tf1 > 0
               THEN idf1 * ((tf1 * 2.2) / (tf1 + nrm)) ELSE 0.0 END)
         + (CASE WHEN tf2 > 0
                 THEN idf2 * ((tf2 * 2.2) / (tf2 + nrm)) ELSE 0.0 END)
           AS raw
  FROM withnorm
  WHERE (tf1 > 0 OR tf2 > 0) AND lang = 'en'
)
SELECT doc_id, round(raw, 6) AS score
FROM s
ORDER BY raw DESC, doc_id
LIMIT 10
""",
)
def esql_match_score_topk(spark, sf_dir):
    """ES|QL ``METADATA _score`` + full-text ``MATCH`` scoring (8.18,
    esql._where_scored, new round 11): the classic relevance pipeline —
    ``FROM docs METADATA _score | WHERE MATCH(...) AND lang == "en" |
    SORT _score DESC | LIMIT 10`` — where the MATCH leaf contributes its
    BM25 score to _score and the lang equality filters without scoring
    (Lucene's BooleanQuery: filters contribute 0).  The plan is the
    bm25_topk shape (one stats aggregation broadcast back, one scoring
    pass, TakeOrderedAndProject); the oracle replays the exact Lucene
    formula with the filter applied, proving the scored-WHERE path
    produces the same doubles as the standalone scorer."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return esql(
        "FROM documents METADATA _score"
        ' | WHERE MATCH(text, "hash join") AND lang == "en"'
        " | SORT _score DESC, doc_id"
        " | LIMIT 10"
        " | EVAL score = ROUND(_score, 6)"
        " | KEEP doc_id, score",
        tables={"documents": docs},
    )


@query(
    "search_collapse_inner_hits",
    oracle=f"""
WITH r AS (
  SELECT user_id, event_id, ts,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id ASC
         ) AS rep_rn
  FROM events
), i AS (
  SELECT user_id,
         string_agg(event_id::VARCHAR, '|'
                    ORDER BY value DESC, event_id ASC) AS top_ids
  FROM (
    SELECT user_id, event_id, value,
           row_number() OVER (
             PARTITION BY user_id ORDER BY value DESC, event_id ASC
           ) AS rn
    FROM events
  )
  WHERE rn <= 3
  GROUP BY user_id
)
SELECT r.user_id, r.event_id,
       strftime(r.ts, '{TS_US_FMT_DUCK}') AS ts_s,
       i.top_ids
FROM r JOIN i USING (user_id)
WHERE rep_rn = 1
ORDER BY r.user_id
""",
)
def search_collapse_inner_hits(spark, sf_dir):
    """ES field collapsing WITH ``inner_hits`` (search.collapse_inner_
    hits, new round 11): one representative event per user — the most
    recent, the request's own sort — each carrying the user's 3
    highest-value events ranked by a SEPARATE inner sort (the two sorts
    independent: ES's exact collapse/inner_hits contract, which the
    plain ``collapse`` top-k can't express).  Two bounded row_number
    frames over the same collapse key — the plan shows WindowGroupLimit
    Partial+Final for BOTH (rep limit 1, inner limit 3), so a hot user's
    past-limit events drop map-side — joined once on the key.  Inner
    hits render as '|'-joined event ids in inner-rank order; both sorts
    tie-break on event_id for determinism."""
    from elasticsearch_hadoop_spark.search import collapse_inner_hits

    ev = tbl(spark, sf_dir, "events")
    out = collapse_inner_hits(
        ev,
        "user_id",
        sort=[{"ts": "desc"}, {"event_id": "asc"}],
        inner_hits={
            "name": "top_events",
            "size": 3,
            "sort": [{"value": "desc"}, {"event_id": "asc"}],
        },
        inner_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_US_FMT_SPARK).alias("ts_s"),
        F.array_join(
            F.transform(F.col("top_events"), lambda s: s["event_id"].cast("string")),
            "|",
        ).alias("top_ids"),
    ).orderBy("user_id")
