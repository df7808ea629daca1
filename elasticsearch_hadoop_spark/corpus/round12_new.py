"""Round-12 net-new graded surface: the scored QSTR term-leaf subset
(ES|QL ``METADATA _score`` + ``QSTR`` — ES's query_string scores, and
the engine's whole QSTR grammar is term leaves, so the subset is the
full surface) and ES|QL ``TS`` + ``RATE()`` over a NON-calendar BUCKET
span (the epoch-floor arithmetic path the calendar-day grading never
exercised).

Same contract as every corpus module: the Spark query and the DuckDB
oracle sit side by side with identical aliases and rounding, so the
driver's column-sorted value hash compares them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "esql_qstr_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, n_chars,
         list_filter(string_split_regex(lower(lang), '[^a-z0-9]+'),
                     t -> length(t) > 0) AS toks
  FROM documents
), stats AS (
  -- docCount semantics (Lucene): only documents with at least one
  -- analyzed term enter N and avgdl
  SELECT count(CASE WHEN len(toks) > 0 THEN 1 END)::DOUBLE AS n,
         sum(len(toks))::DOUBLE AS sdl,
         sum(list_contains(toks, 'fr')::INT)::DOUBLE AS df1,
         sum(list_contains(toks, 'es')::INT)::DOUBLE AS df2,
         sum(list_contains(toks, 'de')::INT)::DOUBLE AS df3
  FROM tok
), scored AS (
  SELECT doc_id, lang, n_chars,
         len(toks)::DOUBLE AS dl,
         len(list_filter(toks, x -> x = 'fr'))::DOUBLE AS tf1,
         len(list_filter(toks, x -> x = 'es'))::DOUBLE AS tf2,
         len(list_filter(toks, x -> x = 'de'))::DOUBLE AS tf3
  FROM tok
), withnorm AS (
  SELECT doc_id, lang, n_chars, tf1, tf2, tf3,
         1.2 * (0.25 + (0.75 * dl) / (sdl / n)) AS nrm,
         ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) AS idf1,
         ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) AS idf2,
         ln(1.0 + (n - df3 + 0.5) / (df3 + 0.5)) AS idf3
  FROM scored, stats
), s AS (
  -- each QSTR term leaf pays its BM25 gated on ITS OWN equality
  -- predicate (the URI subset's filter semantics); only in-gate terms
  -- contribute, exactly like the engine's _where_scored
  SELECT doc_id, lang,
         (CASE WHEN lang = 'fr' THEN
             CASE WHEN tf1 > 0
                  THEN idf1 * ((tf1 * 2.2) / (tf1 + nrm)) ELSE 0.0 END
          ELSE 0.0 END)
       + (CASE WHEN lang = 'es' THEN
             CASE WHEN tf2 > 0
                  THEN idf2 * ((tf2 * 2.2) / (tf2 + nrm)) ELSE 0.0 END
          ELSE 0.0 END)
       + (CASE WHEN lang = 'de' THEN
             CASE WHEN tf3 > 0
                  THEN idf3 * ((tf3 * 2.2) / (tf3 + nrm)) ELSE 0.0 END
          ELSE 0.0 END) AS raw
  FROM withnorm
  WHERE lang IN ('fr', 'es', 'de') AND n_chars >= 120
)
SELECT doc_id, lang, round(raw, 6) AS score
FROM s
ORDER BY raw DESC, doc_id
LIMIT 12
""",
)
def esql_qstr_score(spark, sf_dir):
    """ES|QL ``METADATA _score`` + scored ``QSTR`` (esql._qstr_score_
    leaves, new round 12 — VERDICT r11 item 4): ES's query_string
    scores, and the engine's QSTR grammar is field:value term leaves
    joined by AND/OR, so every leaf routes through the same per-leaf
    BM25 gate as MATCH — contribution = the term's BM25 over the field,
    gated on the leaf's OWN equality predicate (a doc surviving the
    WHERE through another OR branch gets exactly 0 from a failed leaf).
    Three language leaves with distinct document frequencies make three
    distinct idf levels; the plain ``n_chars`` conjunct filters without
    scoring.  Corpus statistics compute over the WHERE's input frame
    (the engine's documented per-shard-stats equivalent) and the oracle
    replays the exact Lucene formula, same parenthesization, same leaf
    order.  Plan shape (search.bm25_score_multi — leaves sharing a
    field share its stats pass): ONE 1-row stats aggregation broadcast
    back covering all three terms + one scoring projection, ending in
    TakeOrderedAndProject — 2 corpus scans total, no window, no global
    sort, no Python."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return esql(
        "FROM documents METADATA _score"
        ' | WHERE QSTR("lang:fr OR lang:es OR lang:de") AND n_chars >= 120'
        " | SORT _score DESC, doc_id"
        " | LIMIT 12"
        " | EVAL score = ROUND(_score, 6)"
        " | KEEP doc_id, lang, score",
        tables={"documents": docs},
    )


@query(
    "esql_ts_rate_subday",
    oracle="""
WITH base AS (
  SELECT user_id % 4 AS host, ts, value FROM events
), lagged AS (
  SELECT host, to_timestamp(floor(epoch(ts) / 21600) * 21600) AS tb,
         ts, value,
         lag(value) OVER (
           PARTITION BY host, to_timestamp(floor(epoch(ts) / 21600) * 21600)
           ORDER BY ts, value
         ) AS prev
  FROM base
), series AS (
  SELECT host, tb,
         sum(CASE WHEN prev IS NULL THEN NULL
                  WHEN value >= prev THEN value - prev
                  ELSE value END) AS inc,
         epoch(max(ts)) - epoch(min(ts)) AS span
  FROM lagged
  GROUP BY host, tb
)
SELECT strftime(tb, '%Y-%m-%d %H:%M') AS bucket,
       round(max(CASE WHEN span > 0 THEN inc / span END), 6)::DOUBLE
         AS max_rate,
       round(avg(CASE WHEN span > 0 THEN inc / span END), 6)::DOUBLE
         AS avg_rate,
       CAST(count(CASE WHEN span > 0 THEN inc / span END) AS BIGINT)
         AS n_series
FROM series
GROUP BY tb
ORDER BY bucket
""",
)
def esql_ts_rate_subday(spark, sf_dir):
    """ES|QL 9.x ``TS`` + ``RATE()`` over a NON-calendar BUCKET span
    (esql._stats_ts + the BUCKET epoch-floor path, new round 12 —
    VERDICT r11 item 5): 6-hour buckets compile to
    ``timestamp_seconds(floor(unix_timestamp(ts) / 21600) * 21600)``
    rather than date_trunc, the arithmetic the calendar-day grading
    never exercised.  Per (host, bucket) the counter rate is the sum of
    sample increases (a drop is a counter reset, contributing the
    post-reset value) over the series' OBSERVED seconds — the engine's
    documented deterministic deviation from ES 9.x's bucket-edge
    extrapolation; buckets where a series has fewer than two samples
    yield NULL rates that the outer COUNT excludes.  The oracle replays
    the identical lag-window arithmetic; epoch-floor bucketing agrees
    on both engines because floor(floor(x)/k) = floor(x/k) for integer
    k, so Spark's second-truncating unix_timestamp changes nothing.
    Scale shape: one window pass + two hash aggregations, all
    partitioned by (series, bucket) — co-located on a TSDS layout."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("host"), "ts", "value"
    )
    out = esql(
        "TS ev | STATS max_rate = MAX(RATE(value)),"
        " avg_rate = AVG(RATE(value)),"
        " n_series = COUNT(RATE(value))"
        ' BY tb = BUCKET(ts, "6 hours")',
        tables={"ev": ev},
        time_series={"ev": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    return out.select(
        F.date_format("tb", "yyyy-MM-dd HH:mm").alias("bucket"),
        F.round("max_rate", 6).alias("max_rate"),
        F.round("avg_rate", 6).alias("avg_rate"),
        F.col("n_series").cast("long").alias("n_series"),
    ).orderBy("bucket")
