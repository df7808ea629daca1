"""Round-8 net-new graded surface.

Each query exercises library capability added (or first graded) in round
8, with its DuckDB oracle adjacent.  Reference parity notes cite
SURVEY.md §2's upstream paths; the library docstrings carry the
file-level citations.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.query_dsl import compile_query

# geo-corpus convention (corpus/geo.py): points derived from c_custkey
_PTS_SQL = """
  SELECT c_custkey,
         CAST((c_custkey % 180) - 89.5 AS DOUBLE) AS glat,
         CAST(((c_custkey * 7) % 360) - 179.5 AS DOUBLE) AS glon
  FROM customer
"""
_MERC = "ln(tan(radians(greatest(-85.05112878, least(85.05112878, glat)))) + 1.0/cos(radians(greatest(-85.05112878, least(85.05112878, glat)))))"
# geotile z=2 (n=4) cell index pair
_TILE_X = "CAST(least(floor((glon + 180.0) / 360.0 * 4), 3) AS BIGINT)"
_TILE_Y = f"CAST(greatest(least(floor((1.0 - {_MERC} / pi()) / 2.0 * 4), 3), 0) AS BIGINT)"
# geohash p=1: lon_bits=3, lat_bits=2; v interleaves lon-first (MSB) into
# bit positions 4,2,0 and lat into 3,1 — identical to aggs_dsl's layout
_GX = "CAST(greatest(least(floor((glon + 180.0) / 360.0 * 8), 7), 0) AS BIGINT)"
_GY = "CAST(greatest(least(floor((glat + 90.0) / 180.0 * 4), 3), 0) AS BIGINT)"
_GV = (
    "((CASE WHEN (gx & 4) > 0 THEN 16 ELSE 0 END)"
    " + (CASE WHEN (gx & 2) > 0 THEN 4 ELSE 0 END)"
    " + (CASE WHEN (gx & 1) > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN (gy & 2) > 0 THEN 8 ELSE 0 END)"
    " + (CASE WHEN (gy & 1) > 0 THEN 2 ELSE 0 END))"
)
_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"


def _cust_points(spark, sf_dir):
    """customer frame with the geo-corpus derived struct(lat, lon) point
    (the Spark twin of _PTS_SQL) — shared by every geo query here."""
    return tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        F.struct(
            ((F.col("c_custkey") % 180) - 89.5).alias("lat"),
            (((F.col("c_custkey") * 7) % 360) - 179.5).alias("lon"),
        ).alias("location"),
    )



@query(
    "query_dsl_geo_grid",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), cells AS (
  SELECT c_custkey, {_TILE_X} AS tx, {_TILE_Y} AS ty, {_GX} AS gx, {_GY} AS gy
  FROM pts
), flags AS (
  SELECT c_custkey,
         (tx = 2 AND ty = 2) AS in_tile,
         (substr('{_ALPHA}', CAST({_GV} AS INT) + 1, 1) = 'h') AS in_hash
  FROM cells
)
SELECT c_custkey, in_tile, in_hash
FROM flags
WHERE in_tile OR in_hash
ORDER BY c_custkey
""",
)
def query_dsl_geo_grid(spark, sf_dir):
    """ES 8.x ``geo_grid`` query (geotile + geohash cell membership,
    query_dsl._geo_grid): match customers whose derived geo_point lands
    in Web-Mercator tile 2/2/2 or base32 geohash cell 'h'.  The clause
    compiles the SAME cell-key Column math the grid aggs use, so a
    geo_grid query for a bucket key returns exactly that bucket — the
    consistency contract ES documents between geo_grid and the grid
    aggs.  The oracle re-derives both cell assignments arithmetically
    (shared IEEE-double expression text, like the geotile/geohash agg
    oracles)."""
    pts = _cust_points(spark, sf_dir)
    in_tile = compile_query({"geo_grid": {"location": {"geotile": "2/2/2"}}})
    in_hash = compile_query({"geo_grid": {"location": {"geohash": "h"}}})
    return (
        pts.withColumn("in_tile", in_tile)
        .withColumn("in_hash", in_hash)
        .filter(F.col("in_tile") | F.col("in_hash"))
        .select("c_custkey", "in_tile", "in_hash")
        .orderBy("c_custkey")
    )


@query(
    "esql_lookup_join_multikey",
    oracle="""
WITH rates AS (
  SELECT n_nationkey % 5 AS region_bucket,
         CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
         min(n_name) AS rep_nation
  FROM nation
  GROUP BY 1, 2
), cust AS (
  SELECT c_custkey,
         c_nationkey % 5 AS region_bucket,
         CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
  FROM customer
  WHERE c_custkey <= 200
)
SELECT c.c_custkey, c.region_bucket, c.parity, r.rep_nation
FROM cust c LEFT JOIN rates r
  ON c.region_bucket = r.region_bucket AND c.parity = r.parity
ORDER BY c.c_custkey
""",
)
def esql_lookup_join_multikey(spark, sf_dir):
    """ES|QL 8.19+ multi-key ``LOOKUP JOIN idx ON k1, k2`` (esql.py
    LOOKUP command): every ON column equi-matches and the broadcast
    lookup side overwrites same-named non-key columns.  The lookup frame
    is aggregated one-row-per-key so the left join is row-preserving —
    the same single-shard lookup-index shape ES requires."""
    from elasticsearch_hadoop_spark.esql import esql

    nation = tbl(spark, sf_dir, "nation")
    cust = tbl(spark, sf_dir, "customer")
    rates = (
        nation.groupBy(
            (F.col("n_nationkey") % 5).alias("region_bucket"),
            F.when(F.col("n_nationkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
        )
        .agg(F.min("n_name").alias("rep_nation"))
    )
    c = cust.filter(F.col("c_custkey") <= 200).select(
        "c_custkey",
        (F.col("c_nationkey") % 5).alias("region_bucket"),
        F.when(F.col("c_custkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )
    return esql(
        "FROM c | LOOKUP JOIN rates ON region_bucket, parity"
        " | SORT c_custkey | KEEP c_custkey, region_bucket, parity, rep_nation",
        tables={"c": c, "rates": rates},
    )


@query(
    "writepath_shrink_split",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(6 AS BIGINT) AS src_shards,
       CAST(3 AS BIGINT) AS shrink_shards,
       CAST(6 AS BIGINT) AS split_shards,
       CAST(3 AS BIGINT) AS clone_shards
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def writepath_shrink_split(spark, sf_dir):
    """ES ``_shrink`` / ``_split`` / ``_clone`` round trip
    (catalog.shrink_index/split_index/clone_index): events written as a
    6-file index, shrunk 6->3 (coalesce — merge without shuffle, ES's
    hard-link analogue), split 3->6 (round-robin repartition, ES's
    hash-split), cloned (byte copy).  The returned frame carries BOTH the
    per-type doc counts read back from the final split target (row
    preservation through every rewrite) and the observed data-file counts
    (the shard-count arithmetic), so a lost row, a wrong factor check, or
    a layout drift all hash-mismatch."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir

    cat = Catalog(spark, _workdir(sf_dir, "shrink_split"))
    ev = tbl(spark, sf_dir, "events").select("event_id", "event_type")
    cat.write_index(ev.repartition(6), "ev", mode="overwrite")
    shrink = cat.shrink_index("ev", "ev_small", 3)
    cat.split_index("ev_small", "ev_wide", 6)
    clone = cat.clone_index("ev_small", "ev_copy")
    counts = (
        cat.read_index("ev_wide")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.select(
        "event_type",
        "cnt",
        F.lit(shrink["source_shards"]).cast("long").alias("src_shards"),
        F.lit(cat._data_file_count("ev_small")).cast("long").alias("shrink_shards"),
        F.lit(cat._data_file_count("ev_wide")).cast("long").alias("split_shards"),
        F.lit(clone["target_shards"]).cast("long").alias("clone_shards"),
    ).orderBy("event_type")


@query(
    "writepath_field_caps_query",
    oracle="""
SELECT * FROM (VALUES
  ('event_id',   'long',    TRUE, TRUE, ''),
  ('event_type', 'keyword', TRUE, TRUE, ''),
  ('metric',     'double',  TRUE, TRUE, 'fc-orders'),
  ('metric',     'long',    TRUE, TRUE, 'fc-events'),
  ('user_id',    'long',    TRUE, TRUE, '')
) AS t(field, es_type, searchable, aggregatable, conflict_indices)
ORDER BY field, es_type
""",
)
def writepath_field_caps_query(spark, sf_dir):
    """ES ``_field_caps`` (catalog.field_caps): two indices written with
    an agreeing field set plus one deliberate type conflict (``metric``
    is long in fc-events, double in fc-orders); the capability map merges
    across the ``fc-*`` pattern, conflicting fields carry their per-type
    indices list and agreed fields omit it (ES's exact shape).  A pure
    metadata pass — no rows are read to answer; the frame is the
    flattened caps map (bounded: O(#fields), driver-side by design)."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir

    cat = Catalog(spark, _workdir(sf_dir, "field_caps"))
    ev = tbl(spark, sf_dir, "events")
    orders = tbl(spark, sf_dir, "orders")
    cat.write_index(
        ev.select("event_id", "event_type", "user_id",
                  F.col("event_id").alias("metric")).limit(100),
        "fc-events", mode="overwrite",
    )
    cat.write_index(
        orders.select(F.col("o_orderkey").alias("event_id"),
                      F.lit("order").alias("event_type"),
                      F.col("o_custkey").alias("user_id"),
                      F.col("o_totalprice").cast("double").alias("metric")).limit(100),
        "fc-orders", mode="overwrite",
    )
    caps = cat.field_caps("fc-*")
    rows = [
        (fname, ftype, cap["searchable"], cap["aggregatable"],
         ",".join(cap.get("indices", [])))
        for fname, types in caps["fields"].items()
        for ftype, cap in types.items()
    ]
    return (
        spark.createDataFrame(
            rows,
            "field string, es_type string, searchable boolean, "
            "aggregatable boolean, conflict_indices string",
        ).orderBy("field", "es_type")
    )


def _bit_word_sql(lo: int) -> str:
    """Unrolled 32-bit sign-bit pack of embedding[lo+1..lo+32] (DuckDB
    1-based lists), bit value as a literal integer — the SQL twin of
    operators.similarity.pack_sign_bits."""
    terms = " + ".join(
        f"(CASE WHEN embedding[{lo + i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


@query(
    "similarity_hamming_bit",
    oracle=f"""
WITH packed AS (
  SELECT vec_id, {_bit_word_sql(0)} AS w0, {_bit_word_sql(32)} AS w1
  FROM embeddings
), q AS (
  SELECT w0 AS qw0, w1 AS qw1 FROM packed WHERE vec_id = 0
)
SELECT p.vec_id,
       CAST(bit_count(xor(p.w0, q.qw0)) + bit_count(xor(p.w1, q.qw1)) AS BIGINT) AS hamming
FROM packed p CROSS JOIN q
ORDER BY hamming, p.vec_id
LIMIT 10
""",
)
def similarity_hamming_bit(spark, sf_dir):
    """ES 8.14+ bit-vector knn (dense_vector element_type "bit", hamming
    similarity — operators.similarity.pack_sign_bits / hamming_topk):
    sign-binarize the 64-d embeddings into two 32-bit words and take the
    hamming top-10 to vec_id 0's bits via popcount(xor) — 32× less IO
    than float32 and pure integer ALU work, the cheapest 100 TB
    candidate stage.  Both stages are TakeOrderedAndProject; the oracle
    replays the identical packing with unrolled integer bit values."""
    from elasticsearch_hadoop_spark.operators.similarity import hamming_topk

    e = tbl(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row[0]]
    return hamming_topk(e, qv, k=10)


_RING_DIST = """2 * 6371.0088 * asin(sqrt(
    pow(sin((radians(20.0) - radians(glat)) / 2), 2)
    + cos(radians(glat)) * cos(radians(20.0))
      * pow(sin((radians(30.0) - radians(glon)) / 2), 2)
))""".strip()


@query(
    "aggs_geo_distance_rings",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), d AS (
  SELECT p.c_custkey, c.c_acctbal, {_RING_DIST} AS dist
  FROM pts p JOIN customer c USING (c_custkey)
)
SELECT CASE WHEN dist < 3000.0 THEN 'near'
            WHEN dist >= 3000.0 AND dist < 7000.0 THEN 'mid'
            ELSE 'far' END AS rings,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(c_acctbal), 2) AS sum_bal
FROM d
GROUP BY 1
ORDER BY rings
""",
)
def aggs_geo_distance_rings(spark, sf_dir):
    """ES ``geo_distance`` bucket agg (aggs_dsl._bucket_key kind
    geo_distance): arc-distance rings from origin (20, 30) over the
    geo-corpus customer points — haversine on the mean-radius sphere
    (ES's arc distance), km unit, custom ring keys, sum metric per ring.
    Pure Column math sharing the exact formula text with the DuckDB
    oracle; the ring key doubles as a partition column at scale."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

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
                "rings": {
                    "geo_distance": {
                        "field": "location",
                        "origin": {"lat": 20.0, "lon": 30.0},
                        "unit": "km",
                        "ranges": [
                            {"to": 3000, "key": "near"},
                            {"from": 3000, "to": 7000, "key": "mid"},
                            {"from": 7000, "key": "far"},
                        ],
                    },
                    "aggs": {"sum_bal": {"sum": {"field": "c_acctbal"}}},
                }
            }
        },
    )
    return out.select(
        "rings", "doc_count", F.round("sum_bal", 2).alias("sum_bal")
    ).orderBy("rings")


@query(
    "ingest_attachment",
    oracle="""
SELECT doc_id,
       'text/plain' AS content_type,
       CAST(least(length(text), 120) AS BIGINT) AS content_length,
       substr(text, 1, 40) AS content_head
FROM documents
WHERE doc_id % 4 = 0
ORDER BY doc_id
""",
)
def ingest_attachment(spark, sf_dir):
    """ES ingest-attachment processor (ingest.py kind=attachment): the
    documents' text base64-encoded (the wire form ES receives), decoded
    and extracted by the processor — text/plain detection, content
    truncated at indexed_chars=120, content_length = truncated length
    (ES's truncated view), remove_binary drops the base64 source.  Tika
    formats (PDF/ZIP) sniff content_type from magic bytes with NULL
    content — exercised in unit tests; this corpus query proves the text
    path end-to-end against the un-encoded source."""
    from elasticsearch_hadoop_spark.ingest import compile_pipeline

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    staged = docs.select("doc_id", F.base64(F.col("text").cast("binary")).alias("data"))
    fn = compile_pipeline(
        [{"attachment": {"field": "data", "indexed_chars": 120, "remove_binary": True}}]
    )
    out = fn(staged)
    return out.select(
        "doc_id",
        F.col("attachment.content_type").alias("content_type"),
        F.col("attachment.content_length").alias("content_length"),
        F.substring(F.col("attachment.content"), 1, 40).alias("content_head"),
    ).orderBy("doc_id")


@query(
    "esql_enrich_stats",
    oracle="""
SELECT n.n_name, CAST(count(*) AS BIGINT) AS cnt,
       round(avg(c.c_acctbal), 6) AS avg_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""",
)
def esql_enrich_stats(spark, sf_dir):
    """ES|QL ``ENRICH policy ON col WITH field`` (esql.py ENRICH
    command): the nation policy frame (first column = match field, like
    an enrich policy declaration) broadcast-joins onto customers, then
    STATS ... BY the enriched column.  Every nation key is unique so the
    min-struct dedupe is a no-op and the left join is row-preserving —
    the oracle is the plain join+group."""
    from elasticsearch_hadoop_spark.esql import esql

    nation = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    out = esql(
        "FROM c | ENRICH natpol ON c_nationkey WITH n_name"
        " | STATS cnt = COUNT(*), avg_bal = AVG(c_acctbal) BY n_name"
        " | SORT n_name",
        tables={"c": cust},
        enrich_policies={"natpol": nation},
    )
    return out.select("n_name", "cnt", F.round("avg_bal", 6).alias("avg_bal"))


@query(
    "esql_mv_expand_tokens",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM documents
  WHERE doc_id % 10 = 3
)
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM toks
WHERE length(tok) > 5
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 25
""",
)
def esql_mv_expand_tokens(spark, sf_dir):
    """ES|QL ``MV_EXPAND`` (esql.py MV_EXPAND command — one row per
    multivalue element, Spark explode): SPLIT the document text into a
    multivalue, expand, filter long tokens, STATS count BY token, top 25
    by (count desc, token).  The oracle unnests the identical split."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 3)
    return esql(
        "FROM d | EVAL tok = SPLIT(text, \" \") | MV_EXPAND tok"
        " | WHERE LENGTH(tok) > 5 | STATS n = COUNT(*) BY tok"
        " | SORT n DESC, tok | LIMIT 25 | KEEP tok, n",
        tables={"d": docs},
    )


@query(
    "aggs_missing_bucket",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 6) AS sum_value
FROM events
WHERE user_id % 7 = 0
GROUP BY event_type
ORDER BY event_type
""",
)
def aggs_missing_bucket(spark, sf_dir):
    """ES ``missing`` bucket agg (aggs_dsl kind=missing): documents
    WITHOUT the field bucket together, here with a nested terms ladder
    and metrics inside — the null-audit idiom.  The input frame nullifies
    user_id on a deterministic subset (the fixtures carry no nulls), so
    the missing bucket is exactly that subset."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    ev = tbl(spark, sf_dir, "events").withColumn(
        "user_id", F.when(F.col("user_id") % 7 != 0, F.col("user_id"))
    )
    out = compile_aggs(
        ev,
        {
            "aggs": {
                "no_user": {
                    "missing": {"field": "user_id"},
                    "aggs": {
                        "by_type": {
                            "terms": {"field": "event_type", "size": 10},
                            "aggs": {"sum_value": {"sum": {"field": "value"}}},
                        }
                    },
                }
            }
        },
    )
    return out.select(
        F.col("by_type").alias("event_type"),
        "doc_count",
        F.round("sum_value", 6).alias("sum_value"),
    ).orderBy("event_type")


@query(
    "esql_change_point",
    oracle="""
WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         sum(value + CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                          THEN 50.0::DOUBLE ELSE 0.0::DOUBLE END) AS total
  FROM events GROUP BY 1
),
s AS (
  SELECT day, total,
         row_number() OVER w AS rn,
         sum(total) OVER w AS ps,
         sum(total * total) OVER w AS pss,
         count(*) OVER () AS n,
         sum(total) OVER () AS ts_,
         sum(total * total) OVER () AS tss,
         lead(day) OVER w AS nxt
  FROM b WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
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
  SELECT nxt, tt FROM t ORDER BY tt DESC NULLS LAST, day LIMIT 1
)
SELECT b.day, round(b.total, 6) AS total,
       (SELECT nxt FROM w) AS cp_key,
       round((SELECT tt FROM w), 6) AS cp_score
FROM b ORDER BY day
""",
)
def esql_change_point(spark, sf_dir):
    """ES|QL ``CHANGE_POINT value ON key`` (esql.py CHANGE_POINT — the
    Welch-t step detector shared with the change_point sibling agg,
    aggs_dsl.change_point_stats): daily revenue with an injected +50/
    event level shift from Jan 16, aggregated INSIDE the ES|QL pipeline
    (STATS ... BY day) and scored by the command — the winning split's
    first-after day + |t| repeat on every row, exactly the agg twin's
    contract but through the query-language path."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = (
        tbl(spark, sf_dir, "events")
        .withColumn(
            "value",
            F.col("value")
            + F.when(
                F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"), 50.0
            ).otherwise(0.0),
        )
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .select("day", "value")
    )
    out = esql(
        "FROM e | STATS total = SUM(value) BY day"
        " | CHANGE_POINT total ON day | SORT day"
        " | KEEP day, total, cp_key, cp_score",
        tables={"e": ev},
    )
    return out.select(
        "day",
        F.round("total", 6).alias("total"),
        "cp_key",
        F.round("cp_score", 6).alias("cp_score"),
    )


@query(
    "esql_fuse_rrf",
    oracle="""
WITH docs AS (
  SELECT doc_id AS _id, n_chars::DOUBLE AS s1,
         (length(text) % 97)::DOUBLE AS s2, source
  FROM documents WHERE text IS NOT NULL
), b1 AS (
  SELECT _id, s1 AS _score, source FROM docs ORDER BY s1 DESC, _id LIMIT 40
), b2 AS (
  SELECT _id, s2 AS _score, source FROM docs ORDER BY s2 DESC, _id LIMIT 40
), forked AS (
  SELECT 'fork1' AS _fork, * FROM b1
  UNION ALL
  SELECT 'fork2' AS _fork, * FROM b2
), contrib AS (
  SELECT _id, source,
         1.0 / (10 + row_number()
                OVER (PARTITION BY _fork ORDER BY _score DESC, _id)) AS c
  FROM forked
)
SELECT _id, round(SUM(c), 6)::DOUBLE AS _score, max(source) AS source
FROM contrib
GROUP BY _id
ORDER BY round(SUM(c), 6) DESC, _id
LIMIT 25
""",
)
def esql_fuse_rrf(spark, sf_dir):
    """ES|QL 8.19+ ``FUSE rrf`` (esql._fuse): two FORK branches rank the
    documents corpus by different relevance signals (char count vs a
    text-length hash), each truncated to its own top-40, then reciprocal
    -rank fusion (1/(rank_constant + rank) per branch, summed by _id)
    produces one ranked list; the non-score ``source`` column survives
    via the documented max-merge.  The oracle replays the same two
    bounded top-k lists and the same per-branch ranking (score desc,
    _id tiebreak) in SQL."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("_id"), "text", "n_chars", "source")
    )
    out = esql(
        "FROM docs"
        " | FORK (EVAL _score = TO_DOUBLE(n_chars)"
        "         | SORT _score DESC, _id | LIMIT 40 | KEEP _id, _score, source)"
        "        (EVAL _score = TO_DOUBLE(LENGTH(text) % 97)"
        "         | SORT _score DESC, _id | LIMIT 40 | KEEP _id, _score, source)"
        " | FUSE rrf WITH rank_constant=10"
        " | EVAL _score = ROUND(_score, 6)"
        " | SORT _score DESC, _id | LIMIT 25"
        " | KEEP _id, _score, source",
        tables={"docs": docs},
    )
    return out


@query(
    "esql_fuse_linear_minmax",
    oracle="""
WITH docs AS (
  SELECT doc_id AS _id, n_chars::DOUBLE AS s1,
         (length(text) % 97)::DOUBLE AS s2
  FROM documents WHERE text IS NOT NULL
), b1 AS (
  SELECT _id, s1 AS _score FROM docs ORDER BY s1 DESC, _id LIMIT 40
), b2 AS (
  SELECT _id, s2 AS _score FROM docs ORDER BY s2 DESC, _id LIMIT 40
), forked AS (
  SELECT 'fork1' AS _fork, * FROM b1
  UNION ALL
  SELECT 'fork2' AS _fork, * FROM b2
), contrib AS (
  SELECT _id,
         CASE WHEN max(_score) OVER w > min(_score) OVER w
              THEN (_score - min(_score) OVER w)
                   / (max(_score) OVER w - min(_score) OVER w)
              ELSE 1.0 END AS c
  FROM forked WINDOW w AS (PARTITION BY _fork)
)
SELECT _id, round(SUM(c), 6)::DOUBLE AS _score
FROM contrib
GROUP BY _id
ORDER BY round(SUM(c), 6) DESC, _id
LIMIT 25
""",
)
def esql_fuse_linear_minmax(spark, sf_dir):
    """ES|QL ``FUSE linear WITH normalizer=minmax`` (esql._fuse): the
    same two FORK top-40 branches, fused by summing each branch's
    min-max-normalized score (constant branch -> 1.0, ES's convention)
    instead of reciprocal ranks.  Exercises the normalizer option
    parsing and the per-branch window min/max path; the oracle computes
    the identical normalization with SQL window functions."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("_id"), "text", "n_chars")
    )
    out = esql(
        "FROM docs"
        " | FORK (EVAL _score = TO_DOUBLE(n_chars)"
        "         | SORT _score DESC, _id | LIMIT 40 | KEEP _id, _score)"
        "        (EVAL _score = TO_DOUBLE(LENGTH(text) % 97)"
        "         | SORT _score DESC, _id | LIMIT 40 | KEEP _id, _score)"
        " | FUSE linear WITH normalizer=minmax"
        " | EVAL _score = ROUND(_score, 6)"
        " | SORT _score DESC, _id | LIMIT 25"
        " | KEEP _id, _score",
        tables={"docs": docs},
    )
    return out


@query(
    "writepath_index_sorted_scan",
    oracle="""
SELECT event_id, user_id, event_type, round(value, 6)::DOUBLE AS value
FROM events
WHERE user_id BETWEEN 3 AND 5
ORDER BY event_id
""",
)
def writepath_index_sorted_scan(spark, sf_dir):
    """ES ``index.sort.field`` on write (catalog.write_index — template
    settings resolve to a sortWithinPartitions before the sink, the ES
    per-segment sort analogue; no cross-partition shuffle, unlike
    z-order): events land clustered by user_id, then a narrow user_id
    range scan reads them back intact.  Scale: the sort key's parquet
    row-group min/max spans shrink by ~the groups-per-file factor
    (pinned in tests/test_zorder.py), so this exact scan prunes row
    groups at 100 TB while the range predicate pushes to the scan."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir

    root = _workdir(sf_dir, "index_sorted_scan")
    cat = Catalog(spark, root)
    cat.put_index_template(
        "sorted-events",
        {
            "index_patterns": ["sorted-*"],
            "priority": 10,
            "template": {"settings": {"index.sort.field": "user_id"}},
        },
    )
    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    cat.write_index(ev.repartition(4), "sorted-ev", mode="overwrite")
    out = cat.read_index("sorted-ev").filter(F.col("user_id").between(3, 5))
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
    ).orderBy("event_id")


# orders-derived geo points for the parent/child x geo_grid composition
_OPTS_SQL = """
  SELECT o_orderkey,
         CAST((o_orderkey % 180) - 89.5 AS DOUBLE) AS glat,
         CAST(((o_orderkey * 7) % 360) - 179.5 AS DOUBLE) AS glon
  FROM orders
"""


@query(
    "aggs_geotile_children",
    oracle=f"""
WITH opts AS ({_OPTS_SQL}
), cells AS (
  SELECT o_orderkey,
         '2/' || CAST({_TILE_X} AS VARCHAR) || '/' || CAST({_TILE_Y} AS VARCHAR) AS cell
  FROM opts
), j AS (
  SELECT c.cell, l.l_quantity
  FROM cells c JOIN lineitem l ON l.l_orderkey = c.o_orderkey
)
SELECT cell, CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(l_quantity), 6)::DOUBLE AS sum_qty
FROM j
GROUP BY cell
ORDER BY cell
""",
)
def aggs_geotile_children(spark, sf_dir):
    """geo_grid cells as the ENCLOSING key of a `children` context
    switch (aggs_dsl geotile_grid + children): parent orders carry a
    geo_point, bucket them by Web-Mercator tile at zoom 2, then switch
    to their `line` children inside each cell and sum the child
    quantity.  Exercises the keyed-bucket children path (outer keys
    materialized BEFORE the join-field switch) with a computed geo cell
    key rather than a stored column — ES's geotile_grid -> children
    composition.  The oracle re-derives the tile arithmetic with the
    shared IEEE-double expression text."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    o = tbl(spark, sf_dir, "orders").select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("_id"),
        F.struct(
            F.lit("order").alias("name"),
            F.lit(None).cast("string").alias("parent"),
        ).alias("join_field"),
        F.struct(
            ((F.col("o_orderkey") % 180) - 89.5).alias("lat"),
            (((F.col("o_orderkey") * 7) % 360) - 179.5).alias("lon"),
        ).alias("location"),
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
        F.lit(None)
        .cast("struct<lat:double,lon:double>")
        .alias("location"),
        F.col("l_quantity").cast("double").alias("quantity"),
    )
    df = o.unionByName(l)
    out = compile_aggs(
        df.filter(F.col("join_field.name") == "order"),
        {"cells": {
            "geotile_grid": {"field": "location", "precision": 2},
            "aggs": {"lines": {
                "children": {"type": "line"},
                "aggs": {"sum_qty": {"sum": {"field": "quantity"}}},
            }},
        }},
        base_df=df,
    )
    return out.select(
        F.col("cells").alias("cell"),
        "doc_count",
        F.round("sum_qty", 6).alias("sum_qty"),
    ).orderBy("cell")


@query(
    "esql_ts_rate",
    oracle="""
WITH base AS (
  SELECT user_id % 4 AS host, ts, value FROM events
), lagged AS (
  SELECT host, date_trunc('day', ts) AS tb, ts, value,
         lag(value) OVER (PARTITION BY host, date_trunc('day', ts)
                          ORDER BY ts, value) AS prev
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
SELECT strftime(tb, '%Y-%m-%d') AS day,
       round(max(CASE WHEN span > 0 THEN inc / span END), 6)::DOUBLE AS max_rate,
       round(avg(CASE WHEN span > 0 THEN inc / span END), 6)::DOUBLE AS avg_rate
FROM series
GROUP BY tb
ORDER BY day
""",
)
def esql_ts_rate(spark, sf_dir):
    """ES|QL 9.x ``TS`` + ``RATE()`` (esql._stats_ts): treat events as a
    4-series counter TSDS (host = user_id % 4 is the dimension), compute
    the per-series per-day counter rate — sum of sample increases with
    Prometheus/ES counter-reset handling (a drop contributes the
    post-reset value), divided by the series' observed seconds — then
    MAX and AVG across series per day.  The oracle replays the identical
    lag-window arithmetic; fractional epoch seconds are kept on both
    sides."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("host"), "ts", "value"
    )
    out = esql(
        "TS ev | STATS max_rate = MAX(RATE(value)),"
        " avg_rate = AVG(RATE(value))"
        ' BY tb = BUCKET(ts, "1 day")',
        tables={"ev": ev},
        time_series={"ev": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    return out.select(
        F.date_format("tb", "yyyy-MM-dd").alias("day"),
        F.round("max_rate", 6).alias("max_rate"),
        F.round("avg_rate", 6).alias("avg_rate"),
    ).orderBy("day")


@query(
    "esql_ts_over_time",
    oracle="""
WITH s AS (
  SELECT event_type, user_id, date_trunc('day', ts) AS tb,
         max(value) AS mx, min(value) AS mn,
         avg(value) AS av, count(value) AS c
  FROM events
  GROUP BY 1, 2, 3
)
SELECT strftime(tb, '%Y-%m-%d') AS day,
       round(max(mx), 6)::DOUBLE AS hi,
       round(min(mn), 6)::DOUBLE AS lo,
       round(avg(av), 6)::DOUBLE AS mean_series,
       CAST(sum(c) AS BIGINT) AS n
FROM s
GROUP BY tb
ORDER BY day
""",
)
def esql_ts_over_time(spark, sf_dir):
    """ES|QL 9.x ``*_OVER_TIME`` gauge aggregations (esql._stats_ts):
    (event_type, user_id) is the dimension tuple; per series and day the
    inner max/min/avg/count evaluate, then the outer aggregate combines
    series within the day — the two-stage shape that makes AVG(AVG_OVER_
    TIME(v)) a mean of series means, NOT a row mean (the distinction the
    TS command exists for).  One window-free double aggregation on both
    sides."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id", "ts", "value")
    out = esql(
        "TS ev | STATS hi = MAX(MAX_OVER_TIME(value)),"
        " lo = MIN(MIN_OVER_TIME(value)),"
        " mean_series = AVG(AVG_OVER_TIME(value)),"
        " n = SUM(COUNT_OVER_TIME(value))"
        ' BY tb = BUCKET(ts, "1 day")',
        tables={"ev": ev},
        time_series={
            "ev": {"dimensions": ["event_type", "user_id"], "timestamp": "ts"}
        },
    )
    return out.select(
        F.date_format("tb", "yyyy-MM-dd").alias("day"),
        F.round("hi", 6).alias("hi"),
        F.round("lo", 6).alias("lo"),
        F.round("mean_series", 6).alias("mean_series"),
        F.col("n").cast("long").alias("n"),
    ).orderBy("day")


@query(
    "esql_fn_hash_ip",
    oracle="""
WITH e AS (
  SELECT '10.' || CAST(user_id % 200 AS VARCHAR) || '.' ||
         CAST(CAST((event_id % 250) // 16 AS BIGINT) * 16 AS VARCHAR) ||
         '.0' AS net
  FROM events
), g AS (
  SELECT net, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY net
)
SELECT net, n, sha256(net) AS sig,
       decode(from_base64(to_base64(encode(net)))) AS rt
FROM g
ORDER BY net
""",
)
def esql_fn_hash_ip(spark, sf_dir):
    """ES|QL 8.17+ scalar functions IP_PREFIX / HASH / SHA256 /
    FROM_BASE64 / TO_BASE64 / SPACE (esql._rewrite_misc_funcs): derive a
    synthetic IPv4 per event, roll events up by the /20 network address
    (pure integer floor-div SQL — no UDF), then digest each network key
    and round-trip it through base64.  The oracle computes the /20
    arithmetic directly and uses DuckDB's own digest/base64 functions —
    any drift in the rewrite's math or encoding hash-mismatches."""
    from elasticsearch_hadoop_spark.esql import esql

    ev = tbl(spark, sf_dir, "events").select("event_id", "user_id")
    return esql(
        "FROM ev"
        ' | EVAL ip = CONCAT("10.", TO_STRING(user_id % 200), ".",'
        '   TO_STRING(event_id % 250), ".9")'
        " | EVAL net = IP_PREFIX(ip, 20, 64)"
        " | STATS n = COUNT(*) BY net"
        ' | EVAL sig = HASH("sha256", net), rt = FROM_BASE64(TO_BASE64(net))'
        " | KEEP net, n, sig, rt"
        " | SORT net",
        tables={"ev": ev},
    )


@query(
    "aggs_random_sampler",
    oracle="""
WITH s AS (
  SELECT lang, n_chars FROM documents
  WHERE CAST(concat('0x', substr(md5(concat('11:',
          CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
        < CAST(0.25 * 1152921504606846976 AS BIGINT)
)
SELECT lang,
       CAST(round(count(*) * 4.0, 0) AS BIGINT) AS doc_count,
       round(sum(n_chars) * 4.0, 6)::DOUBLE AS total_chars,
       round(avg(n_chars), 6)::DOUBLE AS mean_chars
FROM s
GROUP BY lang
ORDER BY lang
""",
)
def aggs_random_sampler(spark, sf_dir):
    """ES ``random_sampler`` agg (8.2+, aggs_dsl): a seeded 25%
    hash-threshold sample of the documents corpus (the md5 60-bit space
    shared with operators/sampling — the oracle replays the exact
    sample), terms by lang inside it; doc_count and the sum metric are
    scaled back up by 1/probability while avg stays unscaled — ES's
    scaling model for count-like vs location metrics.  At 100 TB the
    sample predicate rides the scan: no shuffle, no RNG state, and the
    sampled aggregation touches 1/4 of the rows."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    docs = tbl(spark, sf_dir, "documents")
    out = compile_aggs(
        docs,
        {"samp": {
            "random_sampler": {
                "probability": 0.25, "seed": 11, "seed_field": "doc_id",
            },
            "aggs": {"by_lang": {
                "terms": {"field": "lang", "size": 100},
                "aggs": {
                    "total_chars": {"sum": {"field": "n_chars"}},
                    "mean_chars": {"avg": {"field": "n_chars"}},
                },
            }},
        }},
    )
    return out.select(
        F.col("by_lang").alias("lang"),
        "doc_count",
        F.round("total_chars", 6).alias("total_chars"),
        F.round("mean_chars", 6).alias("mean_chars"),
    ).orderBy("lang")


@query(
    "writepath_ccr_follow",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(2 AS BIGINT) AS leader_version
FROM events
WHERE event_id <= 600
GROUP BY event_type
ORDER BY event_type
""",
)
def writepath_ccr_follow(spark, sf_dir):
    """ES CCR follow/poll round trip (catalog.follow_index/ccr_poll over
    the manifest log): a transactional leader gets a bootstrap batch
    (event_id <= 400), a follower in a DIFFERENT catalog root follows it,
    the leader appends a second batch (400 < id <= 600), one poll ships
    only the new immutable data dirs (no row rewrite), and the follower
    read returns the union.  The counts come from the FOLLOWER; the
    leader version pins the two-commit history.  A missed dir, a double
    copy, or a broken manifest swap all hash-mismatch."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir

    root = _workdir(sf_dir, "ccr_follow")
    leader = Catalog(spark, os.path.join(root, "leader"), transactional=True)
    follower = Catalog(spark, os.path.join(root, "follower"), transactional=True)
    ev = tbl(spark, sf_dir, "events").select("event_id", "event_type")
    leader.write_index(
        ev.filter(F.col("event_id") <= 400), "logs", mode="overwrite"
    )
    follower.follow_index(leader, "logs", "logs-copy")
    leader.write_index(
        ev.filter((F.col("event_id") > 400) & (F.col("event_id") <= 600)), "logs"
    )
    st = follower.ccr_poll("logs-copy")
    assert st["synced"] is True
    return (
        follower.read_index("logs-copy")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            "event_type",
            "cnt",
            F.lit(st["leader_version"]).cast("long").alias("leader_version"),
        )
        .orderBy("event_type")
    )


# shared haversine-meter expression text (IUGG mean radius, 2R in meters)
_HAV_M = (
    "12742017.6 * asin(sqrt("
    "pow(sin((radians({blat}) - radians(glat)) / 2), 2)"
    " + cos(radians(glat)) * cos(radians({blat}))"
    " * pow(sin((radians({blon}) - radians(glon)) / 2), 2)))"
)


@query(
    "esql_st_distance",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), d AS (
  SELECT c_custkey,
         {_HAV_M.format(blat="10.0", blon="20.0")} AS dist_m
  FROM pts
)
SELECT c_custkey, round(dist_m, 6)::DOUBLE AS dist_m
FROM d
WHERE dist_m < 4000000.0
ORDER BY c_custkey
""",
)
def esql_st_distance(spark, sf_dir):
    """ES|QL spatial functions (esql._rewrite_misc_funcs ST_DISTANCE /
    TO_GEOPOINT): customers whose derived geo_point lies within 4,000 km
    of an anchor point, with the haversine-meter distance returned.  The
    rewrite emits the SAME IUGG mean-radius formula functions/geo.py
    uses, and the oracle restates the identical expression text — shared
    IEEE-double arithmetic, like every geo oracle in the corpus.  Pure
    codegen: the distance predicate rides the scan at any corpus size."""
    from elasticsearch_hadoop_spark.esql import esql

    c = _cust_points(spark, sf_dir)
    return esql(
        "FROM c"
        ' | EVAL dist_m = ST_DISTANCE(location, TO_GEOPOINT("POINT(20.0 10.0)"))'
        " | WHERE dist_m < 4000000.0"
        " | EVAL dist_m = ROUND(dist_m, 6)"
        " | KEEP c_custkey, dist_m"
        " | SORT c_custkey",
        tables={"c": c},
    )


# Web-Mercator tile fraction text for tile z=1,x=1,y=0 over the derived
# customer points (same clamp + formula text as the geotile oracles)
_FX_110 = "((glon + 180.0) / 360.0 * 2 - 1)"
_FY_110 = f"((1.0 - {_MERC} / pi()) / 2.0 * 2 - 0)"
# clamped global geotile indices (the shared geotile_cell_xy arithmetic):
# membership in tile z/x/y is INDEX EQUALITY, like the geotile_grid agg
_GTX1 = "CAST(least(floor((glon + 180.0) / 360.0 * 2), 1) AS BIGINT)"
_GTY1 = f"CAST(greatest(least(floor((1.0 - {_MERC} / pi()) / 2.0 * 2), 1), 0) AS BIGINT)"
_GTX4 = "CAST(least(floor((glon + 180.0) / 360.0 * 16), 15) AS BIGINT)"
_GTY4 = f"CAST(greatest(least(floor((1.0 - {_MERC} / pi()) / 2.0 * 16), 15), 0) AS BIGINT)"


@query(
    "search_mvt_hits",
    oracle=f"""
WITH pts AS ({_PTS_SQL}
), f AS (
  SELECT c_custkey, {_FX_110} AS fx, {_FY_110} AS fy,
         {_GTX1} AS gx, {_GTY1} AS gy
  FROM pts
)
SELECT c_custkey,
       CAST(greatest(least(floor(fx * 4096), 4095), 0) AS BIGINT) AS px,
       CAST(greatest(least(floor(fy * 4096), 4095), 0) AS BIGINT) AS py
FROM f
WHERE gx = 1 AND gy = 0
ORDER BY c_custkey
""",
)
def search_mvt_hits(spark, sf_dir):
    """ES ``_mvt`` hits layer (mvt.mvt_hits): customers whose derived
    geo_point falls inside slippy tile 1/1/0 (geotile cell equality — the agg's own\n    membership rule), re-projected to tile-local
    integer pixels in [0, 4096) — the Web-Mercator forward projection
    shifted to the tile origin, MVT's coordinate contract.  The envelope
    filter and projection are one codegen pass; the oracle restates the
    identical fraction/floor text (shared IEEE doubles, like the geotile
    oracles)."""
    from elasticsearch_hadoop_spark.mvt import mvt_hits

    c = _cust_points(spark, sf_dir)
    return mvt_hits(c, "location", 1, 1, 0).orderBy("c_custkey")


@query(
    "search_mvt_grid",
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
)
SELECT cell, CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(glat), 6)::DOUBLE AS centroid_lat,
       round(avg(glon), 6)::DOUBLE AS centroid_lon
FROM cells
GROUP BY cell
ORDER BY cell
""",
)
def search_mvt_grid(spark, sf_dir):
    """ES ``_mvt`` aggs layer (mvt.mvt_grid): the geotile sub-grid of
    tile 1/1/0 at grid_precision 3 (zoom 4 cells), per-cell doc_count +
    centroid — ES's default grid layer.  Cell indices are the GLOBAL
    geotile x/y at z+precision (tile offset + local cell), so the layer
    agrees with a standalone geotile_grid agg at zoom 4 — the
    consistency contract pinned in tests/test_mvt.py.  One envelope
    filter + one hash aggregation."""
    from elasticsearch_hadoop_spark.mvt import mvt_grid

    c = _cust_points(spark, sf_dir)
    out = mvt_grid(c, "location", 1, 1, 0, grid_precision=3)
    return out.select(
        "cell",
        "doc_count",
        F.round("centroid_lat", 6).alias("centroid_lat"),
        F.round("centroid_lon", 6).alias("centroid_lon"),
    ).orderBy("cell")


@query(
    "aggs_composite_missing",
    oracle="""
WITH g AS (
  SELECT nullif(lang, 'en') AS k, CAST(count(*) AS BIGINT) AS doc_count
  FROM documents GROUP BY 1
)
SELECT * FROM (
  SELECT 'first' AS page, k, doc_count
  FROM (SELECT * FROM g ORDER BY k NULLS FIRST LIMIT 3)
  UNION ALL
  SELECT 'last', k, doc_count
  FROM (SELECT * FROM g ORDER BY k NULLS LAST LIMIT 3)
)
ORDER BY page, k NULLS FIRST
""",
)
def aggs_composite_missing(spark, sf_dir):
    """ES composite ``missing_bucket`` + ``missing_order`` (aggs_dsl
    composite sources): 'en' docs become a null key via NULLIF; with
    missing_order=first the null bucket occupies the first page slot,
    with last it falls off a 3-bucket page entirely — the page CONTENT
    difference is what the option controls, and the oracle replays both
    page cuts with SQL NULLS FIRST/LAST.  (Null keys DROP by default,
    ES's missing_bucket=false — covered by unit test.)"""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    docs = tbl(spark, sf_dir, "documents").select(
        F.nullif(F.col("lang"), F.lit("en")).alias("k")
    )

    def page(order):
        return compile_aggs(
            docs,
            {"c": {"composite": {
                "size": 3,
                "sources": [{"k": {"terms": {
                    "field": "k",
                    "missing_bucket": True,
                    "missing_order": order,
                }}}],
            }}},
        ).withColumn("page", F.lit(order))
    out = page("first").unionByName(page("last"))
    return out.select("page", "k", "doc_count").orderBy(
        "page", F.col("k").asc_nulls_first()
    )


@query(
    "esql_knn_where",
    oracle="""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id, label,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)),
             6)::DOUBLE AS _score
FROM embeddings
WHERE label = 1
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) DESC,
         vec_id
LIMIT 12
""",
)
def esql_knn_where(spark, sf_dir):
    """ES|QL 9.x ``WHERE KNN(field, [v...], k)`` (esql._where_knn): the
    label-1 pre-filter applies BEFORE the top-k cut (ES's composition
    rule for AND'ed conjuncts), then the 12 most cosine-similar vectors
    to embeddings[vec_id=0] survive with the similarity as _score.
    Exact brute kNN as a TakeOrderedAndProject; the oracle replays the
    same cut with DuckDB's list_cosine_similarity in doubles."""
    from elasticsearch_hadoop_spark.esql import esql

    emb = tbl(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    vec_txt = ", ".join(repr(v) for v in qv)
    out = esql(
        f"FROM e | WHERE label == 1 AND KNN(embedding, [{vec_txt}], 12)"
        " | EVAL _score = ROUND(_score, 6)"
        " | KEEP vec_id, label, _score"
        " | SORT _score DESC, vec_id",
        tables={"e": emb},
    )
    return out
