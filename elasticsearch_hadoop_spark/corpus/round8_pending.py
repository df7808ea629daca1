"""Round-8 pending corpus queries — built and oracle-parity-proven in
round 7, NOT yet wired into ``load_all`` (the round-7 graded window is
full).  Round 8: add this module to load_all's import list, put the
names at the front of PRIORITY after any verdict re-grades, and delete
the scaffolding test pinning it out
(tests/test_round8_pending.py::test_pending_module_not_wired_into_load_all).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl


@query(
    "ingest_circle_geogrid",
    oracle="""
WITH base AS (
  SELECT event_id,
         ((event_id % 40) - 20) + 0.5::DOUBLE AS cx,
         ((event_id % 30) - 15) + 0.5::DOUBLE AS cy,
         0.5::DOUBLE + (event_id % 3) * 0.5::DOUBLE AS r,
         (event_id % 16)::DOUBLE AS tx,
         (event_id % 12)::DOUBLE AS ty
  FROM events
),
sides AS (
  SELECT *,
         CAST(ceil(2 * pi() / acos(1 - 0.05::DOUBLE / r)) AS BIGINT) AS n
  FROM base
)
SELECT event_id,
       n AS n_sides,
       round(cx + r * cos(2 * pi() / n), 6) AS v1x,
       round(cy + r * sin(2 * pi() / n), 6) AS v1y,
       round(tx / 16 * 360 - 180, 6) AS min_lon,
       round(degrees(atan((exp(pi() * (1 - 2 * (ty + 1) / 16))
                           - exp(-pi() * (1 - 2 * (ty + 1) / 16))) / 2)), 6)
         AS min_lat,
       round((tx + 1) / 16 * 360 - 180, 6) AS max_lon,
       round(degrees(atan((exp(pi() * (1 - 2 * ty / 16))
                           - exp(-pi() * (1 - 2 * ty / 16))) / 2)), 6)
         AS max_lat
FROM sides
ORDER BY event_id
""",
)
def ingest_circle_geogrid(spark, sf_dir):
    """Ingest `circle` + `geo_grid` processors (round-8 surfaces): every
    event synthesizes a WKT `CIRCLE (x y r)` (dyadic centers/radii, so
    the string round-trip is IEEE-exact) and a geotile `4/x/y` cell id;
    the pipeline approximates the circle as ES's error-bounded regular
    polygon (side count = ceil(2pi / acos(1 - err/r))) and unprojects
    the tile to its envelope.  The oracle replays the side-count
    formula, the first ring vertex's trig, and the Mercator unproject
    (sinh spelled via exp — DuckDB has no sinh).  All pure codegen
    Column math; no UDF, no shuffle before the final sort."""
    from elasticsearch_hadoop_spark.ingest import compile_pipeline

    ev = tbl(spark, sf_dir, "events").select("event_id")
    cx = ((F.col("event_id") % 40) - 20).cast("double") + F.lit(0.5)
    cy = ((F.col("event_id") % 30) - 15).cast("double") + F.lit(0.5)
    r = F.lit(0.5) + (F.col("event_id") % 3).cast("double") * F.lit(0.5)
    wire = ev.select(
        "event_id",
        F.concat(
            F.lit("CIRCLE ("), cx.cast("string"), F.lit(" "),
            cy.cast("string"), F.lit(" "), r.cast("string"), F.lit(")"),
        ).alias("shp"),
        F.concat(
            F.lit("4/"), (F.col("event_id") % 16).cast("string"),
            F.lit("/"), (F.col("event_id") % 12).cast("string"),
        ).alias("cell"),
    )
    fn = compile_pipeline([
        {"circle": {"field": "shp", "target_field": "poly",
                    "error_distance": 0.05}},
        {"geo_grid": {"field": "cell", "target_field": "env",
                      "tile_type": "geotile"}},
    ])
    out = fn(wire)
    v1 = F.get(F.col("poly"), 1)
    return out.select(
        "event_id",
        (F.size("poly") - 1).cast("long").alias("n_sides"),
        F.round(v1["lon"], 6).alias("v1x"),
        F.round(v1["lat"], 6).alias("v1y"),
        F.round(F.col("env.min_lon"), 6).alias("min_lon"),
        F.round(F.col("env.min_lat"), 6).alias("min_lat"),
        F.round(F.col("env.max_lon"), 6).alias("max_lon"),
        F.round(F.col("env.max_lat"), 6).alias("max_lat"),
    ).orderBy("event_id")


@query(
    "writepath_pit_search_after",
    oracle="""
WITH v1 AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
  FROM v1
)
SELECT doc_id, lang, n_chars, CAST(ceil(rn / 40.0) AS BIGINT) AS page
FROM ranked
WHERE rn <= 120
ORDER BY rn
""",
)
def writepath_pit_search_after(spark, sf_dir):
    """ES point-in-time + search_after deep pagination (the canonical
    scroll replacement): write the even documents as v1 of a
    transactional index, open a PIT, then APPEND the odd half — the
    three keyset pages read through the PIT still see only v1's frozen
    snapshot.  Each page is a sargable cursor filter +
    TakeOrderedAndProject; the PIT pins a manifest, not a copy."""
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.corpus.write_path import _workdir
    from elasticsearch_hadoop_spark.search import search_after

    root = _workdir(sf_dir, "pit_sa")
    cat = Catalog(spark, root, transactional=True)
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    cat.write_index(
        docs.filter(F.col("doc_id") % 2 == 0), "docs",
        mode="overwrite", id_col="doc_id",
    )
    pit = cat.open_point_in_time("docs", keep_alive="5m", now=0.0)
    cat.write_index(
        docs.filter(F.col("doc_id") % 2 == 1), "docs", mode="append"
    )
    sort = [{"n_chars": "desc"}, {"doc_id": "asc"}]
    pages, cursor = [], None
    for page_no in (1, 2, 3):
        hits = search_after(
            cat.pit_read(pit, keep_alive="5m", now=float(page_no)),
            sort, after=cursor, size=40,
        ).withColumn("page", F.lit(page_no).cast("long"))
        rows = hits.collect()  # a 40-row page: the bounded driver fetch
        if rows:
            cursor = (rows[-1]["n_chars"], rows[-1]["doc_id"])
        pages.append(hits)
    cat.close_point_in_time(pit)
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", "lang", "n_chars", "page").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )


@query(
    "ingest_geohash_decode",
    oracle="""
WITH h AS (
  SELECT event_id,
         substr('0123456789bcdefghjkmnpqrstuvwxyz', ((event_id + 7) % 32)::INT + 1, 1)
         || substr('0123456789bcdefghjkmnpqrstuvwxyz', ((event_id + 14) % 32)::INT + 1, 1)
         || substr('0123456789bcdefghjkmnpqrstuvwxyz', ((event_id + 21) % 32)::INT + 1, 1)
         || substr('0123456789bcdefghjkmnpqrstuvwxyz', ((event_id + 28) % 32)::INT + 1, 1)
         || substr('0123456789bcdefghjkmnpqrstuvwxyz', ((event_id + 35) % 32)::INT + 1, 1)
           AS gh
  FROM events
),
v5 AS (
  SELECT event_id, gh,
         (((CAST(strpos('0123456789bcdefghjkmnpqrstuvwxyz', substr(gh, 1, 1)) - 1 AS BIGINT) * 32
            + (strpos('0123456789bcdefghjkmnpqrstuvwxyz', substr(gh, 2, 1)) - 1)) * 32
            + (strpos('0123456789bcdefghjkmnpqrstuvwxyz', substr(gh, 3, 1)) - 1)) * 32
            + (strpos('0123456789bcdefghjkmnpqrstuvwxyz', substr(gh, 4, 1)) - 1)) * 32
            + (strpos('0123456789bcdefghjkmnpqrstuvwxyz', substr(gh, 5, 1)) - 1) AS v
  FROM h
),
xy AS (
  SELECT event_id, gh,
         (((v >> 24) & 1) * 4096 + ((v >> 22) & 1) * 2048 + ((v >> 20) & 1) * 1024 + ((v >> 18) & 1) * 512 + ((v >> 16) & 1) * 256 + ((v >> 14) & 1) * 128 + ((v >> 12) & 1) * 64 + ((v >> 10) & 1) * 32 + ((v >> 8) & 1) * 16 + ((v >> 6) & 1) * 8 + ((v >> 4) & 1) * 4 + ((v >> 2) & 1) * 2 + ((v >> 0) & 1) * 1) AS x,
         (((v >> 23) & 1) * 2048 + ((v >> 21) & 1) * 1024 + ((v >> 19) & 1) * 512 + ((v >> 17) & 1) * 256 + ((v >> 15) & 1) * 128 + ((v >> 13) & 1) * 64 + ((v >> 11) & 1) * 32 + ((v >> 9) & 1) * 16 + ((v >> 7) & 1) * 8 + ((v >> 5) & 1) * 4 + ((v >> 3) & 1) * 2 + ((v >> 1) & 1) * 1) AS y
  FROM v5
)
SELECT event_id, gh,
       round(x / 8192.0 * 360 - 180, 6) AS min_lon,
       round(y / 4096.0 * 180 - 90, 6) AS min_lat,
       round((x + 1) / 8192.0 * 360 - 180, 6) AS max_lon,
       round((y + 1) / 4096.0 * 180 - 90, 6) AS max_lat
FROM xy
ORDER BY event_id
""",
)
def ingest_geohash_decode(spark, sf_dir):
    """Ingest `geo_grid` over GEOHASH cells: every event synthesizes a
    5-char hash from the base32 alphabet, the processor de-interleaves
    the 25 bits back to the cell envelope, and the oracle replays the
    decode with explicit shift-and-mask integer arithmetic (13 lon bits,
    12 lat bits at precision 5).  The per-char parity-carrying aggregate
    is the scale path: pure Column math, one pass over the chars."""
    from elasticsearch_hadoop_spark.ingest import compile_pipeline

    B = "0123456789bcdefghjkmnpqrstuvwxyz"
    ev = tbl(spark, sf_dir, "events").select("event_id")
    alpha = F.lit(list(B))
    ch = lambda k: F.get(alpha, ((F.col("event_id") + 7 * k) % 32).cast("int"))
    wire = ev.select(
        "event_id", F.concat(ch(1), ch(2), ch(3), ch(4), ch(5)).alias("gh")
    )
    fn = compile_pipeline([
        {"geo_grid": {"field": "gh", "target_field": "env",
                      "tile_type": "geohash"}},
    ])
    out = fn(wire)
    return out.select(
        "event_id", "gh",
        F.round(F.col("env.min_lon"), 6).alias("min_lon"),
        F.round(F.col("env.min_lat"), 6).alias("min_lat"),
        F.round(F.col("env.max_lon"), 6).alias("max_lon"),
        F.round(F.col("env.max_lat"), 6).alias("max_lat"),
    ).orderBy("event_id")


@query(
    "esql_match_colon",
    oracle="""
WITH an AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n
FROM an
WHERE (list_contains(toks, 'hash') OR list_contains(toks, 'merge'))
  AND lang <> 'fr'
GROUP BY lang
ORDER BY lang
""",
)
def esql_match_colon(spark, sf_dir):
    """ES|QL 8.17 match OPERATOR (`field : "query"`): colon leaves in
    WHERE compile through the query-DSL token-overlap match, composing
    with NOT and STATS; a colon inside a string literal stays literal
    (the boolean splitter blanks literals before probing)."""
    from elasticsearch_hadoop_spark.esql import esql

    docs = tbl(spark, sf_dir, "documents")
    return esql(
        'FROM d | WHERE text : "hash merge" AND NOT lang : "fr" '
        "| STATS n = COUNT(*) BY lang | SORT lang",
        tables={"d": docs},
    )
