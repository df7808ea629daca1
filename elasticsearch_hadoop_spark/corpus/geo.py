"""Geo corpus: ES geo_distance / geo_bounding_box query analogues over
geo_point-shaped struct(lat, lon) columns (SURVEY.md §1.2 geo_point row;
the reference passes these DSL clauses through in `es.query` — here they
compile to native Column predicates via query_dsl.compile_query).

The fixtures carry no coordinates, so both sides derive deterministic
lat/lon from c_custkey with identical integer arithmetic — the oracle
recomputes the same haversine formula in SQL, so the hash gate covers the
trig itself (JVM vs DuckDB agree well inside the 6-dp canonicalization;
results are pre-rounded to 3 dp for margin).

Scale: both predicates are pure codegen expressions; the bounding-box
prefilter inside geo_distance_filter is sargable (pushable to parquet
row-group stats when lat/lon are physical columns).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.functions.geo import haversine_km
from elasticsearch_hadoop_spark.query_dsl import compile_query

# identical derivation on both sides: lat in [-89.5, 89.5], lon in [-179.5, 179.5].
# CAST to DOUBLE: DuckDB types `bigint - 89.5` as DECIMAL, and the driver's
# canonicalizer float-formats only true doubles — a DECIMAL 10.5 would hash
# as "10.5" against Spark's "10.500000".
_LAT_SQL = "CAST((c_custkey % 180) - 89.5 AS DOUBLE)"
_LON_SQL = "CAST(((c_custkey * 7) % 360) - 179.5 AS DOUBLE)"

_DUCK_HAVERSINE = """
round(2 * 6371.0088 * asin(sqrt(
    pow(sin((radians(20.0) - radians(lat)) / 2), 2)
    + cos(radians(lat)) * cos(radians(20.0))
      * pow(sin((radians(30.0) - radians(lon)) / 2), 2)
)), 3)
""".strip()


def _with_coords(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180) - 89.5).alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 179.5).alias("lon"),
    )


@query(
    "geo_distance_search",
    oracle=f"""
WITH pts AS (SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT c_custkey, {_DUCK_HAVERSINE} AS dist_km
FROM pts
WHERE {_DUCK_HAVERSINE} <= 3000.0
ORDER BY c_custkey
""",
)
def geo_distance_search(spark, sf_dir):
    """geo_distance DSL clause → bounding-box prefilter AND exact
    haversine, both codegen; distance returned for the hash gate."""
    pts = _with_coords(spark, sf_dir).withColumn(
        "loc", F.struct(F.col("lat"), F.col("lon"))
    )
    pred = compile_query(
        {"geo_distance": {"distance": "3000km", "loc": {"lat": 20.0, "lon": 30.0}}}
    )
    return (
        pts.filter(pred)
        .select(
            "c_custkey",
            F.round(
                haversine_km(F.col("lat"), F.col("lon"), F.lit(20.0), F.lit(30.0)), 3
            ).alias("dist_km"),
        )
        .orderBy("c_custkey")
    )


@query(
    "geo_bounding_box_search",
    oracle=f"""
WITH pts AS (SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT c_custkey, round(lat, 1) AS lat, round(lon, 1) AS lon
FROM pts
WHERE lat BETWEEN -10.0 AND 45.0
  AND (lon >= 150.0 OR lon <= -120.0)
ORDER BY c_custkey
""",
)
def geo_bounding_box_search(spark, sf_dir):
    """geo_bounding_box DSL clause, antimeridian-crossing box (left 150 >
    right -120 wraps, ES semantics)."""
    pts = _with_coords(spark, sf_dir).withColumn(
        "loc", F.struct(F.col("lat"), F.col("lon"))
    )
    pred = compile_query(
        {
            "geo_bounding_box": {
                "loc": {
                    "top_left": {"lat": 45.0, "lon": 150.0},
                    "bottom_right": {"lat": -10.0, "lon": -120.0},
                }
            }
        }
    )
    return (
        pts.filter(pred)
        .select(
            "c_custkey",
            F.round("lat", 1).alias("lat"),
            F.round("lon", 1).alias("lon"),
        )
        .orderBy("c_custkey")
    )


# pentagon vertices (lat, lon) — all latitudes distinct so no edge is
# horizontal (the ray-cast division is then always well-defined; see
# geo_polygon_filter's note)
_POLY = [(0.0, -30.0), (25.0, -10.0), (50.0, -25.0), (40.0, 40.0), (5.0, 35.0)]


def _poly_crossing_sql() -> str:
    terms = []
    n = len(_POLY)
    for i in range(n):
        yi, xi = _POLY[i]
        yj, xj = _POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({yi} > lat) != ({yj} > lat))"
            f" AND lon < ({xj} - {xi}) * (lat - {yi}) / ({yj} - {yi}) + {xi}"
            f" THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


@query(
    "geo_polygon_search",
    oracle=f"""
WITH pts AS (SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer)
SELECT c_custkey, round(lat, 1) AS lat, round(lon, 1) AS lon
FROM pts
WHERE {_poly_crossing_sql()}
ORDER BY c_custkey
""",
)
def geo_polygon_search(spark, sf_dir):
    """geo_polygon DSL clause → even-odd ray casting unrolled over the
    literal vertex list (one codegen expression, no UDF); the oracle
    recomputes the identical crossing arithmetic in SQL."""
    pts = _with_coords(spark, sf_dir).withColumn(
        "loc", F.struct(F.col("lat"), F.col("lon"))
    )
    pred = compile_query(
        {"geo_polygon": {"loc": {"points": [{"lat": la, "lon": lo} for la, lo in _POLY]}}}
    )
    return (
        pts.filter(pred)
        .select(
            "c_custkey",
            F.round("lat", 1).alias("lat"),
            F.round("lon", 1).alias("lon"),
        )
        .orderBy("c_custkey")
    )


@query(
    "query_dsl_geo_shape_relations",
    oracle="""
WITH shapes AS (
  SELECT event_id,
         ((event_id % 70) - 35) + 0.5::DOUBLE AS cx,
         ((event_id % 50) - 25) + 0.5::DOUBLE AS cy,
         0.5::DOUBLE + (event_id % 4) * 0.75::DOUBLE AS a
  FROM events
),
classified AS (
  SELECT event_id,
         -- diamond {|p-c|_1 <= a} vs box [-10,-8]x[12,9]: exact L1 closed form
         CASE
           WHEN cx - a >= -10 AND cx + a <= 12
            AND cy - a >= -8 AND cy + a <= 9 THEN 'within'
           WHEN greatest(-10 - cx, cx - 12, 0.0::DOUBLE)
              + greatest(-8 - cy, cy - 9, 0.0::DOUBLE) <= a THEN 'intersects'
           ELSE 'disjoint'
         END AS poly_rel,
         -- diamond bbox [cx-a, cx+a]x[cy-a, cy+a] vs box [0,0]x[1,1]
         CASE
           WHEN cx - a <= 0 AND cx + a >= 1
            AND cy - a <= 0 AND cy + a >= 1 THEN 'contains'
           WHEN cx - a >= 0 AND cx + a <= 1
            AND cy - a >= 0 AND cy + a <= 1 THEN 'within'
           WHEN cx - a <= 1 AND cx + a >= 0
            AND cy - a <= 1 AND cy + a >= 0 THEN 'intersects'
           ELSE 'disjoint'
         END AS env_rel
  FROM shapes
)
SELECT poly_rel, env_rel, CAST(count(*) AS BIGINT) AS n
FROM classified
GROUP BY poly_rel, env_rel
ORDER BY poly_rel, env_rel
""",
)
def query_dsl_geo_shape_relations(spark, sf_dir):
    """`geo_shape` over SHAPE-typed fields (round-7 extension past the
    point-vs-shape subset): every event synthesizes a diamond polygon
    (4-vertex ring, deliberately non-axis-aligned so the separating-axis
    edge tests do real work) and its bounding-box envelope; the DSL then
    classifies each doc's relation to two query envelopes —
    within/intersects/disjoint for the polygon field, plus contains for
    the envelope field.  Coordinates are dyadic fractions (k + 0.5,
    steps of 0.75), so every comparison is IEEE-exact and the DuckDB
    oracle replays the geometry in closed form (diamond = L1 ball: box
    distance = clamped per-axis distances summed).  All pure codegen
    Column math — no UDF, no shuffle before the final tiny groupBy."""
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    ev = tbl(spark, sf_dir, "events").select("event_id")
    cx = ((F.col("event_id") % 70) - 35).cast("double") + F.lit(0.5)
    cy = ((F.col("event_id") % 50) - 25).cast("double") + F.lit(0.5)
    a = F.lit(0.5) + (F.col("event_id") % 4).cast("double") * F.lit(0.75)
    vertex = lambda vx, vy: F.struct(vx.alias("lon"), vy.alias("lat"))
    shapes = ev.select(
        "event_id",
        F.array(
            vertex(cx + a, cy), vertex(cx, cy + a),
            vertex(cx - a, cy), vertex(cx, cy - a),
        ).alias("poly"),
        F.struct(
            (cx - a).alias("min_lon"), (cy - a).alias("min_lat"),
            (cx + a).alias("max_lon"), (cy + a).alias("max_lat"),
        ).alias("env"),
    )
    # envelope query shape: [[minLon, maxLat], [maxLon, minLat]]
    big = {"type": "envelope", "coordinates": [[-10.0, 9.0], [12.0, -8.0]]}
    small = {"type": "envelope", "coordinates": [[0.0, 1.0], [1.0, 0.0]]}

    def rel(field, shape, r, ftype):
        return compile_query(
            {"geo_shape": {field: {"shape": shape, "relation": r, "field_type": ftype}}}
        )

    classified = shapes.select(
        "event_id",
        F.when(rel("poly", big, "within", "polygon"), "within")
        .when(rel("poly", big, "intersects", "polygon"), "intersects")
        .when(rel("poly", big, "disjoint", "polygon"), "disjoint")
        .alias("poly_rel"),
        F.when(rel("env", small, "contains", "envelope"), "contains")
        .when(rel("env", small, "within", "envelope"), "within")
        .when(rel("env", small, "intersects", "envelope"), "intersects")
        .when(rel("env", small, "disjoint", "envelope"), "disjoint")
        .alias("env_rel"),
    )
    return (
        classified.groupBy("poly_rel", "env_rel")
        .agg(F.count("*").alias("n"))
        .orderBy("poly_rel", "env_rel")
    )
