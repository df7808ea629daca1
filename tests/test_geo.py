"""Geo predicate gates: geo_polygon ray casting against an independent
pure-Python PNPOLY reference on random points, plus the degenerate-input
rejection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.functions.geo import geo_polygon_filter

PENTAGON = [(0.0, -30.0), (25.0, -10.0), (50.0, -25.0), (40.0, 40.0), (5.0, 35.0)]


def pnpoly(lat: float, lon: float, pts) -> bool:
    inside = False
    n = len(pts)
    for i in range(n):
        yi, xi = pts[i]
        yj, xj = pts[(i + 1) % n]
        if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


def test_polygon_matches_reference_on_random_points(spark):
    rng = np.random.default_rng(11)
    lats = rng.uniform(-60, 70, 300)
    lons = rng.uniform(-90, 90, 300)
    df = spark.createDataFrame(
        [Row(i=i, lat=float(lats[i]), lon=float(lons[i])) for i in range(300)]
    )
    got = {
        r["i"]: r["in_poly"]
        for r in df.select(
            "i", geo_polygon_filter(F.col("lat"), F.col("lon"), PENTAGON).alias("in_poly")
        ).collect()
    }
    for i in range(300):
        assert got[i] == pnpoly(lats[i], lons[i], PENTAGON), (lats[i], lons[i])
    assert any(got.values()) and not all(got.values())  # non-vacuous both ways


def test_polygon_rejects_degenerate(spark):
    with pytest.raises(ValueError):
        geo_polygon_filter(F.col("lat"), F.col("lon"), [(0.0, 0.0), (1.0, 1.0)])


def test_polygon_dsl_clause_compiles(spark):
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame(
        [Row(loc=Row(lat=20.0, lon=0.0)), Row(loc=Row(lat=-50.0, lon=0.0))]
    )
    pred = compile_query(
        {"geo_polygon": {"loc": {"points": [{"lat": la, "lon": lo} for la, lo in PENTAGON]}}}
    )
    assert df.filter(pred).count() == 1


def test_geo_shape_point_subset(spark):
    from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

    df = spark.createDataFrame(
        [(1, (10.0, 20.0)), (2, (40.0, 60.0)), (3, (None, None)), (4, None)],
        "id int, loc struct<lat double, lon double>",
    )

    def ids(q):
        return {r["id"] for r in df.filter(compile_query(q)).collect()}

    # envelope: GeoJSON lon-first [[minLon, maxLat], [maxLon, minLat]]
    env = {"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[15.0, 30.0], [70.0, 5.0]]}}}}
    assert ids(env) == {1}
    # within == intersects for points
    env_within = {"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[15.0, 30.0], [70.0, 5.0]]},
        "relation": "within"}}}
    assert ids(env_within) == {1}
    # disjoint matches docs with coordinates outside the shape (never
    # the null-coordinate docs)
    env_disjoint = {"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[15.0, 30.0], [70.0, 5.0]]},
        "relation": "disjoint"}}}
    assert ids(env_disjoint) == {2}
    # polygon ring (lon-first), triangle around (40, 60)
    poly = {"geo_shape": {"loc": {"shape": {
        "type": "polygon",
        "coordinates": [[[55.0, 35.0], [65.0, 35.0], [60.0, 45.0],
                         [55.0, 35.0]]]}}}}
    assert ids(poly) == {2}
    # exact point
    pt = {"geo_shape": {"loc": {"shape": {
        "type": "point", "coordinates": [20.0, 10.0]}}}}
    assert ids(pt) == {1}
    import pytest as _pytest

    with _pytest.raises(QueryDslError, match="indexed_shape"):
        compile_query({"geo_shape": {"loc": {"indexed_shape": {
            "index": "shapes", "id": "x"}}}})
    with _pytest.raises(QueryDslError, match="unsupported relation"):
        compile_query({"geo_shape": {"loc": {"shape": {
            "type": "point", "coordinates": [0.0, 0.0]},
            "relation": "contains"}}})
    with _pytest.raises(QueryDslError, match="unsupported shape"):
        compile_query({"geo_shape": {"loc": {"shape": {
            "type": "linestring", "coordinates": [[0, 0], [1, 1]]}}}})


def test_review_round3_geo_fixes(spark):
    from elasticsearch_hadoop_spark.query_dsl import (
        QueryDslError,
        _parse_distance_km,
        compile_query,
    )

    # full ES unit table; malformed -> QueryDslError, not ValueError
    assert _parse_distance_km("100cm") == pytest.approx(0.001)
    assert _parse_distance_km("2000mm") == pytest.approx(0.002)
    assert _parse_distance_km("1in") == pytest.approx(0.0000254)
    assert _parse_distance_km("2NM") == pytest.approx(3.704)
    assert _parse_distance_km("1nauticalmiles") == pytest.approx(1.852)
    assert _parse_distance_km("3feet") == pytest.approx(0.0009144)
    with pytest.raises(QueryDslError, match="bad distance"):
        _parse_distance_km("a few blocks")

    df = spark.createDataFrame(
        [(1, (0.0, 179.95)), (2, (0.0, -179.95)), (3, (0.0, 170.0))],
        "id int, loc struct<lat double, lon double>",
    )

    def ids(q):
        return {r["id"] for r in df.filter(compile_query(q)).collect()}

    # antimeridian wrap: a 200km radius at lon 179.9 must catch the
    # point at -179.95 on the far side of the dateline
    near_dateline = {"geo_distance": {"distance": "200km",
                                      "loc": {"lat": 0.0, "lon": 179.9}}}
    assert ids(near_dateline) == {1, 2}
    # sibling option keys ES sends are tolerated, not an unpack crash
    with_opts = {"geo_distance": {"distance": "200km", "ignore_unmapped": True,
                                  "_name": "q1",
                                  "loc": {"lat": 0.0, "lon": 179.9}}}
    assert ids(with_opts) == {1, 2}
    bbox_opts = {"geo_bounding_box": {"validation_method": "STRICT", "loc": {
        "top_left": {"lat": 1.0, "lon": 169.0},
        "bottom_right": {"lat": -1.0, "lon": 171.0}}}}
    assert ids(bbox_opts) == {3}
    with pytest.raises(QueryDslError, match="needs a distance"):
        compile_query({"geo_distance": {"loc": {"lat": 0.0, "lon": 0.0}}})
    # polygon holes: reject, don't silently match inside the hole
    with pytest.raises(QueryDslError, match="holes"):
        compile_query({"geo_shape": {"loc": {"shape": {
            "type": "polygon",
            "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                            [[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]]}}}})


# --- shape-vs-shape relations (round 7) ------------------------------------

def _seg_seg(a, b, c, d) -> bool:
    """Closed segment intersection by orientations + on-segment tests —
    deliberately a DIFFERENT formulation than the library's SAT."""
    def o(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on(p, q, r):  # r collinear with pq: is r within the bbox of pq?
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    d1, d2 = o(c, d, a), o(c, d, b)
    d3, d4 = o(a, b, c), o(a, b, d)
    if d1 != d2 and d3 != d4:
        return True
    return ((d1 == 0 and on(c, d, a)) or (d2 == 0 and on(c, d, b))
            or (d3 == 0 and on(a, b, c)) or (d4 == 0 and on(a, b, d)))


def _pip_evenodd(px, py, poly) -> bool:
    """Same even-odd convention as the library (strict `<` ray cast)."""
    inside = False
    n = len(poly)
    for i in range(n):
        (xi, yi), (xj, yj) = poly[i], poly[(i + 1) % n]
        if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


def _ref_poly_box(poly, box):
    """Reference polygon-vs-box relations: seg-seg against the 4 box
    edges + endpoint/corner containment (no SAT anywhere)."""
    minx, miny, maxx, maxy = box
    corners = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
    box_edges = list(zip(corners, corners[1:] + corners[:1]))
    in_box = lambda p: minx <= p[0] <= maxx and miny <= p[1] <= maxy
    edges = list(zip(poly, poly[1:] + poly[:1]))
    inter = (
        any(in_box(p) for p in poly)
        or any(_seg_seg(a, b, c, d) for a, b in edges for c, d in box_edges)
        or _pip_evenodd(minx, miny, poly)
    )
    return {
        "intersects": inter,
        "within": all(in_box(p) for p in poly),
        "disjoint": not inter,
    }


def _poly_df(spark, polys):
    return spark.createDataFrame(
        [(i, [{"lon": float(x), "lat": float(y)} for x, y in p])
         for i, p in enumerate(polys)],
        "id int, poly array<struct<lon double, lat double>>",
    )


def test_polygon_envelope_relations_vs_reference(spark):
    """Differential over a deterministic grid of integer triangles and
    quads (incl. degenerate/self-intersecting rings, boundary touches)
    against the seg-seg reference."""
    import itertools

    from elasticsearch_hadoop_spark.functions.geo import polygon_envelope_relation

    box = (0.0, 0.0, 3.0, 3.0)
    coords = [-2, 0, 1, 3, 5]
    polys = []
    # triangles over a coarse grid (includes collinear/degenerate rings)
    for pts in itertools.combinations(itertools.product(coords, coords), 3):
        polys.append(list(pts))
    polys = polys[::7][:220]  # every 7th: keep the matrix broad but bounded
    # closed ring + axis-touching quad + self-intersecting bowtie
    polys += [
        [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)],
        [(3, 0), (5, 0), (5, 2), (3, 2)],
        [(-1, -1), (4, 4), (-1, 4), (4, -1)],
    ]
    df = _poly_df(spark, polys)
    for rel in ("intersects", "within", "disjoint"):
        got = {
            r["id"]
            for r in df.filter(polygon_envelope_relation(F.col("poly"), box, rel)).collect()
        }
        want = {i for i, p in enumerate(polys) if _ref_poly_box(p, box)[rel]}
        assert got == want, f"{rel}: spark^ref disagree on {got ^ want}"


def test_envelope_envelope_relations(spark):
    from elasticsearch_hadoop_spark.functions.geo import envelope_envelope_relation

    rows = [
        (1, (0.0, 0.0, 2.0, 2.0)),    # within the query box
        (2, (-1.0, -1.0, 5.0, 5.0)),  # contains it
        (3, (2.5, 2.5, 6.0, 6.0)),    # overlaps corner
        (4, (10.0, 10.0, 11.0, 11.0)),  # disjoint
        (5, (3.0, 0.0, 7.0, 1.0)),    # touches the right edge
    ]
    df = spark.createDataFrame(
        [(i, {"min_lon": a, "min_lat": b, "max_lon": c, "max_lat": d})
         for i, (a, b, c, d) in rows],
        "id int, env struct<min_lon double, min_lat double, max_lon double, max_lat double>",
    )
    q = (0.0, 0.0, 3.0, 3.0)
    expect = {"intersects": {1, 2, 3, 5}, "within": {1}, "contains": {2},
              "disjoint": {4}}
    for rel, want in expect.items():
        got = {r["id"] for r in
               df.filter(envelope_envelope_relation(F.col("env"), q, rel)).collect()}
        assert got == want, rel


def test_geo_shape_shape_field_dsl(spark):
    from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

    env = {"type": "envelope", "coordinates": [[0.0, 3.0], [3.0, 0.0]]}
    df = _poly_df(spark, [[(1, 1), (2, 1), (1.5, 2)], [(9, 9), (11, 9), (10, 11)]])
    body = {"geo_shape": {"poly": {"shape": env, "relation": "within",
                                   "field_type": "polygon"}}}
    assert [r["id"] for r in df.filter(compile_query(body)).collect()] == [0]
    # contains over polygon fields: reject, don't approximate
    with pytest.raises(QueryDslError, match="open-set|unsupported relation"):
        compile_query({"geo_shape": {"poly": {
            "shape": env, "relation": "contains", "field_type": "polygon"}}})
    # non-envelope query shape over a shape field: reject
    with pytest.raises(QueryDslError, match="envelope"):
        compile_query({"geo_shape": {"poly": {
            "shape": {"type": "polygon", "coordinates": [[[0, 0], [1, 0], [0, 1]]]},
            "relation": "intersects", "field_type": "polygon"}}})
    with pytest.raises(QueryDslError, match="field_type"):
        compile_query({"geo_shape": {"poly": {
            "shape": env, "field_type": "multipolygon"}}})
    # null polygons: never disjoint-matched (null-guard)
    dfn = spark.createDataFrame(
        [(0, None)], "id int, poly array<struct<lon double, lat double>>")
    body_d = {"geo_shape": {"poly": {"shape": env, "relation": "disjoint",
                                     "field_type": "polygon"}}}
    assert dfn.filter(compile_query(body_d)).count() == 0


def test_polygon_empty_and_null_rings_never_crash(spark):
    from elasticsearch_hadoop_spark.functions.geo import polygon_envelope_relation

    df = spark.createDataFrame(
        [(0, []), (1, None), (2, [(1.0, 1.0), (2.0, 1.0), (1.5, 2.0)])],
        "id int, poly array<struct<lon double, lat double>>",
    )
    box = (0.0, 0.0, 3.0, 3.0)
    got = {
        rel: {r["id"] for r in
              df.filter(polygon_envelope_relation(F.col("poly"), box, rel)).collect()}
        for rel in ("intersects", "within", "disjoint")
    }
    assert got == {"intersects": {2}, "within": {2}, "disjoint": set()}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    polys=st.lists(
        st.lists(
            st.tuples(st.integers(min_value=-4, max_value=7),
                      st.integers(min_value=-4, max_value=7)),
            min_size=3, max_size=6,
        ),
        min_size=1, max_size=8,
    )
)
def test_polygon_envelope_relations_hypothesis(spark, polys):
    """Random integer polygons (often degenerate or self-intersecting)
    vs the seg-seg reference — complements the deterministic grid."""
    from elasticsearch_hadoop_spark.functions.geo import polygon_envelope_relation

    box = (0.0, 0.0, 3.0, 3.0)
    df = _poly_df(spark, polys)
    for rel in ("intersects", "within", "disjoint"):
        got = {
            r["id"]
            for r in df.filter(
                polygon_envelope_relation(F.col("poly"), box, rel)
            ).collect()
        }
        want = {i for i, p in enumerate(polys) if _ref_poly_box(p, box)[rel]}
        assert got == want, (rel, got ^ want)


def test_geo_grid_query_matches_grid_agg_buckets(spark):
    """The geo_grid QUERY for a bucket key must match exactly the docs the
    corresponding grid AGG put in that bucket (ES's consistency contract
    between the two) — geotile and geohash kinds."""
    from elasticsearch_hadoop_spark.aggs_dsl import _bucket_key
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    rng = np.random.default_rng(7)
    rows = [
        Row(i=i, loc=Row(lat=float(rng.uniform(-80, 80)), lon=float(rng.uniform(-179, 179))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    for kind, agg_kind, prec in (("geotile", "geotile_grid", 5), ("geohash", "geohash_grid", 2)):
        keyed = df.withColumn(
            "cell", _bucket_key(agg_kind, {"field": "loc", "precision": prec})
        )
        # the largest bucket, then: query for that key == that bucket
        top = (
            keyed.groupBy("cell").count().orderBy(F.desc("count"), "cell").first()
        )
        want = {r["i"] for r in keyed.filter(F.col("cell") == top["cell"]).collect()}
        got = {
            r["i"]
            for r in df.filter(
                compile_query({"geo_grid": {"loc": {kind: top["cell"]}}})
            ).collect()
        }
        assert got == want and len(got) == top["count"], (kind, top["cell"])


def test_geo_grid_query_validation(spark):
    from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

    with pytest.raises(QueryDslError, match="z/x/y"):
        compile_query({"geo_grid": {"loc": {"geotile": "nope"}}})
    with pytest.raises(QueryDslError, match="out of range for zoom"):
        compile_query({"geo_grid": {"loc": {"geotile": "2/9/1"}}})
    with pytest.raises(QueryDslError, match="zoom"):
        compile_query({"geo_grid": {"loc": {"geotile": "31/0/0"}}})
    with pytest.raises(QueryDslError, match="invalid geohash"):
        compile_query({"geo_grid": {"loc": {"geohash": "aio"}}})  # a,i,o not base32
    with pytest.raises(QueryDslError, match="H3"):
        compile_query({"geo_grid": {"loc": {"geohex": "8429a1fffffffff"}}})
    with pytest.raises(QueryDslError, match="exactly one"):
        compile_query({"geo_grid": {"loc": {"geotile": "1/0/0", "geohash": "u"}}})


def test_geo_grid_non_numeric_tile_is_typed_error(spark):
    from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

    with pytest.raises(QueryDslError, match="integers"):
        compile_query({"geo_grid": {"loc": {"geotile": "2/a/0"}}})
