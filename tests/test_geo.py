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
