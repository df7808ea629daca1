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
