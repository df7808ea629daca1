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
