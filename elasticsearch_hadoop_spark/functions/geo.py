"""Geo functions: the engine-side analogues of ES geo queries over
``geo_point`` columns (SURVEY.md §1.2 maps ``geo_point`` →
``StructType(lat, lon)``; upstream geo handling in
``spark/sql-20/.../sql/SchemaUtils.scala`` geo detection and the
``geo_distance``/``geo_bounding_box``/``geo_polygon`` query DSL the
reference passes through in ``es.query``).

All pure Column expressions (whole-stage codegen; no UDF): haversine uses
Spark's JVM trig intrinsics, so distance filters run at scan speed and any
cheap prefilter (bounding box) can be pushed to Parquet by Catalyst.

Scale note: for repeated geo-radius queries at 100 TB, store a geohash-/
S2-style cell id column, partition by it, and prefilter on cell membership
before the exact haversine — `geo_distance` below stays the exact verifier.
The bounding-box prefilter applied by `geo_distance_filter` is the first
step of that pattern and is pushable to row-group stats today.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def _rad(c: Column) -> Column:
    return F.radians(c)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine on the mean-radius sphere —
    the same model ES uses for `geo_distance` arc distances)."""
    dlat = _rad(lat2) - _rad(lat1)
    dlon = _rad(lon2) - _rad(lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(_rad(lat1)) * F.cos(_rad(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_filter(
    lat: Column, lon: Column, center_lat: float, center_lon: float, radius_km: float
) -> Column:
    """ES `geo_distance` query analogue: points within radius_km of center.

    Composes a degree-space bounding-box prefilter (pushable to Parquet
    row-group min/max stats — the cheap cull) AND the exact haversine
    check. The longitude delta is widened by cos(lat) at the center;
    clamped for poles."""
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    cos_lat = max(math.cos(math.radians(center_lat)), 1e-9)
    dlon = min(180.0, math.degrees(radius_km / (EARTH_RADIUS_KM * cos_lat)))
    lo, hi = center_lon - dlon, center_lon + dlon
    # the lon window must WRAP at the antimeridian — a radius reaching
    # past ±180 otherwise silently excludes in-range points on the far
    # side (the haversine is wrap-correct; the prefilter must be too)
    if lo < -180.0 and hi <= 180.0:
        lon_box = lon.between(lo + 360.0, 180.0) | lon.between(-180.0, hi)
    elif hi > 180.0 and lo >= -180.0:
        lon_box = lon.between(lo, 180.0) | lon.between(-180.0, hi - 360.0)
    elif lo < -180.0 and hi > 180.0:
        lon_box = lon.isNotNull()  # window spans the full circle
    else:
        lon_box = lon.between(lo, hi)
    box = lat.between(center_lat - dlat, center_lat + dlat) & lon_box
    exact = haversine_km(lat, lon, F.lit(float(center_lat)), F.lit(float(center_lon))) <= F.lit(
        float(radius_km)
    )
    return box & exact


def geo_bounding_box_filter(
    lat: Column, lon: Column, top: float, left: float, bottom: float, right: float
) -> Column:
    """ES `geo_bounding_box` query analogue. Handles antimeridian-crossing
    boxes (left > right) the way ES does: the box wraps."""
    lat_ok = lat.between(float(bottom), float(top))
    if left <= right:
        lon_ok = lon.between(float(left), float(right))
    else:  # wraps the antimeridian
        lon_ok = (lon >= float(left)) | (lon <= float(right))
    return lat_ok & lon_ok


def geo_polygon_filter(
    lat: Column, lon: Column, points: list[tuple[float, float]]
) -> Column:
    """ES `geo_polygon` query analogue: point-in-polygon by the even-odd
    (ray casting) rule, unrolled over the literal vertex list — still one
    codegen expression, no UDF.  ``points`` are (lat, lon) vertices; the
    polygon closes itself.  Uses planar lon/lat geometry (the same
    approximation ES's default does for small polygons).

    NOTE: vertices must not repeat a latitude exactly with their edge
    partner (horizontal edges) — the crossing-test division is then
    degenerate; perturb such a vertex by an epsilon."""
    if len(points) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    inside = F.lit(False)
    n = len(points)
    for i in range(n):
        yi, xi = (float(v) for v in points[i])
        yj, xj = (float(v) for v in points[(i + 1) % n])
        crosses = (
            ((F.lit(yi) > lat) != (F.lit(yj) > lat))
            & (
                lon
                < (F.lit(xj) - F.lit(xi)) * (lat - F.lit(yi)) / (F.lit(yj) - F.lit(yi))
                + F.lit(xi)
            )
        )
        inside = inside != crosses  # boolean != is XOR
    return inside
