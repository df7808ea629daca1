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


def geotile_cell_xy(lat: Column, lon: Column, zoom: int):
    """Global Web-Mercator (slippy) tile indices at ``zoom`` with ES's
    edge clamps — lon 180 / out-of-domain latitudes land in the last
    cell, never outside the grid.  THE single source of the geotile
    arithmetic: the geotile_grid agg, the _mvt layers, and any future
    tile consumer must share this exact expression tree so their cells
    agree bit-for-bit (the consistency contract ES documents between
    _mvt grids and geotile_grid buckets)."""
    import math

    n = float(1 << zoom)
    lat = F.greatest(F.lit(-85.05112878), F.least(F.lit(85.05112878), lat))
    rad = F.radians(lat)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    x = F.floor((lon + 180.0) / 360.0 * n)
    y = F.floor((1.0 - merc / F.lit(math.pi)) / 2.0 * n)
    x = F.least(x, F.lit(int(n) - 1)).cast("long")
    y = F.greatest(F.least(y, F.lit(int(n) - 1)), F.lit(0)).cast("long")
    return x, y


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


# --- shape-vs-shape relations (geo_shape over shape-typed fields) ---------
#
# The engine's shape storage (SURVEY.md §1.2 extension; upstream keeps
# shapes as opaque mapped docs and delegates the relation to the server):
#   envelope field: struct<min_lon double, min_lat double,
#                          max_lon double, max_lat double>
#   polygon  field: array<struct<lon double, lat double>> — one ring,
#                   open or closed (a closing duplicate vertex yields a
#                   degenerate wrap edge that every test below ignores)
# Query shape: an ES `envelope` [[minLon, maxLat], [maxLon, minLat]].
# Everything is planar lon/lat Column math (same small-shape model the
# point-vs-shape subset documents), whole-stage codegen, no UDF.


def _poly_edges(vertices: Column) -> Column:
    """Consecutive vertex pairs incl. the closing wrap edge:
    array<struct<p, q>> over array<struct<lon, lat>>.  An empty ring
    yields an empty edge array (slice throws on a negative length, so
    clamp) — every relation then simply evaluates false for the row
    instead of aborting the job."""
    n = F.size(vertices)
    nxt = F.concat(
        F.slice(vertices, 2, F.greatest(n - 1, F.lit(0))), F.slice(vertices, 1, 1)
    )
    return F.zip_with(vertices, nxt, lambda a, b: F.struct(a.alias("p"), b.alias("q")))


def point_in_polygon_column(px: Column, py: Column, vertices: Column) -> Column:
    """Even-odd ray cast of one (px, py) against a COLUMN polygon (the
    literal-vertex twin is geo_polygon_filter).  Horizontal and degenerate
    edges contribute no crossing (the lat-straddle test is false before
    the division can go IEEE-infinite)."""
    return F.aggregate(
        _poly_edges(vertices),
        F.lit(False),
        lambda acc, e: acc
        != (
            ((e["p"]["lat"] > py) != (e["q"]["lat"] > py))
            & (
                px
                < (e["q"]["lon"] - e["p"]["lon"])
                * (py - e["p"]["lat"])
                / (e["q"]["lat"] - e["p"]["lat"])
                + e["p"]["lon"]
            )
        ),
    )


def _edge_hits_envelope(e: Column, q: tuple[float, float, float, float]) -> Column:
    """Closed segment vs closed axis-aligned rectangle, exactly, by the
    separating-axis test (axes: x, y, and the segment normal — complete
    for a segment/box pair).  Touching counts as a hit, like ES
    `intersects`.  Pure multiply/compare — no division."""
    qminx, qminy, qmaxx, qmaxy = (float(v) for v in q)
    ax, ay = e["p"]["lon"], e["p"]["lat"]
    bx, by = e["q"]["lon"], e["q"]["lat"]
    overlap_x = (F.greatest(ax, bx) >= qminx) & (F.least(ax, bx) <= qmaxx)
    overlap_y = (F.greatest(ay, by) >= qminy) & (F.least(ay, by) <= qmaxy)
    dx, dy = bx - ax, by - ay
    cross = [
        dx * (F.lit(cy) - ay) - dy * (F.lit(cx) - ax)
        for cx, cy in (
            (qminx, qminy), (qminx, qmaxy), (qmaxx, qminy), (qmaxx, qmaxy),
        )
    ]
    all_pos = cross[0] > 0
    all_neg = cross[0] < 0
    for c in cross[1:]:
        all_pos = all_pos & (c > 0)
        all_neg = all_neg & (c < 0)
    return overlap_x & overlap_y & ~(all_pos | all_neg)


def polygon_envelope_relation(
    vertices: Column, q: tuple[float, float, float, float], relation: str
) -> Column:
    """Exact polygon-vs-envelope relations over a COLUMN polygon:

    - ``intersects``: some polygon edge meets the box (SAT, covers every
      partial overlap and polygon-inside-box) OR a box corner lies inside
      the polygon (box strictly inside the polygon — no edge contact);
    - ``within``: every vertex inside the box (exact: the box is convex);
    - ``disjoint``: the negation of intersects (null-guarded).

    ``contains`` (polygon ⊇ box) is NOT offered: the exact test needs
    open-set edge/interior distinctions this closed-set algebra can't
    express without approximating — reject, don't approximate."""
    qminx, qminy, qmaxx, qmaxy = (float(v) for v in q)
    if relation == "within":
        return (F.size(vertices) >= 3) & F.forall(
            vertices,
            lambda v: v["lon"].between(qminx, qmaxx) & v["lat"].between(qminy, qmaxy),
        )
    intersects = F.exists(
        _poly_edges(vertices), lambda e: _edge_hits_envelope(e, q)
    ) | point_in_polygon_column(F.lit(qminx), F.lit(qminy), vertices)
    if relation == "intersects":
        return intersects
    if relation == "disjoint":
        return vertices.isNotNull() & (F.size(vertices) >= 1) & ~intersects
    raise ValueError(
        f"polygon_envelope_relation: unsupported relation {relation!r} "
        "(supported: intersects, within, disjoint)"
    )


def envelope_envelope_relation(
    env: Column, q: tuple[float, float, float, float], relation: str
) -> Column:
    """Exact envelope-vs-envelope relations (pure interval arithmetic):
    intersects / within / contains / disjoint."""
    qminx, qminy, qmaxx, qmaxy = (float(v) for v in q)
    lo_x, lo_y = env["min_lon"], env["min_lat"]
    hi_x, hi_y = env["max_lon"], env["max_lat"]
    if relation == "intersects":
        return (lo_x <= qmaxx) & (hi_x >= qminx) & (lo_y <= qmaxy) & (hi_y >= qminy)
    if relation == "within":
        return (lo_x >= qminx) & (hi_x <= qmaxx) & (lo_y >= qminy) & (hi_y <= qmaxy)
    if relation == "contains":
        return (lo_x <= qminx) & (hi_x >= qmaxx) & (lo_y <= qminy) & (hi_y >= qmaxy)
    if relation == "disjoint":
        return (
            env.isNotNull()
            & ~((lo_x <= qmaxx) & (hi_x >= qminx) & (lo_y <= qmaxy) & (hi_y >= qminy))
        )
    raise ValueError(
        f"envelope_envelope_relation: unsupported relation {relation!r}"
    )
