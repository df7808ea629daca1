"""Vector-tile search (`GET /<index>/_mvt/<field>/<z>/<x>/<y>`) — the
analytics core of ES's Mapbox-vector-tile endpoint, as DataFrames.

ES's _mvt response is a protobuf tile with three layers: ``hits`` (doc
geometries re-projected to tile-local integer coordinates), ``aggs`` (a
geotile sub-grid of cells inside the tile with per-cell counts /
sub-aggs), and ``meta``.  This engine computes the two data layers as
DataFrames with exactly ES's coordinate and grid semantics — Web-Mercator
projection, tile-local [0, extent) integer pixels, ``z+grid_precision``
sub-cells — and leaves the protobuf wire encoding out of scope (a pure
serialization concern, like the JSON-vs-Arrow distinction elsewhere in
the engine; document rendering belongs to the map client).

Tile MEMBERSHIP is defined by geotile cell equality, not a raw fraction
filter: a doc belongs to tile z/x/y iff its clamped global geotile index
at zoom z equals (x, y) — functions/geo.geotile_cell_xy, the SAME
expression the geotile_grid agg uses — so lon=180 and out-of-domain
latitudes land in the world-edge tile exactly like the agg's edge cells
instead of vanishing from every tile (and a doc is never double-counted
into two adjacent tiles).

Scale: both layers are one codegen projection + (for the grid) one hash
aggregation over the rows inside the tile — the membership predicate is
ordinary min/max Column math that rides the scan, so a 100 TB corpus
pays only for the tile's rows.  No UDF, no shuffle beyond the grid's
groupBy.

Upstream parity: semantics per the public _mvt API docs (extent 4096,
grid_precision 8, geotile grid keys "z/x/y").
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.functions.geo import geotile_cell_xy


class MvtError(ValueError):
    pass


def tile_envelope(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(lon_min, lon_max, lat_min, lat_max) of slippy tile z/x/y."""
    if not 0 <= z <= 29:
        raise MvtError(f"zoom {z} out of range 0..29")
    n = 1 << z
    if not (0 <= x < n and 0 <= y < n):
        raise MvtError(f"tile {x}/{y} out of range for zoom {z}")
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    lat_max = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
    lat_min = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n))))
    return lon_min, lon_max, lat_min, lat_max


def _member(field: str, z: int, x: int, y: int) -> Column:
    """Tile membership = clamped geotile cell equality at zoom z."""
    gx, gy = geotile_cell_xy(F.col(f"{field}.lat"), F.col(f"{field}.lon"), z)
    return (gx == x) & (gy == y)


def _fractions(field: str, z: int, x: int, y: int) -> tuple[Column, Column]:
    """Tile-local (fx, fy) for a struct(lat, lon) geo_point — the
    Web-Mercator forward projection shifted to the tile origin.  May
    stray marginally outside [0, 1) for members clamped in from the
    world edge; consumers clamp the derived integer coordinate."""
    n = float(1 << z)
    lat = F.col(f"{field}.lat")
    lon = F.col(f"{field}.lon")
    lat = F.greatest(F.lit(-85.05112878), F.least(F.lit(85.05112878), lat))
    rad = F.radians(lat)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    fx = (lon + 180.0) / 360.0 * n - float(x)
    fy = (F.lit(1.0) - merc / F.lit(math.pi)) / 2.0 * n - float(y)
    return fx, fy


def mvt_hits(
    df: DataFrame,
    field: str,
    z: int,
    x: int,
    y: int,
    extent: int = 4096,
    fields: list[str] | None = None,
) -> DataFrame:
    """The ``hits`` layer: rows whose geo_point falls inside tile z/x/y
    (geotile cell equality — see module docstring), with tile-local
    integer pixel columns ``px``/``py`` clamped to [0, extent) (y grows
    southward, MVT's convention).  ``fields`` selects the property
    columns carried along (default: all non-geometry columns).  Callers
    page with their own orderBy/limit — ES's ``size`` is a
    TakeOrderedAndProject here, not an arbitrary-shard-order cut."""
    tile_envelope(z, x, y)  # validates z/x/y
    if extent <= 0:
        raise MvtError(f"extent must be positive: {extent}")
    fx, fy = _fractions(field, z, x, y)
    keep = fields if fields is not None else [c for c in df.columns if c != field]
    px = F.greatest(
        F.least(F.floor(fx * extent), F.lit(extent - 1)), F.lit(0)
    ).cast("long")
    py = F.greatest(
        F.least(F.floor(fy * extent), F.lit(extent - 1)), F.lit(0)
    ).cast("long")
    return df.filter(_member(field, z, x, y)).select(
        *keep, px.alias("px"), py.alias("py")
    )


def mvt_grid(
    df: DataFrame,
    field: str,
    z: int,
    x: int,
    y: int,
    grid_precision: int = 8,
) -> DataFrame:
    """The ``aggs`` layer: geotile cells at zoom ``z + grid_precision``
    inside tile z/x/y, keyed "z/x/y" like the geotile_grid agg, with
    ``doc_count`` and the cell centroid of the contained points — ES's
    default grid layer.  Cell indices come from the SAME shared
    geotile_cell_xy expression as the standalone agg, so a tile's
    sub-cells ARE that agg's buckets at zoom z+grid_precision.
    grid_precision 0..8 (ES's own bound)."""
    if not 0 <= grid_precision <= 8:
        raise MvtError(f"grid_precision {grid_precision} out of range 0..8")
    tile_envelope(z, x, y)
    z2 = z + grid_precision
    if z2 > 29:
        raise MvtError(f"z + grid_precision = {z2} exceeds the zoom ceiling 29")
    gx2, gy2 = geotile_cell_xy(
        F.col(f"{field}.lat"), F.col(f"{field}.lon"), z2
    )
    key = F.concat_ws(
        "/", F.lit(str(z2)), gx2.cast("string"), gy2.cast("string")
    )
    return (
        df.filter(_member(field, z, x, y))
        .groupBy(key.alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.avg(F.col(f"{field}.lat")).alias("centroid_lat"),
            F.avg(F.col(f"{field}.lon")).alias("centroid_lon"),
        )
    )
