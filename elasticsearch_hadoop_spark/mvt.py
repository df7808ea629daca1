"""Vector-tile search (`GET /<index>/_mvt/<field>/<z>/<x>/<y>`) — the
analytics core of ES's Mapbox-vector-tile endpoint, as DataFrames.

ES's _mvt response is a protobuf tile with three layers: ``hits`` (doc
geometries re-projected to tile-local integer coordinates), ``aggs`` (a
geotile sub-grid of cells inside the tile with per-cell counts /
sub-aggs), and ``meta``.  This engine computes the two data layers as
DataFrames with exactly ES's coordinate and grid semantics — Web-Mercator
projection, tile-local [0, extent) integer pixels, ``z+grid_precision``
sub-cells.  The protobuf wire encoding lives in ``mvt_wire.encode_tile``
(round 11): a pure-Python MVT 2.1 serializer over ONE tile's collected
rows — bounded driver-side rendering, since the per-tile frames are
capped by construction.

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


def _fractions_cols(
    lat: Column, lon: Column, z: int, x: int, y: int
) -> tuple[Column, Column]:
    """Tile-local (fx, fy) for lat/lon Columns — the Web-Mercator forward
    projection shifted to the tile origin.  May stray marginally outside
    [0, 1) for members clamped in from the world edge; consumers clamp
    the derived integer coordinate."""
    n = float(1 << z)
    lat = F.greatest(F.lit(-85.05112878), F.least(F.lit(85.05112878), lat))
    rad = F.radians(lat)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    fx = (lon + 180.0) / 360.0 * n - float(x)
    fy = (F.lit(1.0) - merc / F.lit(math.pi)) / 2.0 * n - float(y)
    return fx, fy


def _fractions(field: str, z: int, x: int, y: int) -> tuple[Column, Column]:
    return _fractions_cols(F.col(f"{field}.lat"), F.col(f"{field}.lon"), z, x, y)


def _pixel(frac: Column, extent: int) -> Column:
    """Fraction -> tile-local integer pixel, clamped to [0, extent)."""
    return F.greatest(
        F.least(F.floor(frac * extent), F.lit(extent - 1)), F.lit(0)
    ).cast("long")


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
    return df.filter(_member(field, z, x, y)).select(
        *keep, _pixel(fx, extent).alias("px"), _pixel(fy, extent).alias("py")
    )


def mvt_grid(
    df: DataFrame,
    field: str,
    z: int,
    x: int,
    y: int,
    grid_precision: int = 8,
    extent: int = 4096,
    with_labels: bool = False,
    aggs: dict[str, dict] | None = None,
    sort_by: str | None = None,
    size: int | None = None,
) -> DataFrame:
    """The ``aggs`` layer: geotile cells at zoom ``z + grid_precision``
    inside tile z/x/y, keyed "z/x/y" like the geotile_grid agg, with
    ``doc_count`` and the cell centroid of the contained points — ES's
    default grid layer.  Cell indices come from the SAME shared
    geotile_cell_xy expression as the standalone agg, so a tile's
    sub-cells ARE that agg's buckets at zoom z+grid_precision.
    grid_precision 0..8 (ES's own bound).

    ``aggs`` attaches per-cell METRIC sub-aggregations in the standard
    aggs-DSL metric spelling (``{"max_v": {"max": {"field": "v"}}}``) —
    ES's _mvt accepts exactly the metric subset in a tile body; they
    compile through the same aggs_dsl metric compiler as the standalone
    agg, so every cell value matches the geotile_grid rendering.

    ``with_labels`` (ES 8.15's endpoint option) adds the label POSITION
    for each cell — the centroid projected to tile-local integer pixels
    (``label_x``/``label_y``, clamped to [0, extent)), the same pixel
    math as the hits layer so a map client can place cell labels without
    re-projecting.

    ``sort_by`` orders cells by one of the aggregate columns DESCENDING
    (``"_count"`` = doc_count, or a key from ``aggs``), cell-key
    tie-break, and ``size`` keeps the top cells — the densest/heaviest
    cells of the tile as a TakeOrderedAndProject, never a global sort.

    Everything stays one hash aggregation + codegen projections: labels
    and sort add no extra shuffle or pass over the data."""
    if not 0 <= grid_precision <= 8:
        raise MvtError(f"grid_precision {grid_precision} out of range 0..8")
    tile_envelope(z, x, y)
    if extent <= 0:
        raise MvtError(f"extent must be positive: {extent}")
    z2 = z + grid_precision
    if z2 > 29:
        raise MvtError(f"z + grid_precision = {z2} exceeds the zoom ceiling 29")
    gx2, gy2 = geotile_cell_xy(
        F.col(f"{field}.lat"), F.col(f"{field}.lon"), z2
    )
    key = F.concat_ws(
        "/", F.lit(str(z2)), gx2.cast("string"), gy2.cast("string")
    )
    agg_cols = [
        F.count(F.lit(1)).alias("doc_count"),
        F.avg(F.col(f"{field}.lat")).alias("centroid_lat"),
        F.avg(F.col(f"{field}.lon")).alias("centroid_lon"),
    ]
    if aggs:
        from elasticsearch_hadoop_spark.aggs_dsl import _metric

        reserved = {"cell", "doc_count", "centroid_lat", "centroid_lon",
                    "label_x", "label_y"}
        for name, body in aggs.items():
            if name in reserved:
                raise MvtError(f"sub-agg name {name!r} collides with a grid column")
            agg_cols.extend(_metric(name, body))
    out = df.filter(_member(field, z, x, y)).groupBy(key.alias("cell")).agg(*agg_cols)
    if with_labels:
        lfx, lfy = _fractions_cols(
            F.col("centroid_lat"), F.col("centroid_lon"), z, x, y
        )
        out = out.withColumn("label_x", _pixel(lfx, extent)).withColumn(
            "label_y", _pixel(lfy, extent)
        )
    if sort_by is not None:
        col = "doc_count" if sort_by == "_count" else sort_by
        if col not in out.columns:
            raise MvtError(
                f"sort_by {sort_by!r} is not an aggregate of this tile "
                f"(have {sorted(out.columns)})"
            )
        out = out.orderBy(F.col(col).desc(), F.col("cell").asc())
        if size is not None:
            out = out.limit(int(size))
    elif size is not None:
        raise MvtError("size without sort_by would cut cells in arbitrary order")
    return out
