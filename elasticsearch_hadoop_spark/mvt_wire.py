"""Mapbox Vector Tile 2.1 wire encoding for the ``_mvt`` layers.

``mvt.py`` computes ES's two data layers (hits / aggs grid) as
DataFrames; this module turns ONE tile's collected rows into the binary
protobuf tile a map client consumes — closing the "wire format out of
scope" gap as a driver-side serializer.  Pure Python against the PUBLIC
MVT 2.1 spec (github.com/mapbox/vector-tile-spec) and protobuf wire
format (protobuf.dev/programming-guides/encoding): varints,
length-delimited messages, packed repeated fields, zigzag geometry
deltas.  No protobuf library needed — the vector_tile schema is small
and fixed.

Scale shape: encoding is per-TILE and the tile frames are bounded by
construction (hits paged by the caller's orderBy/limit; grid cells
capped at 4^grid_precision <= 65536, further cut by sort_by/size), so
the collect + encode is O(tile) at any corpus size — the same bounded
driver-side rendering as catalog.sql_page.  A tile-set export fans out
per tile, each tile independent.

Layer shapes follow ES's documented _mvt response: ``hits`` = point
features (one per doc, properties from the carried columns), ``aggs`` =
one polygon feature per grid cell (the cell's pixel box) with
``_count`` and the metric sub-aggs as properties — plus, when the grid
was computed ``with_labels``, one point feature per cell at the label
position flagged ``_mvt_label_position: true`` (ES 8.15's label
features) — and ``meta`` = one polygon feature covering the tile with
caller-supplied properties.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping

from elasticsearch_hadoop_spark.mvt import MvtError

# vector_tile.proto field numbers (spec 2.1)
_T_LAYER = 3
_L_VERSION, _L_NAME, _L_FEATURE, _L_KEY, _L_VALUE, _L_EXTENT = 15, 1, 2, 3, 4, 5
_F_ID, _F_TAGS, _F_TYPE, _F_GEOM = 1, 2, 3, 4
_V_STRING, _V_DOUBLE, _V_INT = 1, 3, 4
_V_BOOL = 7
_GEOM_POINT, _GEOM_POLYGON = 1, 3
_CMD_MOVETO, _CMD_LINETO, _CMD_CLOSEPATH = 1, 2, 7


def _varint(n: int) -> bytes:
    if n < 0:
        raise MvtError(f"varint must be non-negative: {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, ints: Iterable[int]) -> bytes:
    body = b"".join(_varint(i) for i in ints)
    return _len_delim(field, body)


def _value(v) -> bytes:
    """One vector_tile.Tile.Value message."""
    if isinstance(v, bool):
        return _tag(_V_BOOL, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        if v < 0:
            # sint64 field keeps negatives one varint, like real encoders
            return _tag(6, 0) + _varint(_zigzag(v))
        return _tag(_V_INT, 0) + _varint(v)
    if isinstance(v, float):
        import struct

        return _tag(_V_DOUBLE, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        return _len_delim(_V_STRING, v.encode("utf-8"))
    raise MvtError(f"unsupported property type {type(v).__name__}: {v!r}")


def _point_geom(px: int, py: int) -> list[int]:
    return [(_CMD_MOVETO | (1 << 3)), _zigzag(px), _zigzag(py)]


def _box_geom(x0: int, y0: int, x1: int, y1: int) -> list[int]:
    """A pixel-aligned box as an MVT polygon: exterior ring wound so its
    surveyor-formula area is positive in the spec's y-down coordinates
    (CW on screen), MoveTo + 3 LineTo + ClosePath."""
    if x1 <= x0 or y1 <= y0:
        raise MvtError(f"degenerate box ({x0},{y0})..({x1},{y1})")
    return [
        (_CMD_MOVETO | (1 << 3)), _zigzag(x0), _zigzag(y0),
        (_CMD_LINETO | (3 << 3)),
        _zigzag(x1 - x0), _zigzag(0),   # east
        _zigzag(0), _zigzag(y1 - y0),   # south (y grows downward)
        _zigzag(x0 - x1), _zigzag(0),   # west
        (_CMD_CLOSEPATH | (1 << 3)),
    ]


class _Layer:
    """Accumulates features with per-layer key/value interning (the
    spec's dictionary encoding: tags are (key_idx, value_idx) pairs)."""

    def __init__(self, name: str, extent: int):
        self.name, self.extent = name, extent
        self.keys: dict[str, int] = {}
        self.values: dict[bytes, int] = {}
        self.features: list[bytes] = []

    def _intern(self, props: Mapping) -> list[int]:
        tags: list[int] = []
        for k, v in props.items():
            if v is None:
                continue  # protobuf has no null Value; ES omits the tag
            ki = self.keys.setdefault(str(k), len(self.keys))
            vb = _value(v)
            vi = self.values.setdefault(vb, len(self.values))
            tags += [ki, vi]
        return tags

    def add(self, geom_type: int, geometry: list[int], props: Mapping,
            fid: int | None = None) -> None:
        body = b""
        if fid is not None:
            body += _tag(_F_ID, 0) + _varint(int(fid))
        body += _packed(_F_TAGS, self._intern(props))
        body += _tag(_F_TYPE, 0) + _varint(geom_type)
        body += _packed(_F_GEOM, geometry)
        self.features.append(body)

    def encode(self) -> bytes:
        body = _tag(_L_VERSION, 0) + _varint(2)
        body += _len_delim(_L_NAME, self.name.encode("utf-8"))
        for f in self.features:
            body += _len_delim(_L_FEATURE, f)
        for k in self.keys:  # insertion order == index order
            body += _len_delim(_L_KEY, k.encode("utf-8"))
        for vb in self.values:
            body += _len_delim(_L_VALUE, vb)
        body += _tag(_L_EXTENT, 0) + _varint(self.extent)
        return _len_delim(_T_LAYER, body)


def _cell_box(cell: str, z: int, x: int, y: int, extent: int) -> tuple[int, int, int, int]:
    """Pixel box of grid cell "z2/cx/cy" inside tile z/x/y."""
    try:
        z2s, cxs, cys = cell.split("/")
        z2, cx, cy = int(z2s), int(cxs), int(cys)
    except (ValueError, AttributeError):
        raise MvtError(f"bad grid cell key {cell!r}") from None
    p = z2 - z
    if p < 0:
        raise MvtError(f"cell zoom {z2} below tile zoom {z}")
    if p > 29:
        raise MvtError(f"cell zoom {z2} exceeds the zoom ceiling for tile zoom {z}")
    span = extent / (1 << p)  # pixels per cell (may be fractional)
    x0 = (cx - (x << p)) * span
    y0 = (cy - (y << p)) * span
    if not (0 <= x0 < extent and 0 <= y0 < extent):
        raise MvtError(f"cell {cell!r} outside tile {z}/{x}/{y}")
    x0i, y0i = int(math.floor(x0)), int(math.floor(y0))
    x1i = min(int(math.ceil(x0 + span)), extent)
    y1i = min(int(math.ceil(y0 + span)), extent)
    return x0i, y0i, max(x1i, x0i + 1), max(y1i, y0i + 1)


def encode_tile(
    z: int,
    x: int,
    y: int,
    hits: Iterable[Mapping] | None = None,
    grid: Iterable[Mapping] | None = None,
    meta_props: Mapping | None = None,
    extent: int = 4096,
) -> bytes:
    """Encode one tile's collected layer rows as MVT 2.1 protobuf bytes.

    ``hits`` rows need ``px``/``py`` (mvt_hits' pixel columns); every
    other column becomes a feature property.  ``grid`` rows need
    ``cell`` (mvt_grid's "z/x/y" key); ``doc_count`` renders as ES's
    ``_count`` property, ``label_x``/``label_y`` (if present) emit the
    extra label-position point feature, remaining columns become
    properties.  ``meta_props`` go on the meta layer's tile-box feature.
    Feature ids number sequentially per layer (ES does not promise doc
    ids in the tile)."""
    from elasticsearch_hadoop_spark.mvt import tile_envelope

    tile_envelope(z, x, y)  # validates
    if extent <= 0:
        raise MvtError(f"extent must be positive: {extent}")
    out = b""
    if hits is not None:
        layer = _Layer("hits", extent)
        for i, row in enumerate(hits):
            row = dict(row)
            try:
                px, py = int(row.pop("px")), int(row.pop("py"))
            except (KeyError, TypeError, ValueError):
                raise MvtError(
                    "hits rows need integer px/py (use mvt_hits)"
                ) from None
            layer.add(_GEOM_POINT, _point_geom(px, py), row, fid=i + 1)
        out += layer.encode()
    if grid is not None:
        layer = _Layer("aggs", extent)
        labels: list[tuple[int, int, Mapping]] = []
        for i, row in enumerate(grid):
            row = dict(row)
            try:
                cell = row.pop("cell")
            except KeyError:
                raise MvtError("grid rows need cell (use mvt_grid)") from None
            lx, ly = row.pop("label_x", None), row.pop("label_y", None)
            if "doc_count" in row:
                row["_count"] = row.pop("doc_count")
            row["_key"] = cell
            box = _cell_box(cell, z, x, y, extent)
            layer.add(_GEOM_POLYGON, _box_geom(*box), row, fid=i + 1)
            if lx is not None and ly is not None:
                labels.append((int(lx), int(ly), row))
        for j, (lx, ly, row) in enumerate(labels):
            layer.add(
                _GEOM_POINT,
                _point_geom(lx, ly),
                {**row, "_mvt_label_position": True},
                fid=len(layer.features) + 1,
            )
        out += layer.encode()
    meta = _Layer("meta", extent)
    meta.add(
        _GEOM_POLYGON,
        _box_geom(0, 0, extent, extent),
        dict(meta_props or {}),
        fid=1,
    )
    out += meta.encode()
    return out
