"""MVT 2.1 wire encoding: an independent minimal protobuf decoder
(written from the public wire-format spec, not from the encoder) parses
the tile back and the content must match the DataFrame layers."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.mvt import MvtError, mvt_grid, mvt_hits
from elasticsearch_hadoop_spark.mvt_wire import encode_tile


# ------------------------------------------------------- tiny pb reader


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        byte = b[i]
        n |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return n, i
        shift += 7


def _fields(b: bytes):
    i = 0
    while i < len(b):
        key, i = _read_varint(b, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(b, i)
        elif wire == 1:
            v, i = b[i : i + 8], i + 8
        elif wire == 2:
            ln, i = _read_varint(b, i)
            v, i = b[i : i + ln], i + ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        yield field, wire, v


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _decode_value(b: bytes):
    for field, _wire, v in _fields(b):
        if field == 1:
            return v.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 4:
            return v
        if field == 6:
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    raise AssertionError("empty Value")


def _decode_packed(b: bytes) -> list[int]:
    out, i = [], 0
    while i < len(b):
        v, i = _read_varint(b, i)
        out.append(v)
    return out


def _decode_geom(ints: list[int]):
    """-> list of (command, [(dx, dy), ...])"""
    out, i = [], 0
    while i < len(ints):
        cmd, count = ints[i] & 7, ints[i] >> 3
        i += 1
        pts = []
        if cmd != 7:  # ClosePath has no params
            for _ in range(count):
                pts.append((_unzigzag(ints[i]), _unzigzag(ints[i + 1])))
                i += 2
        out.append((cmd, count, pts))
    return out


def _decode_tile(b: bytes) -> dict:
    layers = {}
    for field, _w, payload in _fields(b):
        assert field == 3
        name, extent, version = None, None, None
        keys, values, feats = [], [], []
        for lf, _lw, lv in _fields(payload):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 15:
                version = lv
            elif lf == 5:
                extent = lv
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                values.append(_decode_value(lv))
            elif lf == 2:
                f = {"id": None, "tags": [], "type": None, "geom": []}
                for ff, _fw, fv in _fields(lv):
                    if ff == 1:
                        f["id"] = fv
                    elif ff == 2:
                        f["tags"] = _decode_packed(fv)
                    elif ff == 3:
                        f["type"] = fv
                    elif ff == 4:
                        f["geom"] = _decode_geom(_decode_packed(fv))
                feats.append(f)
        for f in feats:
            f["props"] = {
                keys[f["tags"][j]]: values[f["tags"][j + 1]]
                for j in range(0, len(f["tags"]), 2)
            }
        layers[name] = {"extent": extent, "version": version, "features": feats}
    return layers


# ------------------------------------------------------------- the tests


def test_point_and_meta_round_trip():
    tile = encode_tile(
        0, 0, 0,
        hits=[
            {"px": 10, "py": 20, "name": "a", "n": 3, "score": 1.5, "ok": True},
            {"px": 4095, "py": 0, "name": "b", "n": -2, "score": None},
        ],
        meta_props={"hits.total": 2},
    )
    assert tile[0] == 0x1A  # field 3, wire 2 — a Tile.layers entry
    layers = _decode_tile(tile)
    assert set(layers) == {"hits", "meta"}
    hits = layers["hits"]
    assert hits["version"] == 2 and hits["extent"] == 4096
    f0, f1 = hits["features"]
    assert f0["type"] == 1 and f0["geom"] == [(1, 1, [(10, 20)])]
    assert f0["props"] == {"name": "a", "n": 3, "score": 1.5, "ok": True}
    assert f1["geom"] == [(1, 1, [(4095, 0)])]
    assert f1["props"] == {"name": "b", "n": -2}  # None dropped, -2 zigzags
    meta = layers["meta"]["features"][0]
    assert meta["type"] == 3 and meta["props"] == {"hits.total": 2}
    # the meta box covers the tile: MoveTo(0,0), 3 LineTo deltas, Close
    cmds = meta["geom"]
    assert cmds[0] == (1, 1, [(0, 0)])
    assert cmds[1] == (2, 3, [(4096, 0), (0, 4096), (-4096, 0)])
    assert cmds[2][0] == 7


def test_grid_cells_box_and_labels():
    tile = encode_tile(
        2, 1, 1,
        grid=[
            {"cell": "4/4/4", "doc_count": 7, "max_v": 2.0,
             "label_x": 100, "label_y": 200},
        ],
    )
    aggs = _decode_tile(tile)["aggs"]
    cell, label = aggs["features"]
    assert cell["type"] == 3
    # z2=4, p=2 -> 4 cells per axis, span 1024 px; cell (4,4) of tile
    # (1,1) is the tile-local (0,0) cell
    assert cell["geom"][0] == (1, 1, [(0, 0)])
    assert cell["geom"][1] == (2, 3, [(1024, 0), (0, 1024), (-1024, 0)])
    assert cell["props"]["_count"] == 7
    assert cell["props"]["_key"] == "4/4/4"
    assert cell["props"]["max_v"] == 2.0
    assert label["type"] == 1 and label["geom"] == [(1, 1, [(100, 200)])]
    assert label["props"]["_mvt_label_position"] is True
    assert label["props"]["_count"] == 7


def test_key_value_interning_dedupes():
    tile = encode_tile(
        0, 0, 0,
        hits=[{"px": 1, "py": 1, "k": "same"}, {"px": 2, "py": 2, "k": "same"}],
    )
    # one key + one value entry despite two features using them
    raw = _decode_tile(tile)["hits"]
    assert raw["features"][0]["props"] == raw["features"][1]["props"]
    assert tile.count(b"same") == 1


def test_validation_errors():
    with pytest.raises(MvtError, match="px/py"):
        encode_tile(0, 0, 0, hits=[{"name": "x"}])
    with pytest.raises(MvtError, match="cell"):
        encode_tile(0, 0, 0, grid=[{"doc_count": 1}])
    with pytest.raises(MvtError, match="outside"):
        encode_tile(2, 1, 1, grid=[{"cell": "4/0/0", "doc_count": 1}])
    with pytest.raises(MvtError, match="below"):
        encode_tile(2, 1, 1, grid=[{"cell": "1/0/0", "doc_count": 1}])
    with pytest.raises(MvtError, match="ceiling"):
        encode_tile(0, 0, 0, grid=[{"cell": "30/0/0", "doc_count": 1}])
    with pytest.raises(MvtError, match="integer px/py"):
        encode_tile(0, 0, 0, hits=[{"px": None, "py": 3}])
    with pytest.raises(MvtError, match="bad grid cell"):
        encode_tile(0, 0, 0, grid=[{"cell": None, "doc_count": 1}])
    with pytest.raises(MvtError, match="unsupported property"):
        encode_tile(0, 0, 0, hits=[{"px": 1, "py": 1, "bad": [1, 2]}])


def test_end_to_end_from_dataframes(spark):
    rows = [
        (1, 10.0, 20.0, "a"),
        (2, 10.5, 20.5, "b"),
        (3, -40.0, -100.0, "elsewhere"),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, tag string")
    df = df.withColumn("pt", F.struct("lat", "lon")).drop("lat", "lon")
    z, x, y = 2, 2, 1  # tile containing (10..21E-ish lon 20?) — compute membership via engine
    hits_df = mvt_hits(df, "pt", z, x, y, fields=["id", "tag"])
    grid_df = mvt_grid(df, "pt", z, x, y, grid_precision=2, with_labels=True)
    hits = [r.asDict() for r in hits_df.orderBy("id").collect()]
    grid = [r.asDict() for r in grid_df.orderBy("cell").collect()]
    assert hits, "fixture points must fall inside the chosen tile"
    tile = encode_tile(z, x, y, hits=hits, grid=grid,
                       meta_props={"hits.total": len(hits)})
    layers = _decode_tile(tile)
    got_ids = sorted(f["props"]["id"] for f in layers["hits"]["features"])
    assert got_ids == [r["id"] for r in hits]
    for f, r in zip(layers["hits"]["features"],
                    sorted(hits, key=lambda r: r["id"])):
        assert f["geom"] == [(1, 1, [(r["px"], r["py"])])]
    cells = [f for f in layers["aggs"]["features"] if f["type"] == 3]
    labels = [f for f in layers["aggs"]["features"] if f["type"] == 1]
    assert {f["props"]["_key"] for f in cells} == {r["cell"] for r in grid}
    assert len(labels) == len(cells)
    assert layers["meta"]["features"][0]["props"] == {"hits.total": len(hits)}
