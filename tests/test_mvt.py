"""Vector-tile search layers (elasticsearch_hadoop_spark/mvt.py):
Web-Mercator tile-local projection and the geotile sub-grid, checked
against independent Python math."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.mvt import MvtError, mvt_grid, mvt_hits, tile_envelope


def _merc_fy(lat: float, z: int, y: int) -> float:
    lat = max(-85.05112878, min(85.05112878, lat))
    r = math.radians(lat)
    merc = math.log(math.tan(r) + 1.0 / math.cos(r))
    return (1 - merc / math.pi) / 2 * (1 << z) - y


def _fx(lon: float, z: int, x: int) -> float:
    return (lon + 180.0) / 360.0 * (1 << z) - x


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id int, lat double, lon double").select(
        "id", F.struct("lat", "lon").alias("loc")
    )


def test_tile_envelope_known():
    lon0, lon1, lat0, lat1 = tile_envelope(0, 0, 0)
    assert (lon0, lon1) == (-180.0, 180.0)
    assert lat1 == pytest.approx(85.05112878, abs=1e-6)
    assert lat0 == pytest.approx(-85.05112878, abs=1e-6)
    lon0, lon1, lat0, lat1 = tile_envelope(1, 1, 0)
    assert (lon0, lon1) == (0.0, 180.0)
    assert lat0 == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(MvtError):
        tile_envelope(1, 2, 0)
    with pytest.raises(MvtError):
        tile_envelope(30, 0, 0)


def test_hits_projection_and_envelope_filter(spark):
    z, x, y = 1, 1, 0
    df = _pts(
        spark,
        [
            (1, 40.0, 90.0),    # inside
            (2, 40.0, -90.0),   # west of the tile
            (3, -40.0, 90.0),   # south of the tile
            (4, 0.0, 90.0),     # ON the equator edge: belongs to y=1, not y=0
        ],
    )
    out = {r["id"]: r for r in mvt_hits(df, "loc", z, x, y).collect()}
    assert set(out) == {1}
    exp_px = min(math.floor(_fx(90.0, z, x) * 4096), 4095)
    exp_py = min(math.floor(_merc_fy(40.0, z, y) * 4096), 4095)
    assert out[1]["px"] == exp_px and out[1]["py"] == exp_py
    # custom extent + field selection
    small = mvt_hits(df, "loc", z, x, y, extent=256, fields=["id"])
    assert small.columns == ["id", "px", "py"]
    assert small.collect()[0]["px"] == min(math.floor(_fx(90.0, z, x) * 256), 255)
    with pytest.raises(MvtError):
        mvt_hits(df, "loc", z, x, y, extent=0)


def test_grid_cells_match_global_geotile_keys(spark):
    """The consistency contract: a tile's sub-cells at z+gp ARE the
    global geotile cells at that zoom (same x/y indices)."""
    z, x, y, gp = 2, 2, 1, 3
    rows = [(i, 5.0 + i * 7.3, 3.0 + i * 10.7) for i in range(6)]  # inside 2/2/1
    df = _pts(spark, rows)
    got = {r["cell"]: r["doc_count"] for r in mvt_grid(df, "loc", z, x, y, gp).collect()}
    z2 = z + gp
    exp: dict[str, int] = {}
    for _i, lat, lon in rows:
        gx = min(math.floor((lon + 180.0) / 360.0 * (1 << z2)), (1 << z2) - 1)
        fy = _merc_fy(lat, z2, 0)
        gy = max(0, min(math.floor(fy), (1 << z2) - 1))
        key = f"{z2}/{gx}/{gy}"
        exp[key] = exp.get(key, 0) + 1
    assert got == exp
    with pytest.raises(MvtError):
        mvt_grid(df, "loc", z, x, y, grid_precision=9)
    with pytest.raises(MvtError):
        mvt_grid(df, "loc", 25, 0, 0, grid_precision=8)


def test_edge_docs_land_in_world_edge_tiles_like_the_agg(spark):
    """Review r8-3: lon=180 / out-of-domain lat docs belong to the
    world-edge tile (clamped index membership), matching the
    geotile_grid agg's edge cells instead of vanishing — and a doc on an
    interior tile boundary is never double-counted."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = _pts(spark, [(1, -86.0, 10.0), (2, 40.0, 180.0), (3, 40.0, 0.0)])
    # doc 1 (lon=10 -> x=1): south world edge at z=1 -> tile 1/1/1;
    # doc 2: east world edge -> tile 1/1/0
    south = {r["id"] for r in mvt_hits(df, "loc", 1, 1, 1).collect()}
    east = {r["id"] for r in mvt_hits(df, "loc", 1, 1, 0).collect()}
    assert 1 in south and 2 in east
    # doc 3 (lon=0 boundary) is in exactly ONE of the two adjacent tiles
    west_n = {r["id"] for r in mvt_hits(df, "loc", 1, 0, 0).collect()}
    assert (3 in west_n) != (3 in east)
    # grid cells equal the standalone agg's buckets for the same docs
    agg = {
        r["cells"]
        for r in compile_aggs(
            df, {"cells": {"geotile_grid": {"field": "loc", "precision": 4}}}
        ).collect()
    }
    tiles = set()
    for tx, ty in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        tiles |= {r["cell"] for r in mvt_grid(df, "loc", 1, tx, ty, 3).collect()}
    assert tiles == agg


def test_grid_with_labels_projects_centroid_pixels(spark):
    """with_labels (ES 8.15 endpoint option): each cell carries its
    centroid projected with the hits layer's exact pixel math."""
    z, x, y = 1, 1, 0
    rows = [(1, 40.0, 90.0), (2, 40.5, 92.0), (3, 10.0, 30.0)]
    df = _pts(spark, rows)
    out = {
        r["cell"]: r
        for r in mvt_grid(df, "loc", z, x, y, grid_precision=3, with_labels=True).collect()
    }
    for r in out.values():
        exp_x = max(0, min(math.floor(_fx(r["centroid_lon"], z, x) * 4096), 4095))
        exp_y = max(0, min(math.floor(_merc_fy(r["centroid_lat"], z, y) * 4096), 4095))
        assert (r["label_x"], r["label_y"]) == (exp_x, exp_y), r
    # docs 1+2 share a zoom-4 cell: label is the 2-point centroid
    two = [r for r in out.values() if r["doc_count"] == 2]
    assert len(two) == 1
    assert two[0]["centroid_lat"] == pytest.approx(40.25)


def test_grid_sub_aggs_and_sort_by(spark):
    """Metric sub-aggs compile through aggs_dsl._metric; sort_by orders
    cells by the aggregate desc (cell tie-break) and size cuts top-k."""
    z, x, y = 1, 1, 0
    df = spark.createDataFrame(
        [(1, 40.0, 90.0, 5.0), (2, 40.5, 92.0, 7.0), (3, 10.0, 30.0, 100.0)],
        "id int, lat double, lon double, v double",
    ).select("id", "v", F.struct("lat", "lon").alias("loc"))
    out = mvt_grid(
        df, "loc", z, x, y, grid_precision=3,
        aggs={"v_sum": {"sum": {"field": "v"}}, "v_max": {"max": {"field": "v"}}},
        sort_by="v_sum", size=1,
    ).collect()
    assert len(out) == 1
    assert out[0]["v_sum"] == pytest.approx(100.0)  # the single-doc heavy cell
    assert out[0]["v_max"] == pytest.approx(100.0)
    # _count sorts by doc_count: the 2-doc cell wins
    top = mvt_grid(
        df, "loc", z, x, y, grid_precision=3, sort_by="_count", size=1
    ).collect()
    assert top[0]["doc_count"] == 2
    with pytest.raises(MvtError):
        mvt_grid(df, "loc", z, x, y, sort_by="nope")
    with pytest.raises(MvtError):
        mvt_grid(df, "loc", z, x, y, size=3)  # size without sort_by
    with pytest.raises(MvtError):
        mvt_grid(df, "loc", z, x, y, aggs={"doc_count": {"sum": {"field": "v"}}})
