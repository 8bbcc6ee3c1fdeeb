"""Geometry operators: TM projection vs driver-side oracle, envelope /
bounds / WKT, GeoJSON dimension loads incl. the documented cell-id
off-by-one convention (SURVEY.md §7.4.1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from milan_telecom_etl__spark.operators.geo import (
    bounds_string,
    polygon_envelope,
    polygon_wkt,
    tm_forward_py,
    tm_forward_xy,
)
from milan_telecom_etl__spark.plans.dimensions import load_grid_dim, load_provinces_dim


def _square(lon0, lat0, d=0.01):
    return [[[lon0, lat0], [lon0 + d, lat0], [lon0 + d, lat0 + d], [lon0, lat0 + d], [lon0, lat0]]]


@pytest.fixture(scope="module")
def grid_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("geo") / "grid.geojson"
    feats = [
        {
            "type": "Feature",
            "properties": {"cellId": i + 1},
            "geometry": {"type": "Polygon", "coordinates": _square(9.0 + 0.01 * i, 45.35)},
        }
        for i in range(4)
    ]
    path.write_text(json.dumps({"type": "FeatureCollection", "features": feats}))
    return str(path)


@pytest.fixture(scope="module")
def provinces_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("geo") / "prov.geojson"
    feats = [
        {
            "type": "Feature",
            "properties": {"PROVINCIA": name},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [_square(500000 + 1000 * i, 5034000, 500)],
            },
        }
        for i, name in enumerate(["Milano", "Pavia", "Trento"])
    ]
    path.write_text(json.dumps({"type": "FeatureCollection", "features": feats}))
    return str(path)


def test_tm_forward_matches_python_oracle(spark):
    pts = [(9.0, 45.35), (9.19, 45.4642), (8.5, 45.0), (10.2, 46.5)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    x, y = tm_forward_xy(F.col("lon"), F.col("lat"))
    rows = df.select("lon", "lat", x.alias("x"), y.alias("y")).collect()
    for r in rows:
        ex, ey = tm_forward_py(r["lon"], r["lat"])
        assert abs(r["x"] - ex) < 1e-6 and abs(r["y"] - ey) < 1e-6


def test_tm_forward_plausible_utm():
    # Milan Duomo ≈ (9.19, 45.4642): UTM 32N easting ~514-515 km,
    # northing ~5.034-5.035 Mm; central meridian maps to 500 km.
    x, y = tm_forward_py(9.19, 45.4642)
    assert 514000 < x < 516000
    assert 5_033_000 < y < 5_036_000
    x0, _ = tm_forward_py(9.0, 45.0)
    assert abs(x0 - 500000) < 1e-6


def test_envelope_bounds_wkt(spark):
    coords = _square(1.0, 2.0, 0.5)
    df = spark.createDataFrame([(coords,)], "coordinates: array<array<array<double>>>")
    env = polygon_envelope(F.col("coordinates"))
    row = df.select(
        env.alias("env"),
        bounds_string(env).alias("bounds"),
        polygon_wkt(F.col("coordinates")).alias("wkt"),
    ).first()
    assert row["env"]["minx"] == 1.0 and row["env"]["maxy"] == 2.5
    assert row["bounds"] == "1.0,2.0,1.5,2.5"
    assert row["wkt"].startswith("POLYGON ((1.0 2.0, 1.5 2.0,")


def test_load_grid_dim_bug_compatible_ids(spark, grid_file):
    dim = load_grid_dim(spark, grid_file).orderBy("cell_id")
    rows = dim.collect()
    # reference keys 0-based by feature order (src/etl.py:37), while the
    # source cellId is 1-based — the documented off-by-one
    assert [r["cell_id"] for r in rows] == [0, 1, 2, 3]
    fixed = load_grid_dim(spark, grid_file, bug_compatible_ids=False).orderBy("cell_id")
    assert [r["cell_id"] for r in fixed.collect()] == [1, 2, 3, 4]
    # projected envelope is in UTM metres around easting 500km
    assert 490000 < rows[0]["minx"] < 510000
    assert rows[0]["bounds"].count(",") == 3
    assert rows[0]["geometry"].startswith("POLYGON (")


def test_load_provinces_dim(spark, provinces_file):
    dim = load_provinces_dim(spark, provinces_file).orderBy("provincia")
    rows = dim.collect()
    assert [r["provincia"] for r in rows] == ["Milano", "Pavia", "Trento"]
    assert all(r["population"] == 0 for r in rows)  # absent → 0 (C5)
    assert rows[0]["geometry"].startswith("MULTIPOLYGON (")
