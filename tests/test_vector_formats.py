"""Shapefile / GeoPackage / NaturalEarth readers vs the reference's own test
fixtures and expectations (ShapefileReaderTest.java:50-90,
GeoPackageReaderTest.java:33-65, NaturalEarthReaderTest.java structure)."""

import os
import sqlite3
import zipfile

import numpy as np
import pytest

from planetiler_spark.kernels import geom as gk
from planetiler_spark.sources import vector_formats as vf

RES = "/root/reference/planetiler-core/src/test/resources"

pytestmark = pytest.mark.skipif(not os.path.isdir(RES),
                                reason="reference fixtures unavailable")


@pytest.fixture(scope="module")
def shp_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shp")
    with zipfile.ZipFile(f"{RES}/shapefile.zip") as z:
        z.extractall(d)
    return str(d / "shapefile" / "stations.shp")


def test_shapefile(spark, shp_dir):
    feats = vf.read_shapefile(spark, shp_dir).collect()
    # ShapefileReaderTest.java:144-163: 86 features, 'Van Dörn Street',
    # full-set centroid (-77.0297995, 38.9119684)
    assert len(feats) == 86
    names = {r.tags.get("name") for r in feats}
    assert "Van Dörn Street" in names
    cx = float(np.mean([r.minx for r in feats]))
    cy = float(np.mean([r.miny for r in feats]))
    assert abs(cx - -77.0297995) < 1e-5
    assert abs(cy - 38.9119684) < 1e-5
    # WKB parses back to points
    typ, data = gk.parse_wkb(bytes(feats[0].geom_wkb))
    assert typ == "point"


def test_shapefile_bounds_filter(spark, shp_dir):
    """ShapefileReaderTest.java:68-90: 18 stations inside the test envelope
    (point (-77.12911, 38.79931) expanded by 0.1), filtered subset centroid
    (-77.0934256, 38.8509022). Bounds filtering is a plain Spark predicate
    over the bbox columns — the engine's pushdown shape."""
    ex, ey, r = -77.12911152370515, 38.79930767201779, 0.1
    feats = (vf.read_shapefile(spark, shp_dir)
             .filter(f"minx >= {ex - r} AND minx <= {ex + r} AND "
                     f"miny >= {ey - r} AND miny <= {ey + r}").collect())
    assert len(feats) == 18
    cx = float(np.mean([r.minx for r in feats]))
    cy = float(np.mean([r.miny for r in feats]))
    assert abs(cx - -77.0934256) < 1e-5
    assert abs(cy - 38.8509022) < 1e-5


def test_geopackage(spark):
    feats = vf.read_geopackage(spark, f"{RES}/geopackage.gpkg").collect()
    # GeoPackageReaderTest.java:47-65: 86 stations, Van Dörn Street, centroid
    assert len(feats) == 86
    assert {r.layer for r in feats} == {"stations"}
    names = {r.tags.get("name") for r in feats}
    assert "Van Dörn Street" in names
    cx = float(np.mean([r.minx for r in feats]))
    cy = float(np.mean([r.miny for r in feats]))
    assert abs(cx - -77.0297995) < 1e-4
    assert abs(cy - 38.9119684) < 1e-4


def test_natural_earth_style_sqlite(spark, tmp_path_factory):
    """NaturalEarth layout: plain sqlite tables with a raw-WKB `geometry`
    column (no gpkg metadata) — synthesized per NaturalEarthReader.java:58."""
    d = tmp_path_factory.mktemp("ne")
    path = str(d / "ne.sqlite")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE ne_110m_lakes "
                "(name TEXT, scalerank INTEGER, geometry BLOB)")
    for i in range(19):
        wkb = gk.wkb_point(float(i), float(-i))
        con.execute("INSERT INTO ne_110m_lakes VALUES (?, ?, ?)",
                    (f"lake{i}", i % 5, wkb))
    con.commit()
    con.close()
    feats = vf.read_natural_earth(spark, path).collect()
    assert len(feats) == 19
    assert {r.layer for r in feats} == {"ne_110m_lakes"}
    assert feats[0].tags["name"].startswith("lake")
    got = {(r.minx, r.miny) for r in feats}
    assert (3.0, -3.0) in got


def test_empty_geom_gpkg(spark):
    """The reference's empty-geom fixture must not crash the reader."""
    feats = vf.read_geopackage(spark, f"{RES}/empty-geom.gpkg").collect()
    assert isinstance(feats, list)  # rows with parseable geometry only


def test_end_to_end_shapefile_to_tiles(spark, shp_dir):
    """A reference user's migration path: read a real shapefile, apply a
    YAML profile, slice matched points into z10 tiles — the readers feed
    the same engine surface as every other source."""
    from pyspark.sql import functions as F
    from planetiler_spark.plans import profile as pr
    from planetiler_spark.kernels import tile_math as tm
    import pandas as pd

    feats = vf.read_shapefile(spark, shp_dir)
    rules = pr.parse_profile("""
layers:
- id: stations
  features:
  - include_when: {name: __any__}
    attributes:
    - key: label
      tag_value: name
""")
    matched = pr.apply_profile(feats, rules)
    assert matched.count() == 86

    def to_tiles(batches):
        from planetiler_spark.kernels import tile_math as tmm
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lon = pdf["minx"].to_numpy()
            lat = pdf["miny"].to_numpy()
            wx = tmm.get_world_x(lon)
            wy = tmm.get_world_y(lat)
            tx, ty = tmm.tile_of_world(wx, wy, 10)
            yield pd.DataFrame({"tile_id": tmm.tile_encode(tx, ty, 10)})

    tiles = (matched.mapInPandas(to_tiles, "tile_id long")
             .groupBy("tile_id").count())
    rows = tiles.collect()
    assert sum(r["count"] for r in rows) == 86
    assert 1 <= len(rows) <= 86  # DC-area stations cluster into few z10 tiles
