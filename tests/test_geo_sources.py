"""GeoJSON / GeoParquet source tests incl. pushdown verification."""

import json

import numpy as np
import pytest

from pyspark.sql import functions as F

from planetiler_spark.kernels import geom as gk
from planetiler_spark.kernels import tile_math as tm
from planetiler_spark.sources import geo as gs


@pytest.fixture(scope="module")
def geojson_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("gj") / "feats.jsonl"
    feats = [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [2.35, 48.85]},
         "properties": {"name": "paris", "rank": 1}},
        {"type": "Feature", "geometry": {"type": "LineString",
                                         "coordinates": [[0, 0], [10, 10], [20, 0]]},
         "properties": {"kind": "road"}},
        {"type": "Feature", "geometry": {"type": "Polygon",
                                         "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]},
         "properties": {"kind": "park"}},
        {"type": "Feature", "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[[[30, 30], [40, 30], [40, 40], [30, 30]]],
                            [[[50, 50], [60, 50], [60, 60], [50, 50]]]]},
         "properties": {}},
    ]
    with open(p, "w") as f:
        for ft in feats:
            f.write(json.dumps(ft) + "\n")
    return str(p)


def test_geojson_read(spark, geojson_path):
    df = gs.read_geojson(spark, geojson_path)
    rows = df.collect()
    assert len(rows) == 4
    pt = [r for r in rows if r.tags.get("name") == "paris"][0]
    typ, (x, y) = gk.parse_wkb(bytes(pt.geom_wkb))
    assert typ == "point"
    assert x == pytest.approx(float(tm.get_world_x(2.35)))
    assert y == pytest.approx(float(tm.get_world_y(48.85)))
    assert pt.tags["rank"] == "1"  # stringified like reference tag maps
    poly = [r for r in rows if r.tags.get("kind") == "park"][0]
    typ, rings = gk.parse_wkb(bytes(poly.geom_wkb))
    assert typ == "polygon" and len(rings[0]) == 5


def test_geoparquet_roundtrip_and_pushdown(spark, geojson_path, tmp_path_factory):
    feats = gs.read_geojson(spark, geojson_path)
    path = str(tmp_path_factory.mktemp("gp") / "feats")
    gs.write_geoparquet(feats, path)
    # bounds covering only the Paris point
    x0 = float(tm.get_world_x(2.0)); x1 = float(tm.get_world_x(3.0))
    y0 = float(tm.get_world_y(49.5)); y1 = float(tm.get_world_y(48.0))
    out = gs.read_geoparquet(spark, path, bounds=(x0, min(y0, y1), x1, max(y0, y1)))
    rows = out.collect()
    assert len(rows) == 1 and rows[0].tags["name"] == "paris"
    # the bbox predicate reaches the parquet scan (PushedFilters)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "maxx" in plan


def test_geoparquet_column_pruning(spark, geojson_path, tmp_path_factory):
    feats = gs.read_geojson(spark, geojson_path)
    path = str(tmp_path_factory.mktemp("gp2") / "feats")
    gs.write_geoparquet(feats, path)
    pruned = gs.read_geoparquet(spark, path).select("id", "minx")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "geom_wkb" not in plan.split("ReadSchema")[1][:200]  # wkb not read
